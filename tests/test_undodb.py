"""UndoDB unit tests (delta.py): sqlite + bz2 binary patches keyed by
sha1 pairs, the safety net behind tracklint --fix/--undo (reference
delta.py:34-263)."""

import os

import pytest

from audiotools_tpu.delta import UndoDB


def test_patch_roundtrip():
    a = b"the quick brown fox jumps over the lazy dog" * 100
    b = a.replace(b"quick", b"slow").replace(b"dog", b"cat")
    patch = UndoDB.build_patch(a, b)
    assert UndoDB.apply_patch(b, patch, len(a)) == a


def test_patch_identical_data():
    a = b"same bytes" * 50
    patch = UndoDB.build_patch(a, a)
    assert UndoDB.apply_patch(a, patch, len(a)) == a


def test_add_and_undo_restores_original(tmp_path):
    db_path = str(tmp_path / "undo.db")
    target = tmp_path / "track.bin"
    original = os.urandom(4096) + b"ORIGINAL"
    target.write_bytes(original)

    modified_path = tmp_path / "modified.bin"
    modified = original[:-8] + b"MODIFIED"
    modified_path.write_bytes(modified)

    db = UndoDB(db_path)
    try:
        db.add(str(target), str(modified_path))
        # simulate the destructive edit
        target.write_bytes(modified)
        assert db.undo(str(target))
        assert target.read_bytes() == original
    finally:
        db.close()


def test_undo_unknown_file_returns_false(tmp_path):
    db = UndoDB(str(tmp_path / "undo.db"))
    try:
        unknown = tmp_path / "never-added.bin"
        unknown.write_bytes(b"contents")
        assert not db.undo(str(unknown))
    finally:
        db.close()


def test_db_persists_across_reopen(tmp_path):
    db_path = str(tmp_path / "undo.db")
    target = tmp_path / "f.bin"
    original = b"A" * 1000
    target.write_bytes(original)
    changed = tmp_path / "g.bin"
    changed.write_bytes(b"B" * 900)

    db = UndoDB(db_path)
    db.add(str(target), str(changed))
    db.close()

    target.write_bytes(b"B" * 900)
    db2 = UndoDB(db_path)
    try:
        assert db2.undo(str(target))
        assert target.read_bytes() == original
    finally:
        db2.close()
