"""CPPM scaffolding tests with synthetic key material.

The C2 cipher structure, D-CBC mode, MKB processing and pack
descramble pipeline (reference src/decoders/cppm.c) are validated by
round trips built from random S-boxes and device keys — the machinery
is S-box-independent, and the licensed real tables simply drop in via
ATPU_CPPM_SBOX / ATPU_CPPM_DEVICE_KEYS."""

import struct

import numpy as np
import pytest

from audiotools_tpu import cppm


def synthetic_cipher(seed=5):
    rng = np.random.default_rng(seed)
    sbox = [int(v) for v in rng.integers(0, 256, 256)]
    sbox_f = [int(v) for v in rng.integers(0, 1 << 32, 256,
                                           dtype=np.uint64)]
    return cppm.C2Cipher(sbox, sbox_f)


def test_c2_enc_dec_roundtrip():
    cipher = synthetic_cipher()
    rng = np.random.default_rng(7)
    for _ in range(50):
        code = int(rng.integers(0, 1 << 63))
        key = int(rng.integers(0, 1 << 56))
        assert cipher.dec(cipher.enc(code, key), key) == code
        assert cipher.enc(cipher.dec(code, key), key) == code


def test_c2_g_is_not_invertible_identity():
    cipher = synthetic_cipher()
    assert cipher.g(12345, 999) == cipher.enc(12345, 999) ^ 12345


def test_dcbc_roundtrip():
    cipher = synthetic_cipher()
    rng = np.random.default_rng(11)
    key = int(rng.integers(0, 1 << 56))
    for length in (8, 16, 64, 1920):
        data = bytes(rng.integers(0, 256, length, dtype=np.uint8))
        sealed = cipher.dcbc_enc(data, key)
        assert sealed != data
        assert cipher.dcbc_dec(sealed, key) == data


def test_mkb_processing(tmp_path):
    """a synthetic MKB with a verification record and a per-column
    key table yields the planted media key"""
    cipher = synthetic_cipher()
    rng = np.random.default_rng(13)
    media_key = int(rng.integers(0, 1 << 56))
    dev = cppm.DeviceKey(col=3, row=2,
                         key=int(rng.integers(0, 1 << 56)))

    # verification record: decrypting with the right media key gives
    # the 0xDEADBEEF sentinel in the high word
    verification = cipher.enc((0xDEADBEEF << 32) | 0x12345678,
                              media_key)
    # key table record for column 3: the entry at our device's row
    # decrypts (with the device key) to media_key ^ f(col, row)
    planted = media_key ^ ((dev.col << 32) | dev.row)
    entry = cipher.enc(planted, dev.key)
    rows = [int(rng.integers(0, 1 << 63)) for _ in range(4)]
    rows[dev.row] = entry

    def record(rtype, payload):
        header = bytes([rtype]) + \
            (len(payload) + 4).to_bytes(3, "big")
        return header + payload

    verify_rec = record(0x81, verification.to_bytes(8, "big"))
    table_payload = ((dev.col << 24) | 1).to_bytes(8, "big")
    table_payload += b"".join(r.to_bytes(8, "big") for r in rows)
    table_rec = record(0x01, table_payload)
    end_rec = record(0x02, b"\x00" * 8)
    mkb = verify_rec + table_rec + end_rec

    got = cppm.process_mkb(mkb, [dev], cipher)
    assert got == media_key

    # the full file form
    path = str(tmp_path / "DVDAUDIO.MKB")
    with open(path, "wb") as f:
        f.write(b"DVDAUDIO.MKB")
        f.write(struct.pack(">I", len(mkb)))
        f.write(mkb)
    assert cppm.process_mkb(cppm.read_mkb(path), [dev],
                            cipher) == media_key

    # a device with no matching column cannot unlock it
    assert cppm.process_mkb(
        mkb, [cppm.DeviceKey(9, 0, 42)], cipher) is None


def make_pack(cipher, media_key, id_album, rng):
    """builds one encrypted 2048-byte PS pack the way a disc does"""
    pack = bytearray(rng.integers(0, 256, cppm.BLOCK_SIZE,
                                  dtype=np.uint8))
    pack[0:4] = b"\x00\x00\x01\xba"
    pack[20] = (pack[20] & 0xCF) | 0x10      # scrambled flag
    payload = bytes(pack[cppm.BLOCK_SIZE - cppm.ENCRYPTED_SIZE:])

    # derive the content key exactly as the decoder will
    k_au = cipher.g(id_album, media_key) & cppm.MASK56
    k_i = k_au
    for offset in (24, 32, 40, 48):
        d_kc = int.from_bytes(pack[offset:offset + 8], "big")
        k_i = cipher.g(d_kc, k_i) & cppm.MASK56
    d_kc = int.from_bytes(pack[84:92], "big")
    k_c = cipher.g(d_kc, k_i) & cppm.MASK56

    sealed = cipher.dcbc_enc(payload, k_c)
    pack[cppm.BLOCK_SIZE - cppm.ENCRYPTED_SIZE:] = sealed
    return (bytes(pack), payload)


def test_decrypt_block_roundtrip():
    cipher = synthetic_cipher()
    rng = np.random.default_rng(17)
    media_key = int(rng.integers(0, 1 << 56))
    id_album = int(rng.integers(0, 1 << 63))
    decoder = cppm.CPPMDecoder(media_key, id_album, cipher)

    (pack, payload) = make_pack(cipher, media_key, id_album, rng)
    (clear, encrypted) = decoder.decrypt_block(pack,
                                               preserve_cci=True)
    assert encrypted
    assert clear[cppm.BLOCK_SIZE - cppm.ENCRYPTED_SIZE:] == payload
    assert cppm.pes_scrambling_control(clear) == 0

    # an unscrambled pack passes through untouched
    plain = bytearray(pack)
    plain[20] &= 0xCF
    (out, encrypted) = decoder.decrypt_block(bytes(plain),
                                             preserve_cci=True)
    assert not encrypted
    assert out == bytes(plain)


def test_decrypt_multi_block():
    cipher = synthetic_cipher()
    rng = np.random.default_rng(19)
    media_key = int(rng.integers(0, 1 << 56))
    id_album = int(rng.integers(0, 1 << 63))
    decoder = cppm.CPPMDecoder(media_key, id_album, cipher)
    packs = []
    payloads = []
    for _ in range(3):
        (pack, payload) = make_pack(cipher, media_key, id_album, rng)
        packs.append(pack)
        payloads.append(payload)
    (clear, count) = decoder.decrypt(b"".join(packs),
                                     preserve_cci=True)
    assert count == 3
    for (i, payload) in enumerate(payloads):
        start = (i * cppm.BLOCK_SIZE + cppm.BLOCK_SIZE -
                 cppm.ENCRYPTED_SIZE)
        assert clear[start:start + cppm.ENCRYPTED_SIZE] == payload


def test_key_material_gates(tmp_path, monkeypatch):
    monkeypatch.delenv("ATPU_CPPM_SBOX", raising=False)
    monkeypatch.delenv("ATPU_CPPM_DEVICE_KEYS", raising=False)
    with pytest.raises(cppm.CPPMKeyMaterialError):
        cppm.load_sbox()
    with pytest.raises(cppm.CPPMKeyMaterialError):
        cppm.load_device_keys()
    with pytest.raises(NotImplementedError):
        cppm.authenticate_drive("/dev/dvd")

    # the file-based loaders round-trip
    rng = np.random.default_rng(23)
    sbox_path = str(tmp_path / "sbox.bin")
    with open(sbox_path, "wb") as f:
        f.write(bytes(rng.integers(0, 256, 256, dtype=np.uint8)))
        f.write(bytes(rng.integers(0, 256, 1024, dtype=np.uint8)))
    (sbox, sbox_f) = cppm.load_sbox(sbox_path)
    assert len(sbox) == 256 and len(sbox_f) == 256

    keys_path = str(tmp_path / "keys.txt")
    with open(keys_path, "w") as f:
        f.write("# col row key\n3 2 0123456789ABCD\n")
    keys = cppm.load_device_keys(keys_path)
    assert (keys[0].col, keys[0].row) == (3, 2)
    assert keys[0].key == 0x0123456789ABCD
