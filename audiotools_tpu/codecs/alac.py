"""Production ALAC codec entry points.

``encode_mdat`` / ``decoder_for_file`` are the paths used by
``formats.m4a.ALACAudio``.  The accelerated implementations (batched
LPC analysis + C++ adaptive emit/decode) register themselves here;
``ATPU_ALAC_ORACLE=1`` falls back to the scalar NumPy oracle in
``audiotools_tpu.ref.alac``, which is byte-identical by construction.
"""

from __future__ import annotations

import os


def _use_oracle():
    """returns True if the fast path is disabled via environment"""
    return os.environ.get("ATPU_ALAC_ORACLE", "0") == "1"


def encode_mdat(file, pcmreader, **options):
    """writes an mdat atom; returns (frame_byte_sizes, total_frames)"""
    if not _use_oracle():
        try:
            from .alac_fast import encode_mdat_fast
            return encode_mdat_fast(file, pcmreader, **options)
        except ImportError:
            pass
    from ..ref.alac import encode_mdat as oracle_mdat
    return oracle_mdat(file, pcmreader, **options)


def decoder_for_file(file_or_path):
    """returns a PCMReader decoding the given M4A/ALAC file"""
    if not _use_oracle():
        if os.environ.get("ATPU_ALAC_DEC_BACKEND") == "jax":
            # device decode path: host entropy scan + fused adaptive
            # predictor scan (codecs/alac_dec_jax.py)
            from .alac_dec_jax import JaxALACDecoder
            return JaxALACDecoder(file_or_path)
        try:
            from .alac_fast import FastALACDecoder
            return FastALACDecoder(file_or_path)
        except ImportError:
            pass
    from ..ref.alac import ALACDecoder
    return ALACDecoder(file_or_path)
