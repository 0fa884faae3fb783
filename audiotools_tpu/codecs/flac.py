"""Production FLAC codec entry points.

``encode_flac`` / ``decoder_for_file`` are the paths used by
``formats.flac.FlacAudio``.  The device-accelerated implementations
(batched JAX analysis + C++ bitpack) register themselves here; when
unavailable they fall back to the NumPy oracle implementations in
``audiotools_tpu.ref``, which are bit-identical by construction.
"""

from __future__ import annotations

import os


def _use_oracle():
    """returns True if the device path is disabled via environment"""
    return os.environ.get("ATPU_FLAC_ORACLE", "0") == "1"


def encode_flac(filename, pcmreader, padding_size=4096, **options):
    """encodes a FLAC file, returning (byte_offset, pcm_frames) pairs"""
    if not _use_oracle():
        try:
            from .flac_enc_fast import encode_flac_fast
            return encode_flac_fast(filename, pcmreader,
                                    padding_size=padding_size, **options)
        except ImportError:
            pass
    from ..ref.flac_enc import encode_flac as oracle_encode
    return oracle_encode(filename, pcmreader,
                         padding_bytes=padding_size, **options)


def decoder_for_file(file, channel_mask=None):
    """returns a PCMReader decoding the given FLAC file object

    ATPU_FLAC_DEC_BACKEND selects the decode path:
      native (default) — host C++ frame decoder (flac_dec_fast)
      jax              — device path: host structural scan + batched
                         Rice decode and fused synthesis scans on the
                         accelerator (flac_dec_jax); byte-identical
    """
    if not _use_oracle():
        backend = os.environ.get("ATPU_FLAC_DEC_BACKEND", "native")
        if backend == "jax":
            try:
                from .flac_dec_jax import JaxFlacDecoder
                return JaxFlacDecoder(file, channel_mask)
            except ImportError:
                pass
        try:
            from .flac_dec_fast import FastFlacDecoder
            return FastFlacDecoder(file, channel_mask)
        except ImportError:
            pass
    from ..ref.flac_dec import FlacDecoder
    return FlacDecoder(file, channel_mask)
