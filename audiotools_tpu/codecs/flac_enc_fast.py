"""Batched FLAC encoder: device/vectorized analysis + C++ frame emit.

The production encode path (reference counterpart:
``/root/reference/src/encoders/flac.c:43``): PCM is read in multi-frame
batches, expanded to the ``{L, R, mid, side}`` candidate stack, and all
subframe trials (wasted bits, FIXED order selection, windowed LPC with
exhaustive order sweeps, Rice partition searches) run as batched array
programs in ``ops.flac_frames`` — NumPy on host or jax.numpy under
``jit`` on TPU, byte-identically.  The chosen decision/residual arrays
stream to the C++ emitter (``_native.atpu_flac_emit_frames``), which
serializes frames and CRCs at memory speed.  The final short block goes
through the scalar oracle encoder, which is byte-identical by shared
construction.
"""

from __future__ import annotations

import os

import numpy as np

from ..ops import flac_frames, lpc as lpc_ops
from ..ref import flac_enc as oracle
from .. import _native

_jax_analyze_cache = {}


def _get_backend(backend):
    if backend is None:
        backend = os.environ.get("ATPU_FLAC_BACKEND", "numpy")
    return backend


def _jax_device():
    """resolves the target JAX device (ATPU_JAX_PLATFORM overrides)"""
    import jax
    platform = os.environ.get("ATPU_JAX_PLATFORM")
    if platform:
        return jax.devices(platform)[0]
    return None


def _analyze_jax(blocks, stereo_trial, bps_scalar, n, K, precision,
                 porders, max_rice, exhaustive, window):
    """jitted device analysis; cached per static configuration

    blocks: [B, n, ch] int16 (bps <= 16) or int32; the candidate
    variant stack (L/R/mid/side) is built on device so the host only
    uploads raw PCM"""
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    key = (blocks.shape, blocks.dtype.str, stereo_trial, bps_scalar, n,
           K, precision, tuple(porders), max_rice, exhaustive)
    if key not in _jax_analyze_cache:
        def run(blocks, window):
            (X, bps_vec) = flac_frames.build_variants(
                jnp, blocks.astype(jnp.int32), stereo_trial, bps_scalar)
            out = flac_frames.analyze_subframes(
                jnp, X, bps_vec, n, K, precision, list(porders),
                max_rice, exhaustive, window)
            # residuals/samples are re-derived host-side; keep the
            # device->host transfer to the small decision arrays
            del out["residual"]
            del out["samples"]
            del out["const_val"]
            return out
        _jax_analyze_cache[key] = jax.jit(run)
    device = _jax_device()
    if device is not None:
        blocks = jax.device_put(blocks, device)
        window = jax.device_put(window, device)
    # async dispatch: caller converts to numpy when needed, letting the
    # device overlap with host-side serialization of earlier batches
    return _jax_analyze_cache[key](blocks, window)


# variant index pairs per stereo assignment: (subframe0, subframe1)
# variants are ordered [left, right, average, difference]
_ASSIGNMENT_VARIANTS = {1: (0, 1), 8: (0, 3), 9: (3, 1), 10: (2, 3)}


def encode_flac_fast(file_or_path,
                     pcmreader,
                     block_size=4096,
                     max_lpc_order=8,
                     min_residual_partition_order=0,
                     max_residual_partition_order=5,
                     mid_side=True,
                     adaptive_mid_side=False,
                     exhaustive_model_search=False,
                     disable_verbatim_subframes=False,
                     disable_constant_subframes=False,
                     disable_fixed_subframes=False,
                     disable_lpc_subframes=False,
                     padding_size=4096,
                     batch_frames=None,
                     backend=None):
    """encodes a FLAC file from a PCMReader (batched fast path)

    returns a list of (byte_offset, pcm_frames) pairs per FLAC frame"""
    from ..pcmstream import BufferedPCMReader

    backend = _get_backend(backend)
    if batch_frames is None:
        # big batches amortize device dispatch latency; the host path
        # keeps working sets cache-sized
        batch_frames = 64 if backend == "jax" else 32
    bps = pcmreader.bits_per_sample
    channels = pcmreader.channels
    sample_rate = pcmreader.sample_rate
    max_rice = 14 if bps <= 16 else 30

    options = oracle.EncodingOptions(
        block_size, max_lpc_order,
        adaptive_mid_side, mid_side, exhaustive_model_search,
        min_residual_partition_order, max_residual_partition_order,
        max_rice)
    precision = options.qlp_precision

    stereo_trial = (channels == 2) and (mid_side or adaptive_mid_side)
    V = 4 if stereo_trial else channels
    max_subframes = 2 if stereo_trial else channels
    porders = flac_frames.valid_partition_orders(
        block_size, max_residual_partition_order, max(max_lpc_order, 4))
    window = lpc_ops.tukey_window(block_size)

    if isinstance(file_or_path, str):
        output_file = open(file_or_path, "wb")
        close_file = True
    else:
        output_file = file_or_path
        close_file = False

    # ---- metadata headers (placeholder STREAMINFO) --------------------
    output_file.write(b"fLaC")
    header = oracle.TokenStream()
    header.write(1, 1 if padding_size is None else 0)
    header.write(7, 0)
    header.write(24, 34)
    output_file.write(header.to_bytes())
    streaminfo_offset = output_file.tell()
    output_file.write(b"\x00" * 34)
    if padding_size is not None:
        pad = oracle.TokenStream()
        pad.write(1, 1)
        pad.write(7, 1)
        pad.write(24, padding_size)
        output_file.write(pad.to_bytes())
        output_file.write(b"\x00" * padding_size)

    reader = BufferedPCMReader(pcmreader)
    stream_md5 = _native.MD5()
    total_pcm_frames = 0
    min_frame = (1 << 24) - 1
    max_frame = 0
    frame_number = 0
    current_offset = 0
    frame_offsets = []

    pending = None      # (submitted analysis, blocks, frame_number)

    def flush_pending():
        nonlocal pending, current_offset, min_frame, max_frame
        nonlocal frame_number
        if pending is None:
            return
        (submitted, blocks, first_frame) = pending
        pending = None
        (frame_bytes, lens) = _finish_batch(
            submitted, blocks, bps, channels, sample_rate, block_size,
            stereo_trial, V, max_subframes, precision, mid_side,
            first_frame)
        output_file.write(frame_bytes)
        for length in lens:
            frame_offsets.append((current_offset, block_size))
            current_offset += int(length)
            min_frame = min(min_frame, int(length))
            max_frame = max(max_frame, int(length))
            frame_number += 1

    while True:
        framelist = reader.read(block_size * batch_frames)
        if framelist.frames == 0:
            break
        stream_md5.update_pcm(framelist.samples, bps)
        total_pcm_frames += framelist.frames

        samples = framelist.samples  # int32 [frames, channels]
        n_full = samples.shape[0] // block_size
        full = samples[:n_full * block_size]
        tail = samples[n_full * block_size:]

        if n_full:
            blocks = full.reshape(n_full, block_size, channels)
            submitted = _submit_batch(
                blocks, bps, block_size, stereo_trial, V,
                max_lpc_order, precision, porders, max_rice,
                exhaustive_model_search, window, backend)
            batch_first_frame = frame_number +                 (len(pending[1]) if pending is not None else 0)
            # serialize the previous batch while this one computes
            flush_pending()
            pending = (submitted, blocks, frame_number)

        if tail.shape[0]:
            flush_pending()
            # final short block: scalar oracle path (byte-identical)
            frame_bytes = oracle.encode_frame(
                reader, options, frame_number, tail.astype(np.int64))
            output_file.write(frame_bytes)
            frame_offsets.append((current_offset, tail.shape[0]))
            current_offset += len(frame_bytes)
            min_frame = min(min_frame, len(frame_bytes))
            max_frame = max(max_frame, len(frame_bytes))
            frame_number += 1

    flush_pending()

    if max_frame == 0:
        min_frame = (1 << 24) - 1

    output_file.seek(streaminfo_offset, 0)
    output_file.write(oracle.build_streaminfo(
        block_size, block_size, min_frame, max_frame,
        sample_rate, channels, bps, total_pcm_frames,
        stream_md5.digest()))
    if close_file:
        output_file.close()
    else:
        output_file.seek(0, 2)

    return frame_offsets


def _submit_batch(blocks, bps, block_size, stereo_trial, V,
                  max_lpc_order, precision, porders, max_rice,
                  exhaustive, window, backend):
    """launches analysis of [B, n, ch] blocks; returns a result handle"""
    n = block_size
    K = max_lpc_order
    if backend == "jax":
        upload = blocks.astype(np.int16) if bps <= 16 else blocks
        return _analyze_jax(upload, stereo_trial, bps, n, K,
                            precision, porders, max_rice, exhaustive,
                            window)
    else:
        B = blocks.shape[0]
        (X, bps_vec) = flac_frames.build_variants(np, blocks,
                                                  stereo_trial, bps)
        result = flac_frames.analyze_subframes(
            np, X.reshape(B * V, n), bps_vec, n, K, precision,
            porders, max_rice, exhaustive, window)
        return {k: np.asarray(v) for (k, v) in result.items()}


def _finish_batch(result, blocks, bps, channels, sample_rate,
                  block_size, stereo_trial, V, max_subframes,
                  precision, mid_side, first_frame_number):
    """serializes one analyzed batch, returning (bytes, lens)"""
    B = blocks.shape[0]
    n = block_size

    result = {k: np.asarray(v) for (k, v) in result.items()}
    (X, _bps_vec) = flac_frames.build_variants(np, blocks,
                                               stereo_trial, bps)

    sub_bits = result["sub_bits"].reshape(B, V)

    # ---- channel assignment -------------------------------------------
    if stereo_trial:
        assignments = flac_frames.choose_assignment(
            sub_bits[:, 0], sub_bits[:, 1],
            sub_bits[:, 2], sub_bits[:, 3], mid_side).astype(np.int32)
        var_pairs = np.array([_ASSIGNMENT_VARIANTS[a]
                              for a in assignments.tolist()],
                             dtype=np.int64)               # [B, 2]
    else:
        assignments = np.full(B, channels - 1, dtype=np.int32)
        var_pairs = np.tile(np.arange(V, dtype=np.int64), (B, 1))

    def gather(name, extra_shape):
        arr = result[name].reshape((B, V) + extra_shape)
        idx = var_pairs.reshape(
            (B, max_subframes) + (1,) * len(extra_shape))
        return np.take_along_axis(arr, idx, axis=1)

    choices = gather("choice", ())
    orders = gather("order", ())
    wasteds = gather("wasted", ())
    porder_sel = gather("porder", ())
    shifts = gather("shift", ())
    qlp = gather("qlp", (result["qlp"].shape[-1],))
    rice = gather("rice_params", (result["rice_params"].shape[-1],))

    # shifted samples are recomputed on host (cheap) so the device
    # needn't ship sample tensors back; the C++ emitter re-derives
    # residuals exactly from the decisions (int64), which keeps the
    # stream lossless regardless of the analysis backend's precision
    X_by_variant = X.reshape(B, V, n)
    samples_sel = np.take_along_axis(
        X_by_variant, var_pairs[:, :, None], axis=1)
    samples_sel = samples_sel >> wasteds[:, :, None]

    precisions = np.full((B, max_subframes), precision, dtype=np.int32)
    frame_numbers = np.arange(first_frame_number,
                              first_frame_number + B, dtype=np.int64)
    block_sizes = np.full(B, n, dtype=np.int32)

    (frame_bytes, lens) = _native.flac_emit_frames(
        frame_numbers, block_sizes, assignments,
        choices, orders, wasteds, porder_sel, shifts, precisions,
        qlp, rice, samples_sel, None,
        max_subframes, qlp.shape[-1], rice.shape[-1], n,
        sample_rate, bps, channels)

    return (frame_bytes, lens)
