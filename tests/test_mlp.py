"""MLP codec tests: oracle round-trips over the full feature matrix
and native/oracle cross-verification (the reference ships no MLP
encoder, so fixtures are synthesized by ref.mlp.MLPEncoder)."""

import numpy as np
import pytest

from audiotools_tpu.ref.mlp import (MLPDecoder, MLPEncoder,
                                    split_frames, CRC8_TABLE)


def roundtrip(enc_kwargs, n=160, ch=2, amp=6000, frames=3, seed=7):
    rng = np.random.RandomState(seed)
    enc = MLPEncoder(channels=ch, **enc_kwargs)
    data = rng.randint(-amp, amp, size=(n * frames, ch)).astype(
        np.int64)
    q = enc_kwargs.get("quant_step_size")
    if q:
        data = (data >> max(q)) << max(q)
    osh = enc_kwargs.get("output_shift")
    if osh:
        data = (data >> max(osh)) << max(osh)
    stream = b"".join(enc.encode_frame(data[i * n:(i + 1) * n])
                      for i in range(frames))
    (frames_list, leftover) = split_frames(stream)
    assert not leftover

    dec = MLPDecoder()
    oracle = np.concatenate([dec.decode_frame(f)
                             for f in frames_list])
    assert np.array_equal(oracle, data)

    from audiotools_tpu._native import MLPDecoderHandle
    h = MLPDecoderHandle()
    (native, consumed) = h.decode(stream)
    assert consumed == len(stream)
    assert h.sample_rate == enc.sample_rate
    assert h.channels == ch
    assert np.array_equal(native, data)
    h.close()
    return stream


@pytest.mark.parametrize("codebook", [0, 1, 2, 3])
def test_codebooks(codebook):
    roundtrip(dict(block_size=40, codebook=codebook,
                   huffman_lsbs=16))


def test_fir_filter():
    roundtrip(dict(block_size=40, codebook=1, huffman_lsbs=16,
                   fir_coeff=[256, -128], filter_shift=8))


def test_iir_filter():
    roundtrip(dict(block_size=40, codebook=2, huffman_lsbs=16,
                   iir_coeff=[64], filter_shift=8))


def test_matrices_with_noise():
    m = [dict(out_channel=0, coeff=[1 << 14, 1 << 12, 5 << 6, 0],
              lsb_bypass=1),
         dict(out_channel=1, coeff=[-(1 << 12), 1 << 14, 0, 9 << 6],
              lsb_bypass=1)]
    roundtrip(dict(block_size=40, codebook=3, huffman_lsbs=18,
                   matrices=m, fir_coeff=[300, -100, 25],
                   iir_coeff=[40], filter_shift=9, noise_shift=2),
              amp=12000)


def test_quant_output_shift_mono_24bit():
    roundtrip(dict(block_size=40, codebook=1, huffman_lsbs=16,
                   quant_step_size=[2, 2]))
    roundtrip(dict(block_size=40, codebook=1, huffman_lsbs=14,
                   output_shift=[2, 2]))
    roundtrip(dict(block_size=40, codebook=2, huffman_lsbs=16), ch=1)
    roundtrip(dict(bits_per_sample=24, codebook=1, huffman_lsbs=22,
                   block_size=40), amp=4_000_000)
    roundtrip(dict(sample_rate=96000, codebook=2, huffman_lsbs=16,
                   block_size=40))


def test_no_checkdata():
    roundtrip(dict(block_size=40, codebook=0, huffman_lsbs=16,
                   checkdata=False))


def test_corrupt_checkdata_rejected():
    stream = bytearray(roundtrip(dict(block_size=40, codebook=0,
                                      huffman_lsbs=16)))
    # flip a bit inside the first substream's data
    stream[40] ^= 0x10
    (frames_list, _) = split_frames(bytes(stream))
    dec = MLPDecoder()
    with pytest.raises(ValueError):
        for f in frames_list:
            dec.decode_frame(f)
    from audiotools_tpu._native import MLPDecoderHandle
    h = MLPDecoderHandle()
    with pytest.raises(ValueError):
        h.decode(bytes(stream))
    h.close()


def test_frame_before_sync_rejected():
    stream = roundtrip(dict(block_size=40, codebook=0,
                            huffman_lsbs=16))
    (frames_list, _) = split_frames(stream)
    dec = MLPDecoder()
    with pytest.raises(ValueError):
        dec.decode_frame(frames_list[1])    # no major sync seen


def test_partial_buffer_consumption():
    """the native decoder leaves trailing partial frames unconsumed"""
    stream = roundtrip(dict(block_size=40, codebook=1,
                            huffman_lsbs=16))
    from audiotools_tpu._native import MLPDecoderHandle
    h = MLPDecoderHandle()
    (out, consumed) = h.decode(stream[:-3])
    assert consumed < len(stream) - 3
    (out2, consumed2) = h.decode(stream[consumed:])
    assert consumed2 == len(stream) - consumed - 3 or \
        consumed + consumed2 <= len(stream)
    h.close()


def test_crc8_table_structure():
    """the derived CRC-8 table matches its generator polynomial"""
    assert CRC8_TABLE[0] == 0x00
    assert CRC8_TABLE[1] == 0x63
    assert CRC8_TABLE[2] == 0xC6
    assert CRC8_TABLE[3] == (0x63 ^ 0xC6)


@pytest.mark.parametrize("channels", [3, 4, 5, 6])
def test_two_substream_multichannel(channels):
    """>2ch streams use 2 substreams (ch 0-1 + ch 2..C-1); the
    decoder rematrixes with the second substream's parameters"""
    from audiotools_tpu.ref.mlp import MLPEncoderMulti
    rng = np.random.RandomState(13)
    n, frames = 160, 3
    enc = MLPEncoderMulti(channels=channels, codebook=1,
                          huffman_lsbs=15, fir_coeff=[200, -90],
                          filter_shift=8)
    data = rng.randint(-6000, 6000,
                       size=(n * frames, channels)).astype(np.int64)
    stream = b"".join(enc.encode_frame(data[i * n:(i + 1) * n])
                      for i in range(frames))
    (frames_list, leftover) = split_frames(stream)
    assert not leftover

    dec = MLPDecoder()
    oracle = np.concatenate([dec.decode_frame(f)
                             for f in frames_list])
    assert np.array_equal(oracle, data)

    from audiotools_tpu._native import MLPDecoderHandle
    h = MLPDecoderHandle()
    (native, consumed) = h.decode(stream)
    assert consumed == len(stream)
    assert h.channels == channels
    assert np.array_equal(native, data)
    h.close()
