"""Compression-ratio parity vs the reference's shipped FLAC fixtures.

Decodes every /root/reference/test/*.flac (files the reference's own
encoder produced), re-encodes the PCM at -8 with this framework's
encoder, and tables audio-stream bytes (metadata excluded on both
sides) — the apples-to-apples size comparison BASELINE.md's protocol
asks for.  The reference itself cannot run here (Python 2); its
fixture files stand in as its encoder's output.

Run: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools_dev/ratio_parity.py
"""

import io
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

from audiotools_tpu import pcm  # noqa: E402
from audiotools_tpu.formats.flac import FlacAudio  # noqa: E402
from audiotools_tpu.pcmstream import PCMReader  # noqa: E402
from audiotools_tpu.codecs.flac_enc_fast import encode_flac_fast  # noqa: E402

REF_TEST = "/root/reference/test"

# offsets where the frame data starts (past fLaC + metadata blocks)
def audio_stream_bytes(path):
    with open(path, "rb") as f:
        data = f.read()
    pos = data.index(b"fLaC") + 4
    while True:
        hdr = data[pos:pos + 4]
        last = hdr[0] & 0x80
        length = int.from_bytes(hdr[1:4], "big")
        pos += 4 + length
        if last:
            break
    return len(data) - pos


def main():
    rows = []
    total_ref = total_ours = 0
    for name in sorted(os.listdir(REF_TEST)):
        if not name.endswith(".flac"):
            continue
        if name == "1h.flac":
            continue       # 1 hour: dominated by silence, minutes to run
        path = os.path.join(REF_TEST, name)
        try:
            f = FlacAudio(path)
            reader = f.to_pcm()
            out = []
            fl = reader.read(1 << 18)
            while fl.frames:
                out.append(fl.samples)
                fl = reader.read(1 << 18)
            reader.close()
            arr = np.concatenate(out)
        except Exception as err:  # noqa: B902
            print("%-28s SKIP (%s)" % (name, str(err)[:60]))
            continue
        mask = f.channel_mask()
        fl2 = pcm.FrameList._wrap(np.ascontiguousarray(arr),
                                  f.bits_per_sample())
        rd = PCMReader(
            io.BytesIO(fl2.to_bytes(False, f.bits_per_sample() > 8)),
            f.sample_rate(), f.channels(), int(mask),
            f.bits_per_sample())
        buf = io.BytesIO()
        encode_flac_fast(buf, rd, backend="numpy", padding_size=None,
                         block_size=4096, max_lpc_order=12,
                         mid_side=f.channels() == 2,
                         exhaustive_model_search=True,
                         max_residual_partition_order=6)
        tmp = "/tmp/_ratio_parity.flac"
        with open(tmp, "wb") as fh:
            fh.write(buf.getvalue())
        ours = audio_stream_bytes(tmp)
        ref = audio_stream_bytes(path)
        total_ref += ref
        total_ours += ours
        rows.append((name, ref, ours))
        print("%-28s ref %10d  ours %10d  delta %+6.2f%%"
              % (name, ref, ours, 100.0 * (ours - ref) / ref))
    print("-" * 68)
    print("%-28s ref %10d  ours %10d  delta %+6.2f%%"
          % ("TOTAL (corpus)", total_ref, total_ours,
             100.0 * (total_ours - total_ref) / total_ref))


if __name__ == "__main__":
    main()
