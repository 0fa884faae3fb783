#!/usr/bin/env python
"""Interleaved same-window A/B: round-2 snapshot vs HEAD bench.py.

Settles the round-4 verdict's open question ("weather vs regression"):
alternates full bench.py runs between two checkouts in the same tunnel
window, with an independent weather probe (dispatch RTT + 8 MiB upload
bandwidth) before every run, so pairs are directly comparable.

Usage: python tools_dev/ab_weather.py [n_pairs] [out.jsonl]
Each line: {"arm": "r2"|"head", "pair": i, "t": unixtime,
            "rtt_ms": .., "upload_MBps": .., "msamples": ..,
            "vs_baseline": .., "wall_s": ..}
"""
import json
import os
import subprocess
import sys
import time

ARMS = [("r2", "/root/r2snap"), ("head", "/root/repo")]


def weather_probe():
    """independent RTT/bandwidth probe in a subprocess (clean jax)"""
    code = r"""
import json, time
import numpy as np
import jax, jax.numpy as jnp
dev = jax.devices()[0]
one = jnp.ones((), jnp.int32)
jax.jit(lambda x: x + 1)(one).block_until_ready()
rtts = []
for _ in range(5):
    t0 = time.time()
    jax.jit(lambda x: x + 1)(one).block_until_ready()
    rtts.append(time.time() - t0)
buf = np.random.default_rng(0).integers(0, 256, 8 << 20, dtype=np.uint8)
bws = []
for _ in range(3):
    t0 = time.time()
    jax.device_put(buf, dev).block_until_ready()
    bws.append(time.time() - t0)
print(json.dumps({"rtt_ms": round(sorted(rtts)[2] * 1e3, 2),
                  "upload_MBps": round(8.0 / sorted(bws)[1], 1)}))
"""
    try:
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True,
                             timeout=300)
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                return json.loads(line)
    except Exception:
        pass
    return {"rtt_ms": -1.0, "upload_MBps": -1.0}


def run_bench(cwd, env):
    t0 = time.time()
    out = subprocess.run([sys.executable, "bench.py"], cwd=cwd,
                         capture_output=True, text=True, env=env,
                         timeout=1800)
    wall = time.time() - t0
    val, vsb = 0.0, 0.0
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            j = json.loads(line)
            val, vsb = j.get("value", 0.0), j.get("vs_baseline", 0.0)
    if val == 0.0:
        sys.stderr.write(out.stderr[-2000:] + "\n")
    return val, vsb, wall


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    out_path = (sys.argv[2] if len(sys.argv) > 2
                else "tools_dev/ab_results.jsonl")
    env = dict(os.environ)
    # identical measured quantity on both arms (r2 defaulted 8 batches)
    env.setdefault("ATPU_BENCH_BATCHES", "16")
    env.setdefault("ATPU_BENCH_TRIALS", "4")
    # separate native-build caches are content-hashed already; jit
    # caches are per-checkout via jax's default persistent cache dir
    with open(out_path, "a") as f:
        for pair in range(n_pairs):
            for arm, cwd in ARMS:
                w = weather_probe()
                val, vsb, wall = run_bench(cwd, env)
                rec = {"arm": arm, "pair": pair,
                       "t": round(time.time(), 1), **w,
                       "msamples": val, "vs_baseline": vsb,
                       "wall_s": round(wall, 1)}
                f.write(json.dumps(rec) + "\n")
                f.flush()
                print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())
