"""Tunnel-weather probe: 10 MB device_put + 4-byte readback, min/median of N.

The serving tunnel's bandwidth and round-trip latency vary by the hour
(docs/PERF_NOTES.md "tunnel weather warning"); bracket every bench session
with this probe so wall-clock deltas can be attributed to code vs weather.
Prints one JSON line: {"upload_MBps": ..., "rt_ms": ...}.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(reps: int = 8):
    dev = jax.devices()[0]
    # explicit float32: a float64 blob is canonicalized host-side to fp32
    # under x64-off, halving the bytes on the wire — probes before round 5
    # reported ~2x the real tunnel MB/s because of this
    blob = np.random.default_rng(0).random(10 * 1024 * 1024 // 4).astype(np.float32)
    up, rt = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        d = jax.device_put(blob, dev)
        d.block_until_ready()
        up.append(time.perf_counter() - t0)
        s = jnp.sum(d[:1])
        s.block_until_ready()
        t0 = time.perf_counter()
        float(s)
        rt.append(time.perf_counter() - t0)
        del d
    mb = blob.nbytes / 1e6
    ups = mb / np.median(up)
    print(json.dumps({
        "upload_MBps": round(float(ups), 1),
        "upload_MBps_best": round(float(mb / min(up)), 1),
        "rt_ms": round(float(np.median(rt) * 1e3), 2),
        "platform": dev.platform,
    }))


if __name__ == "__main__":
    main()
