#!/usr/bin/env python
"""Headline benchmarks on one TPU chip.

Two driver-set targets (BASELINE.json):
  1. rotate path  >= 1000x realtime, mono 48 kHz, per chip
  2. batched min-peak angle search >= 100 files/s (10 s files)

Prints ONE JSON line; `value` is the rotate realtime multiple and
`vs_baseline` is the *minimum* of the two target ratios, so it only reads
>= 1 when both targets are met.  Timing forces a scalar readback per
iteration because block_until_ready does not guarantee completion on the
remote-tunnel TPU backend.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_rotate(rate=48000, seconds=60, batch=48, iters=4):
    from phaserotate_tpu.ops import rotate_fir

    n = rate * seconds
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
    degs = jnp.asarray(rng.uniform(-180, 180, batch).astype(np.float32))
    run = jax.jit(lambda x, d: jnp.sum(rotate_fir(x, d, rate=rate)))
    float(run(x, degs))  # compile + warm
    t0 = time.perf_counter()
    for i in range(iters):
        float(run(x, degs + float(i)))  # distinct angles defeat caching
    dt = (time.perf_counter() - t0) / iters
    return batch * n / dt / rate  # x realtime


def bench_search(rate=48000, seconds=10, batch=256, iters=4):
    from phaserotate_tpu.core.sizes import OfflineGeometry
    from phaserotate_tpu.search.sweep import _sweep_impl

    geom = OfflineGeometry(blksiz=8192)
    n = rate * seconds
    rng = np.random.default_rng(1)
    x = jnp.asarray(0.5 * rng.standard_normal((batch, n)).astype(np.float32))
    f = jax.jit(lambda x, s: jnp.sum(_sweep_impl(x + s, geom, 4096)[0]))
    float(f(x, 0.0))  # compile + warm
    t0 = time.perf_counter()
    for i in range(iters):
        float(f(x, 0.01 * i))
    dt = (time.perf_counter() - t0) / iters
    return batch / dt  # files per second


def main():
    rt = bench_rotate()
    fps = bench_search()
    print(
        json.dumps(
            {
                "metric": "rotate_x_realtime_mono48k (search_files_per_s="
                + str(round(fps, 1))
                + ")",
                "value": round(rt, 1),
                "unit": "x_realtime_per_chip",
                "vs_baseline": round(min(rt / 1000.0, fps / 100.0), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
