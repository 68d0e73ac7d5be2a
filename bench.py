#!/usr/bin/env python
"""Headline benchmark: rotate-path throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline target (BASELINE.json): >= 1000x realtime mono 48 kHz rotation per
chip.  vs_baseline is the achieved realtime multiple divided by 1000.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from phaserotate_tpu.ops import rotate_fir

    rate = 48000
    seconds = 60
    batch = 16
    n = rate * seconds
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
    degs = jnp.asarray(rng.uniform(-180, 180, batch).astype(np.float32))

    # Reduce to a scalar and fetch it each iteration: on the remote-tunnel
    # TPU backend, block_until_ready alone does not guarantee completion,
    # so honest timing requires a readback.
    run = jax.jit(lambda x, d: jnp.sum(rotate_fir(x, d, rate=rate)))

    float(run(x, degs))  # compile + warm up

    iters = 5
    # distinct angle vectors per iteration so no result can be reused
    t0 = time.perf_counter()
    for i in range(iters):
        float(run(x, degs + float(i)))
    dt = (time.perf_counter() - t0) / iters

    samples_per_sec = batch * n / dt
    realtime_x = samples_per_sec / rate
    print(
        json.dumps(
            {
                "metric": "rotate_realtime_multiple_mono48k",
                "value": round(realtime_x, 1),
                "unit": "x_realtime_per_chip",
                "vs_baseline": round(realtime_x / 1000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
