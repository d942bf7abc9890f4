#!/usr/bin/env python
"""Cached CZT plan throughput, batched rows (reference benchmark_czts.py:
CZTCached vs scipy czt vs IppCZT; here the matmul-FFT Bluestein plan).

Usage: python benchmarks/benchmark_czt.py [rows] [xlen] [k]
"""
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
from bench import rep_differenced


def main():
    import jax
    import jax.numpy as jnp
    from pydsproutines_tpu.ops.spectral import CZT

    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    xlen = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000
    fs = 1e6
    plan = CZT(xlen, -100e3, 100e3 - 200e3 / k, 200e3 / k, fs)
    assert plan.k == k

    rng = np.random.default_rng(4)
    x_ri = rng.standard_normal((2, rows, xlen), dtype=np.float32)
    d_x = jax.device_put(jnp.asarray(x_ri))

    @functools.partial(jax.jit, static_argnames=("n_reps",))
    def step(xri, salt, n_reps):
        outs = []
        for i in range(n_reps):
            x = jax.lax.complex(xri[0] * (1.0 + 1e-7 * (salt + i)), xri[1])
            outs.append(jnp.sum(jnp.abs(plan.run_many(x))))
        return jnp.stack(outs)

    dt = rep_differenced(step, d_x)
    print(f"CZT plan {rows} rows x {xlen} -> {k} bins: "
          f"{rows * xlen / dt / 1e9:.2f} GS/s ({dt*1e3:.3f} ms)")

    # scipy tier for scale (single row, 8 reps)
    import scipy.signal as sps
    import time as _t
    x0 = (x_ri[0, 0] + 1j * x_ri[1, 0]).astype(np.complex64)
    w = np.exp(-2j * np.pi * (200e3 / k) / fs)
    a = np.exp(2j * np.pi * (-100e3) / fs)
    t0 = _t.perf_counter()
    for _ in range(8):
        sps.czt(x0, k, w, a)
    t_sp = (_t.perf_counter() - t0) / 8
    print(f"scipy.signal.czt single row : {xlen / t_sp / 1e9:.4f} GS/s")


if __name__ == "__main__":
    main()
