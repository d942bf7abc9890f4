#!/usr/bin/env python
"""Batched large-N FFT: XLA's native FFT vs the matmul four-step plan.

Usage:
    python benchmarks/benchmark_fft.py [n] [batch]

Measured v5e at n=2^20, batch 16: jnp.fft.fft ~22 ms, four-step matmul plan
~11 ms (2x); at n=2^18 batch 16: 2.05 ms vs 0.15 ms (13.4x). XLA's FFT is ~40x off the HBM roofline for these shapes while
the matmul formulation rides the MXU. Big plans (>48 MB of stage constants)
generate their DFT matrices in-trace (see ops/fft.py device_gen).
"""

import functools
import os
import sys
import time

# repo root on sys.path (PYTHONPATH breaks the axon plugin; see ROADMAP.md)
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from pydsproutines_tpu.ops.fft import get_fft_plan

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    plan = get_fft_plan(n)
    print(f"n={n} factors={plan.factors} device_gen={getattr(plan, 'device_gen', False)}")
    rng = np.random.default_rng(0)
    x_ri = rng.standard_normal((2, batch, n), dtype=np.float32)

    def bench(tag, fn):
        @functools.partial(jax.jit, static_argnames=("n_reps",))
        def step(xri, n_reps):
            def one(eps):
                xx = jax.lax.complex(xri[0] * (1.0 + eps), xri[1])
                y = fn(xx)
                return jnp.sum(jnp.abs(y[:, :8]))
            return jax.lax.map(one, 1e-7 * jnp.arange(1, n_reps + 1,
                                                      dtype=jnp.float32))
        d_x = jax.device_put(jnp.asarray(x_ri))

        def timed(nr):
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(step(d_x, nr))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        timed(1); timed(4)
        dt = (timed(4) - timed(1)) / 3
        print(f"{tag}: {dt * 1e3:.2f} ms per {batch} x {n} batch")
        return dt

    t_xla = bench("jnp.fft.fft   ", lambda xx: jnp.fft.fft(xx, axis=-1))
    t_mm = bench("four-step plan", plan)
    print(f"speedup: {t_xla / t_mm:.2f}x")


if __name__ == "__main__":
    main()
