#!/usr/bin/env python
"""FIR / upfirdn / moving-average / medfilt throughput on the real chip
(reference analogues: benchmark_filter_kernels.py, benchmark_upfirdn.py,
benchmark_movingAvg.py, plus the GPU medfilt claim filterRoutines.py:1068).

Usage: python benchmarks/benchmark_filters.py [nsamples]
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
    from pydsproutines_tpu.ops.filters import (lfilter_fir, upfirdn,
                                               moving_average, medfilt)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_194_304
    rng = np.random.default_rng(0)
    x_ri = rng.standard_normal((2, n), dtype=np.float32)
    d_x = jax.device_put(jnp.asarray(x_ri))
    h128 = rng.standard_normal(128).astype(np.float32)
    h95 = rng.standard_normal(95).astype(np.float32)

    def run(name, body):
        @functools.partial(jax.jit, static_argnames=("n_reps",))
        def step(xri, salt, n_reps):
            outs = []
            for i in range(n_reps):
                x = jax.lax.complex(xri[0] * (1.0 + 1e-7 * (salt + i)),
                                    xri[1])
                outs.append(body(x))
            return jnp.stack(outs)
        dt = rep_differenced(step, d_x)
        print(f"{name:28s}: {n / dt / 1e9:6.3f} GS/s  ({dt*1e3:.2f} ms)")
        sys.stdout.flush()

    run("lfilter_fir 128 taps",
        lambda x: jnp.sum(jnp.abs(lfilter_fir(jnp.asarray(h128), x))))
    run("upfirdn 95 taps up5 down4",
        lambda x: jnp.sum(jnp.abs(upfirdn(jnp.asarray(h95), x, 5, 4))))
    run("moving_average 128 (real)",
        lambda x: jnp.sum(moving_average(x.real, 128)))
    run("medfilt 129 (real)",
        lambda x: jnp.sum(medfilt(x.real, 129)))


if __name__ == "__main__":
    main()
