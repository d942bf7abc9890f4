#!/usr/bin/env python
"""Multi-template FFT matched filtering throughput (reference
TemplateCrossCorrelator benchmark, xcorrRoutines.py:2130 test main, and the
multiTemplateSlidingDotProduct kernel, multiplySlices.cu:252).

Usage: python benchmarks/benchmark_templates.py [input_size] [ntemplates] [tlen]
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
    from pydsproutines_tpu.ops.groupxcorr import TemplateCrossCorrelator

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
    t = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    tlen = int(sys.argv[3]) if len(sys.argv) > 3 else 512

    rng = np.random.default_rng(1)
    templates = (rng.standard_normal((t, tlen))
                 + 1j * rng.standard_normal((t, tlen))).astype(np.complex64)
    tcc = TemplateCrossCorrelator(templates, n)
    x_ri = rng.standard_normal((2, n), dtype=np.float32)
    d_x = jax.device_put(jnp.asarray(x_ri))

    @functools.partial(jax.jit, static_argnames=("n_reps",))
    def step(xri, salt, n_reps):
        outs = []
        for i in range(n_reps):
            x = jax.lax.complex(xri[0] * (1.0 + 1e-7 * (salt + i)), xri[1])
            best, idx = tcc.correlate(x, return_max=True)
            outs.append(jnp.max(best))
        return jnp.stack(outs)

    dt = rep_differenced(step, d_x)
    rate = n * t / dt / 1e9
    print(f"TemplateCrossCorrelator {t} x {tlen} over {n}: "
          f"{rate:.2f} Gsample-template/s ({dt*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
