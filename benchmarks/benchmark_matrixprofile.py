#!/usr/bin/env python
"""Matrix-profile throughput (reference benchmark_matrix_profile.py;
matrixProfile.cu diagonal kernels).

Usage: python benchmarks/benchmark_matrixprofile.py [n] [window]
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
    from pydsproutines_tpu.ops.matrixprofile import MatrixProfile

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16_384
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    rng = np.random.default_rng(3)
    x_ri = rng.standard_normal((2, n), dtype=np.float32)
    d_x = jax.device_put(jnp.asarray(x_ri))
    mp = MatrixProfile(w)
    ndiag = int(sys.argv[3]) if len(sys.argv) > 3 else n - w

    @functools.partial(jax.jit, static_argnames=("n_reps",))
    def step(xri, salt, n_reps):
        outs = []
        for i in range(n_reps):
            x = jax.lax.complex(xri[0] * (1.0 + 1e-7 * (salt + i)), xri[1])
            prof = mp.compute(x, num_diags=ndiag)
            outs.append(jnp.max(prof[0]) if isinstance(prof, tuple)
                        else jnp.max(prof))
        return jnp.stack(outs)

    dt = rep_differenced(step, d_x)
    pairs = ndiag * (n - w)
    print(f"MatrixProfile n={n} w={w} diags={ndiag}: "
          f"{pairs / dt / 1e9:.2f} Gpairs/s ({dt*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
