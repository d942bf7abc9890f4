"""Chip probe: where do the ~0.19 ms between the FIR chain (0.97 ms,
4.33 GS/s official) and the kernel-only measurement (0.78 ms) go?

  f. bench-identical chain (static np taps, input perturb)
  g. direct _upfirdn_pallas_planes2 with precombined static taps
     (same perturb + forcing — the only difference vs f is the chain
     wrapper: h_comb fold + dispatch + flat-plane entry)

Run: timeout 2400 python benchmarks/exp_fir_gap.py
"""

from __future__ import annotations

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

if __name__ == "__main__":
    import jax
    import jax.numpy as jnp

    from bench import rep_differenced
    from pydsproutines_tpu.ops.filters import (fir_upfirdn_planes_flat,
                                               get_upfirdn_size)
    from pydsproutines_tpu.ops.pallas.upfirdn import _upfirdn_pallas_planes2

    n, t1, t2, up, down = 4_194_304, 128, 95, 5, 4
    rng = np.random.default_rng(1)
    x_ri = rng.standard_normal((2, n), dtype=np.float32)
    h_fir = rng.standard_normal(t1).astype(np.float32)
    h_rs = rng.standard_normal(t2).astype(np.float32)
    h_up = np.zeros(t1 * up - (up - 1), np.float64)
    h_up[::up] = h_fir
    h_comb = np.convolve(h_up, h_rs.astype(np.float64)).astype(np.float32)
    n_out = get_upfirdn_size(n, t2, up, down)
    d_x = jax.device_put(jnp.asarray(x_ri))

    @functools.partial(jax.jit, static_argnames=("n_reps",))
    def step_f(xri, salt, n_reps):
        outs = []
        for i in range(n_reps):
            o_re, o_im = fir_upfirdn_planes_flat(
                jnp.asarray(h_fir), jnp.asarray(h_rs),
                xri[0] * (1.0 + 1e-7 * (salt + i)), xri[1], up, down)
            outs.append(jnp.sum(o_re[:128]) + jnp.sum(o_im[-128:]))
        return jnp.stack(outs)

    @functools.partial(jax.jit, static_argnames=("n_reps",))
    def step_g(xri, salt, n_reps):
        outs = []
        for i in range(n_reps):
            y = _upfirdn_pallas_planes2(
                xri[0] * (1.0 + 1e-7 * (salt + i)), xri[1],
                jnp.asarray(h_comb), up, down, n_out)
            outs.append(jnp.sum(y[0, :128]) + jnp.sum(y[1, -128:]))
        return jnp.stack(outs)

    for name, fn in (("f. chain (bench-identical)", step_f),
                     ("g. kernel direct          ", step_g)):
        try:
            dt = rep_differenced(fn, d_x, max_r_hi=16)
            print(f"{name}: {dt*1e3:7.3f} ms -> {n/dt/1e9:5.2f} GS/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
