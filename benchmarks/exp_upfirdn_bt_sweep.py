#!/usr/bin/env python
"""On-chip sweep: upfirdn Pallas kernel bt (MXU row tile) x dot precision,
on the COMBINED-taps bench geometry (fir_upfirdn chain). Locates where the
1.6 ms (bound ~0.55) goes."""
import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import rep_differenced
from pydsproutines_tpu.ops.pallas.upfirdn import _upfirdn_pallas_planes
from pydsproutines_tpu.ops.filters import get_upfirdn_size

N = 4_194_304
FIR_TAPS, RS_TAPS, UP, DOWN = 128, 95, 5, 4
rng = np.random.default_rng(1)
x_ri = rng.standard_normal((2, N), dtype=np.float32)
h_fir = rng.standard_normal(FIR_TAPS).astype(np.float32)
h_rs = rng.standard_normal(RS_TAPS).astype(np.float32)
h_up = np.zeros(FIR_TAPS * UP - (UP - 1), dtype=np.float64)
h_up[::UP] = h_fir
h_comb = np.convolve(h_up, h_rs.astype(np.float64)).astype(np.float32)
n_out = get_upfirdn_size(N, len(h_comb), UP, DOWN)
d_x = jax.device_put(jnp.asarray(x_ri))
d_h = jax.device_put(jnp.asarray(h_comb))


def measure(name, bt, prec):
    @functools.partial(jax.jit, static_argnames=("n_reps",))
    def step(xp, salt, n_reps):
        outs = []
        for i in range(n_reps):
            xs = xp * (1.0 + 1e-7 * (salt + i))
            o = _upfirdn_pallas_planes(xs, d_h, UP, DOWN, n_out,
                                       bt=bt, prec=prec)
            outs.append(jnp.sum(jnp.abs(o)))
        return jnp.stack(outs)
    dt = rep_differenced(step, d_x, max_r_hi=16)
    print(f"{name:40s} {dt * 1e3:8.3f} ms  {N / dt / 1e9:7.2f} GS/s",
          flush=True)


for tok in (sys.argv[1:] or ["512:highest", "512:high", "128:default"]):
    bt_s, prec = tok.split(":")
    measure(f"bt={bt_s} prec={prec}", int(bt_s), prec)
