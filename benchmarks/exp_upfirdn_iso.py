#!/usr/bin/env python
"""Isolate where upfirdn's 1.74 ms goes (chain breakdown follow-up).

The einsum bound: total dense MACs = 2 planes x n_out x W, so W (window
width per output block) is the whole cost — and W grows linearly with the
block width gp. Sweep gp, split window-build from matmul, and compare einsum
layouts, all rep-differenced in one process.
"""

import functools
import math
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import rep_differenced
from pydsproutines_tpu.ops.filters import get_upfirdn_size

N = 4_194_304
RS_TAPS = 95
UP, DOWN = 5, 4

rng = np.random.default_rng(1)
x_ri = rng.standard_normal((2, N), dtype=np.float32)
h_rs = rng.standard_normal(RS_TAPS).astype(np.float32)
d_x = jax.device_put(jnp.asarray(x_ri))
d_hr = jax.device_put(jnp.asarray(h_rs))
n_out = get_upfirdn_size(N, RS_TAPS, UP, DOWN)


def build_parts(planes, taps_r, up, down, n_out, gp):
    """Window/tap construction from _upfirdn_poly_planes at block width gp."""
    g = math.gcd(up, down)
    P = up // g
    S = down // g
    T = taps_r.shape[-1]
    Lh = -(-T // up)
    hpad = jnp.zeros(Lh * up, taps_r.dtype).at[:T].set(taps_r)
    Hp = hpad.reshape(Lh, up).T
    c = np.arange(P)
    p_c = (c * down) % up
    qc_c = (c * down) // up
    qmax = int(qc_c[-1])
    Lw = Lh + qmax
    cols = gp * P
    W = (gp - 1) * S + Lw
    t_full = np.arange(W)[:, None]
    col_full = np.arange(cols)[None, :]
    gi_f = col_full // P
    ci_f = col_full % P
    l_f = (gi_f * S + qc_c[ci_f] + Lh - 1) - t_full
    valid = (l_f >= 0) & (l_f < Lh)
    Kj = jnp.where(jnp.asarray(valid),
                   Hp[jnp.asarray(p_c[ci_f]),
                      jnp.asarray(np.clip(l_f, 0, Lh - 1))], 0)
    nblocks = -(-n_out // cols)
    left = Lh - 1
    stride = gp * S
    rr = -(-W // stride)
    need = (nblocks - 1) * stride + rr * stride
    right = max(0, need - (planes.shape[-1] + left))
    xp = jnp.pad(planes, ((0, 0), (left, right)))
    rows = planes.shape[0]
    parts = [jax.lax.slice(xp, (0, i * stride),
                           (rows, i * stride + nblocks * stride))
             .reshape(rows, nblocks, stride) for i in range(rr)]
    win = jnp.concatenate(parts, axis=2)[:, :, :W]
    return win, Kj, nblocks, cols, W


def measure(name, body):
    @functools.partial(jax.jit, static_argnames=("n_reps",))
    def step(xri, salt, n_reps):
        outs = []
        for i in range(n_reps):
            xp = xri * (1.0 + 1e-7 * (salt + i))
            outs.append(body(xp))
        return jnp.stack(outs)

    dt = rep_differenced(step, d_x)
    print(f"{name:52s} {dt * 1e3:8.3f} ms  {N / dt / 1e9:7.2f} GS/s",
          flush=True)
    return dt


HI = jax.lax.Precision.HIGHEST

# 1. window build alone vs full op, per gp
for gp in (32, 48, 64, 128):
    def win_only(xp, _gp=gp):
        win, Kj, nb, cols, W = build_parts(xp, d_hr, UP, DOWN, n_out, _gp)
        return jnp.sum(win)
    def full(xp, _gp=gp):
        win, Kj, nb, cols, W = build_parts(xp, d_hr, UP, DOWN, n_out, _gp)
        out = jnp.einsum("rbt,tc->rbc", win, Kj, precision=HI)
        return jnp.sum(jnp.abs(out.reshape(2, -1)[:, :n_out]))
    win, Kj, nb, cols, W = build_parts(
        jnp.asarray(x_ri), d_hr, UP, DOWN, n_out, gp)
    gflop = 2 * nb * cols * W * 2 / 1e9
    print(f"--- gp={gp} cols={cols} W={W} blocks={nb} "
          f"dense={gflop:.1f} Gflop")
    measure(f"  window build only gp={gp}", win_only)
    measure(f"  full einsum gp={gp}", full)

# 2. einsum layout variants at gp=128 on a PRE-BUILT window (matmul only)
win0, Kj0, nb0, cols0, W0 = build_parts(
    jnp.asarray(x_ri), d_hr, UP, DOWN, n_out, 128)
d_win = jax.device_put(win0)
d_k = jax.device_put(Kj0)


def measure_mm(name, body):
    @functools.partial(jax.jit, static_argnames=("n_reps",))
    def step(w, salt, n_reps):
        outs = []
        for i in range(n_reps):
            wp = w * (1.0 + 1e-7 * (salt + i))
            outs.append(body(wp))
        return jnp.stack(outs)

    dt = rep_differenced(step, d_win)
    print(f"{name:52s} {dt * 1e3:8.3f} ms  {N / dt / 1e9:7.2f} GS/s",
          flush=True)


measure_mm("matmul only rbt,tc (HIGHEST)",
           lambda w: jnp.sum(jnp.abs(jnp.einsum(
               "rbt,tc->rbc", w, d_k, precision=HI))))
measure_mm("matmul only (rb)t,tc (HIGHEST)",
           lambda w: jnp.sum(jnp.abs(
               w.reshape(-1, W0) @ d_k if False else
               jnp.matmul(w.reshape(-1, W0), d_k, precision=HI))))
measure_mm("matmul only (rb)t,tc (HIGH)",
           lambda w: jnp.sum(jnp.abs(jnp.matmul(
               w.reshape(-1, W0), d_k,
               precision=jax.lax.Precision.HIGH))))
measure_mm("matmul only (rb)t,tc (DEFAULT)",
           lambda w: jnp.sum(jnp.abs(jnp.matmul(
               w.reshape(-1, W0), d_k,
               precision=jax.lax.Precision.DEFAULT))))
