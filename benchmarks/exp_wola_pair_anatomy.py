#!/usr/bin/env python
"""On-chip anatomy of the PAIR-ROW fused WOLA kernel: close the gap to the
0.58 ms/8M interleaved-kernel floor (VERDICT round-3 weak #2).

Variants (one process, rep-differenced):
  dma       — pair-plane DMAs + copy out (transfer floor for this layout)
  yt        — dma + odd-parity companion tile build only
  fold      — dma + both-plane folds, CURRENT 48-slot (r,q) tables
  fold2     — dma + both-plane folds, 34-slot tables (nq=2 + one aligned
              extra pass for the u=0 taps) — the zero-waste regrouping
  mm-hst    — dma + (256,256) IDFT matmul alone, Precision.HIGHEST
  mm-high   — same, Precision.HIGH (bf16x3)
  kern      — current shipped kernel body (fold48 + concat + mm HIGHEST)
  kern2     — fold2 + mm HIGH (the candidate round-4 kernel)
  zip       — pair-plane DMAs + in-kernel interleave into the
              interleaved-lane tile (stack + reshape) + copy out: measures
              whether the 0.58 ms interleaved path can be fed for free
  zipkern   — zip + interleaved 40-slot fold + (128,128) mm (the full
              alternative kernel at the interleaved layout)
  ship      — shipped public wola_fused_planes2 (reference point)

Usage: python exp_wola_pair_anatomy.py [variant ...]   (default: all)
"""
import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import rep_differenced
from pydsproutines_tpu.ops.pallas.wola_fused import (
    _idft_pair_block, wola_fused_planes2)
from pydsproutines_tpu.ops.wola import wola_planes

N = 8_388_608
DEC = NCH = 64
TAPS = 2048
B = TAPS // NCH          # 32
H = B // 2               # 16
ROWS = N // DEC          # 131072
R2 = ROWS // 2           # 65536 pair rows
KB = 1024
NSTEPS = R2 // KB

rng = np.random.default_rng(2)
x_ri = rng.standard_normal((2, N), dtype=np.float32)
h = rng.standard_normal(TAPS).astype(np.float32)
d_h = jax.device_put(jnp.asarray(h))
# pair-layout planes (free reshapes of the quadrature planes)
d_re = jax.device_put(jnp.asarray(x_ri[0].reshape(R2, 2 * NCH)))
d_im = jax.device_put(jnp.asarray(x_ri[1].reshape(R2, 2 * NCH)))

WW = jnp.asarray(_idft_pair_block(NCH))


def make_tables48():
    """The round-3 uniform-nq (48-slot) tables, inlined: the library now
    ships the zero-waste 34-slot fold, so the historical variant's tables
    are rebuilt here for the A/B."""
    s_i = np.arange(B + 1)[:, None]
    c_i = np.arange(NCH)[None, :]
    idx0 = np.clip(s_i * NCH, 0, TAPS - 1)
    idxc = np.clip((s_i - 1) * NCH + (NCH - c_i), 0, TAPS - 1)
    valid = np.where(c_i == 0, s_i < B, s_i >= 1)
    tap_idx = np.where(c_i == 0, idx0, idxc)
    T = np.where(valid, h[tap_idx], 0.0).astype(np.float32)
    nq = (H + 8) // 8
    u_i = H - 8 * np.tile(np.arange(nq), 8) - np.repeat(np.arange(8), nq)
    ve = (u_i >= 0) & (u_i <= H)
    vo = (u_i >= 0) & (u_i <= H - 1)
    se = np.clip(2 * u_i, 0, B)
    so = np.clip(2 * u_i + 1, 0, B)
    t3e = np.where(ve[:, None], T[se], 0.0)
    t3o = np.where(vo[:, None], T[so], 0.0)
    t3e = np.concatenate([t3e, t3e], axis=1)
    t3o = np.concatenate([t3o, t3o], axis=1)
    return jnp.asarray(t3e), jnp.asarray(t3o), nq


T3E, T3O, NQ = make_tables48()


def make_tables2():
    """34-slot fold tables (what the library now ships in _fold_tables),
    split into the (r, q<2) block + the u=0 row for this script's kernels."""
    from pydsproutines_tpu.ops.pallas.wola_fused import _fold_tables
    t3e, t3o, _, nq2 = _fold_tables(jnp.asarray(h), NCH, B)
    assert nq2 == 2 and t3e.shape[0] == 8 * nq2 + 1
    return (t3e[:16], t3o[:16], t3e[16:17], t3o[16:17])


T2E, T2O, E0, O0 = make_tables2()


def make_interleaved_tables():
    """Interleaved-lane 40-slot tables (the round-3 exp_wola_anatomy
    regrouping) + the (128,128) interleaved IDFT matrix."""
    s_i = np.arange(B + 1)[:, None]
    c_i = np.arange(NCH)[None, :]
    idx0 = np.clip(s_i * NCH, 0, TAPS - 1)
    idxc = np.clip((s_i - 1) * NCH + (NCH - c_i), 0, TAPS - 1)
    valid = np.where(c_i == 0, s_i < B, s_i >= 1)
    tap_idx = np.where(c_i == 0, idx0, idxc)
    T = np.where(valid, h[tap_idx], 0.0).astype(np.float32)
    t2 = np.repeat(T, 2, axis=1)          # interleaved lanes share the tap
    nq = (B + 8) // 8                     # 5
    r_i = np.repeat(np.arange(8), nq)
    q_i = np.tile(np.arange(nq), 8)
    a_i = B - 8 * q_i - r_i
    t3 = np.where(((a_i >= 0) & (a_i <= B))[:, None],
                  t2[np.clip(a_i, 0, B)], 0.0).astype(np.float32)

    k = np.arange(NCH, dtype=np.float64)
    wconj = np.exp(2j * np.pi * np.mod(np.outer(k, k), NCH) / NCH)
    perm = (-np.arange(NCH)) % NCH
    Wp = wconj[perm]
    W4 = np.zeros((2 * NCH, 2 * NCH), np.float32)
    W4[0::2, 0::2] = Wp.real
    W4[0::2, 1::2] = Wp.imag
    W4[1::2, 0::2] = -Wp.imag
    W4[1::2, 1::2] = Wp.real
    return jnp.asarray(t3), nq, jnp.asarray(W4)


TI3, INQ, W4I = make_interleaved_tables()


def pair_kernel(xre_hbm, xim_hbm, t3e, t3o, t2e, t2o, e0, o0, ww, out,
                scratch, sems, *, kb, nsteps, mode):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    gi = pl.program_id(0)
    two = jnp.asarray(2, gi.dtype)
    slot = jax.lax.rem(gi, two)
    nslot = jax.lax.rem(gi + 1, two)
    planes_hbm = (xre_hbm, xim_hbm)

    def full_copies(step, slot_):
        return [pltpu.make_async_copy(
            planes_hbm[p].at[pl.ds(step * kb - H, kb + H), :],
            scratch.at[slot_, p, pl.ds(0, kb + H), :], sems.at[slot_, p])
            for p in range(2)]

    def head_copies(slot_):
        return [pltpu.make_async_copy(
            planes_hbm[p].at[pl.ds(0, kb), :],
            scratch.at[slot_, p, pl.ds(H, kb), :], sems.at[slot_, p])
            for p in range(2)]

    @pl.when(gi == 0)
    def _():
        scratch[slot, :, :H, :] = jnp.zeros((2, H, 128), jnp.float32)
        scratch[0, :, kb + H:, :] = jnp.zeros((2, 8, 128), jnp.float32)
        scratch[1, :, kb + H:, :] = jnp.zeros((2, 8, 128), jnp.float32)
        for c in head_copies(slot):
            c.start()

    if nsteps > 1:
        @pl.when(gi + 1 < nsteps)
        def _():
            for c in full_copies(gi + 1, nslot):
                c.start()

        @pl.when(gi > 0)
        def _():
            for c in full_copies(gi, slot):
                c.wait()

    @pl.when(gi == 0)
    def _():
        for c in head_copies(slot):
            c.wait()

    lane = jax.lax.broadcasted_iota(jnp.int32, (kb + H + 8, 128), 1)

    def build_yt(xt):
        zt = pltpu.roll(xt, 64, 1)
        zprev = jnp.concatenate([zt[:1, :], zt[:-1, :]], axis=0)
        return jnp.where(lane < 64, zprev, zt)

    def fold48(plane):
        xt = scratch[slot, plane]
        yt = build_yt(xt)
        acc = jnp.zeros((kb, 128), jnp.float32)
        for r in range(8):
            u = xt[0: kb + 8, :] * t3e[r * NQ] + yt[0: kb + 8, :] * t3o[r * NQ]
            for q in range(1, NQ):
                u = u + xt[8 * q: 8 * q + kb + 8, :] * t3e[r * NQ + q] \
                      + yt[8 * q: 8 * q + kb + 8, :] * t3o[r * NQ + q]
            acc = acc + u[r: r + kb, :]
        return acc

    def fold34(plane):
        xt = scratch[slot, plane]
        yt = build_yt(xt)
        acc = xt[H: H + kb, :] * e0[0] + yt[H: H + kb, :] * o0[0]
        for r in range(8):
            u = xt[0: kb + 8, :] * t2e[r * 2] + yt[0: kb + 8, :] * t2o[r * 2]
            u = u + xt[8: 8 + kb + 8, :] * t2e[r * 2 + 1] \
                  + yt[8: 8 + kb + 8, :] * t2o[r * 2 + 1]
            acc = acc + u[r: r + kb, :]
        return acc

    if mode == "dma":
        out[...] = scratch[slot, 0, H: H + kb, :]
        return
    if mode == "yt":
        out[...] = build_yt(scratch[slot, 0])[H: H + kb, :] \
            + build_yt(scratch[slot, 1])[H: H + kb, :]
        return
    if mode == "fold":
        out[...] = fold48(0) + fold48(1)
        return
    if mode == "fold2":
        out[...] = fold34(0) + fold34(1)
        return
    if mode in ("mm-hst", "mm-high"):
        g = jnp.concatenate([scratch[slot, 0, H: H + kb, :],
                             scratch[slot, 1, H: H + kb, :]], axis=-1)
        prec = (jax.lax.Precision.HIGHEST if mode == "mm-hst"
                else jax.lax.Precision.HIGH)
        res = jax.lax.dot_general(
            g, ww[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        out[...] = res[:, :128] + res[:, 128:]
        return
    # kern / kern2
    if mode == "kern":
        g = jnp.concatenate([fold48(0), fold48(1)], axis=-1)
    else:
        g = jnp.concatenate([fold34(0), fold34(1)], axis=-1)
    prec = jax.lax.Precision.HIGHEST
    res = jax.lax.dot_general(
        g, ww[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    out[...] = res[:, :128] + res[:, 128:]


# interleaved-tile variants fed by in-kernel zip of the pair planes.
# Pair-row history HP = 20 (=> 40 interleaved history rows >= B+8), plus
# HPAD = 4 zeroed pair rows (8 int rows) for the aligned-fold over-read.
HP = H + 4        # 20
HPAD = 4


def zip_kernel(xre_hbm, xim_hbm, ti3, w4, out, scratch, sems, *,
               kb, nsteps, mode):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    gi = pl.program_id(0)
    two = jnp.asarray(2, gi.dtype)
    slot = jax.lax.rem(gi, two)
    nslot = jax.lax.rem(gi + 1, two)
    planes_hbm = (xre_hbm, xim_hbm)

    def full_copies(step, slot_):
        return [pltpu.make_async_copy(
            planes_hbm[p].at[pl.ds(step * kb - HP, kb + HP), :],
            scratch.at[slot_, p, pl.ds(0, kb + HP), :], sems.at[slot_, p])
            for p in range(2)]

    def head_copies(slot_):
        return [pltpu.make_async_copy(
            planes_hbm[p].at[pl.ds(0, kb), :],
            scratch.at[slot_, p, pl.ds(HP, kb), :], sems.at[slot_, p])
            for p in range(2)]

    @pl.when(gi == 0)
    def _():
        scratch[slot, :, :HP, :] = jnp.zeros((2, HP, 128), jnp.float32)
        scratch[0, :, kb + HP:, :] = jnp.zeros((2, HPAD, 128), jnp.float32)
        scratch[1, :, kb + HP:, :] = jnp.zeros((2, HPAD, 128), jnp.float32)
        for c in head_copies(slot):
            c.start()

    if nsteps > 1:
        @pl.when(gi + 1 < nsteps)
        def _():
            for c in full_copies(gi + 1, nslot):
                c.start()

        @pl.when(gi > 0)
        def _():
            for c in full_copies(gi, slot):
                c.wait()

    @pl.when(gi == 0)
    def _():
        for c in head_copies(slot):
            c.wait()

    # zip: (kb+HP+HPAD, 128) x 2 planes -> interleaved (2*(kb+HP+HPAD), 128)
    # stack(axis=-1) makes lane 2c <- xre[:, c], 2c+1 <- xim[:, c]; the
    # first 128 lanes of the (rows, 256) view interleave plane columns 0:64
    # (= xq row 2t), lanes 128:256 columns 64:128 (= xq row 2t+1); the
    # final row-major reshape lays them out as consecutive int rows.
    rows = kb + HP + HPAD
    xre = scratch[slot, 0]
    xim = scratch[slot, 1]
    zi = jnp.stack([xre, xim], axis=-1).reshape(rows, 256).reshape(
        2 * rows, 128)

    if mode == "zip":
        out[...] = zi[2 * HP: 2 * HP + 2 * kb, :]
        return

    # interleaved 40-slot fold: output int row t sits at zi row 2*HP + t;
    # tap a is read at zi[2*HP + t - a]; regrouped slices start at
    # base + 8q with base = 2*HP - B, tap index a = B - 8q - r
    base = 2 * HP - B          # 8
    acc = jnp.zeros((2 * kb, 128), jnp.float32)
    for r in range(8):
        u = zi[base: base + 2 * kb + 8, :] * ti3[r * INQ]
        for q in range(1, INQ):
            u = u + zi[base + 8 * q: base + 8 * q + 2 * kb + 8, :] \
                * ti3[r * INQ + q]
        acc = acc + u[r: r + 2 * kb, :]
    res = jax.lax.dot_general(
        acc, w4[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    out[...] = res


@functools.partial(jax.jit, static_argnames=("mode", "n_reps"))
def step_pair(re, im, salt, n_reps, mode):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    outs = []
    for i in range(n_reps):
        res = re * (1.0 + 1e-7 * (salt + i))
        out = pl.pallas_call(
            functools.partial(pair_kernel, kb=KB, nsteps=NSTEPS, mode=mode),
            grid=(NSTEPS,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
            out_specs=pl.BlockSpec((KB, 128), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NSTEPS * KB, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((2, 2, KB + H + 8, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA((2, 2))],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(res, im, T3E, T3O, T2E, T2O, E0, O0, WW)
        outs.append(jnp.sum(out))
    return jnp.stack(outs)


@functools.partial(jax.jit, static_argnames=("mode", "n_reps"))
def step_zip(re, im, salt, n_reps, mode):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    outs = []
    for i in range(n_reps):
        res = re * (1.0 + 1e-7 * (salt + i))
        out = pl.pallas_call(
            functools.partial(zip_kernel, kb=KB, nsteps=NSTEPS, mode=mode),
            grid=(NSTEPS,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((2 * KB, 128), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NSTEPS * 2 * KB, 128),
                                           jnp.float32),
            scratch_shapes=[pltpu.VMEM((2, 2, KB + HP + HPAD, 128),
                                       jnp.float32),
                            pltpu.SemaphoreType.DMA((2, 2))],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(res, im, TI3, W4I)
        outs.append(jnp.sum(out))
    return jnp.stack(outs)


d_xre = jax.device_put(jnp.asarray(x_ri[0].reshape(ROWS, NCH)))
d_xim = jax.device_put(jnp.asarray(x_ri[1].reshape(ROWS, NCH)))
d_fre = jax.device_put(jnp.asarray(x_ri[0]))
d_fim = jax.device_put(jnp.asarray(x_ri[1]))


@functools.partial(jax.jit, static_argnames=("n_reps",))
def step_ship(re, im, salt, n_reps):
    outs = []
    for i in range(n_reps):
        o_re, o_im = wola_fused_planes2(d_h, re * (1.0 + 1e-7 * (salt + i)),
                                        im, DEC, NCH)
        outs.append(jnp.sum(o_re) + jnp.sum(o_im))
    return jnp.stack(outs)


@functools.partial(jax.jit, static_argnames=("n_reps",))
def step_planes(re, im, salt, n_reps):
    """The (rows, 64) plane surface (pays lane-padding relayouts)."""
    outs = []
    for i in range(n_reps):
        o_re, o_im = wola_planes(d_h, re * (1.0 + 1e-7 * (salt + i)), im,
                                 DEC, NCH)
        outs.append(jnp.sum(jnp.sqrt(o_re * o_re + o_im * o_im)))
    return jnp.stack(outs)


@functools.partial(jax.jit, static_argnames=("n_reps",))
def step_flat(re, im, salt, n_reps):
    """Flat planes + heavy (input-perturb, full-sum) harness."""
    from pydsproutines_tpu.ops.wola import wola_planes_flat
    outs = []
    for i in range(n_reps):
        o_re, o_im = wola_planes_flat(d_h, re * (1.0 + 1e-7 * (salt + i)),
                                      im, DEC, NCH)
        outs.append(jnp.sum(jnp.sqrt(o_re * o_re + o_im * o_im)))
    return jnp.stack(outs)


@functools.partial(jax.jit, static_argnames=("n_reps",))
def step_flat2(re, im, salt, n_reps):
    """Exactly the official bench workload: tap-perturb anti-memoization +
    slim forcing (kernel still writes the full channel matrix)."""
    from pydsproutines_tpu.ops.wola import wola_planes_flat
    outs = []
    for i in range(n_reps):
        hh = d_h * (1.0 + 1e-7 * (salt + i))
        o_re, o_im = wola_planes_flat(hh, re, im, DEC, NCH)
        outs.append(jnp.sum(o_re[:128]) + jnp.sum(o_im[-128:]))
    return jnp.stack(outs)


def parity_check():
    """fold2/kern2 and zipkern must match the shipped kernel numerically."""
    o_re, o_im = wola_fused_planes2(d_h, d_xre, d_xim, DEC, NCH)
    ref = np.asarray(o_re) + 1j * np.asarray(o_im)

    def from_pair(mode):
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        out = pl.pallas_call(
            functools.partial(pair_kernel, kb=KB, nsteps=NSTEPS, mode=mode),
            grid=(NSTEPS,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
            out_specs=pl.BlockSpec((KB, 128), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NSTEPS * KB, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((2, 2, KB + H + 8, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA((2, 2))],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(d_re, d_im, T3E, T3O, T2E, T2O, E0, O0, WW)
        return np.asarray(out)

    # kern (res_re + res_im summed halves) vs kern2
    a = from_pair("kern")
    b = from_pair("kern2")
    rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-30)
    print(f"parity kern vs kern2 (incl. HIGH matmul): rel {rel:.2e}",
          flush=True)

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    zk = pl.pallas_call(
        functools.partial(zip_kernel, kb=KB, nsteps=NSTEPS, mode="zipkern"),
        grid=(NSTEPS,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2 * KB, 128), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NSTEPS * 2 * KB, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, 2, KB + HP + HPAD, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((2, 2))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(d_re, d_im, TI3, W4I)
    zk = np.asarray(zk)                       # interleaved rows re/im lanes
    z = zk.reshape(ROWS, 64, 2)
    zc = z[..., 0] + 1j * z[..., 1]
    rel = np.abs(zc - ref).max() / max(np.abs(ref).max(), 1e-30)
    print(f"parity zipkern vs shipped: rel {rel:.2e}", flush=True)


def run(name, fn, *a):
    try:
        dt = rep_differenced(fn, *a, max_r_hi=64)
        print(f"{name:26s} {dt * 1e3:8.3f} ms  {N / dt / 1e9:7.2f} GS/s  "
              f"spread {dt.spread_pct:.1f}%", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name:26s} FAILED: {type(e).__name__}: {e}", flush=True)


ALL = ["dma", "yt", "fold", "fold2", "mm-hst", "kern", "kern2", "ship",
       "planes", "flat", "flat2"]
want = sys.argv[1:] or ALL
for mode in want:
    if mode == "parity":
        try:
            parity_check()
        except Exception as e:  # noqa: BLE001
            print(f"parity FAILED: {type(e).__name__}: {e}", flush=True)
    elif mode == "ship":
        run("ship (wola_fused_planes2)", step_ship, d_xre, d_xim)
    elif mode == "planes":
        run("planes (rows,64 surface)", step_planes, d_fre, d_fim)
    elif mode == "flat":
        run("flat (heavy harness)", step_flat, d_fre, d_fim)
    elif mode == "flat2":
        run("flat2 (official bench)", step_flat2, d_fre, d_fim)
    elif mode in ("zip", "zipkern"):
        run(f"zip:{mode}", functools.partial(step_zip, mode=mode),
            d_re, d_im)
    else:
        run(mode, functools.partial(step_pair, mode=mode), d_re, d_im)
