"""Pallas fused polyphase upfirdn: window construction stays in VMEM.

Reference semantics: scipy-compatible upfirdn (custom_kernels/upfirdn.cu:69
stages taps+input through CUDA shared memory). The XLA path
(ops/filters._upfirdn_poly_planes) is matmul-bound at the f32 rate but pays a
full HBM pass materializing the (blocks, W) window matrix; measured on v5e,
that build is ~0.4 ms of a 0.98 ms 4M-sample op.

Key identity: with gp = 128 phase periods per output block, the block stride
is R = 128*S input samples — itself a multiple of 128 lanes — so viewing the
padded input as rows of R samples makes block b's window exactly rows
b..b+r-1. No im2col is ever built: the kernel DMAs Bt+r-1 consecutive rows
per grid step and runs r MXU dots against row-aligned K parts,

    out[b, c] = sum_j A_j[b, :w_j] @ K[j*R : j*R + w_j, c],  A_j = rows b+j.

Outputs are (2, nsteps, Bt, cols) float planes with cols = 128*P, so the
final time-major flatten is a free contiguous reshape (cols % 128 == 0 — the
lane-alignment discipline from round 2).

Precision: f32 with Precision.HIGHEST dots — parity-grade like the XLA path
(HIGH measured 100x worse error; see benchmarks/exp_fir_breakdown.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

_GP = 128          # phase periods per output block (fixes cols = 128*P)
_BT = 128          # output blocks per grid step (MXU row dimension)


def upfirdn_geometry(up: int, down: int):
    """(P, S, cols, R) for the gp=128 block form."""
    g = math.gcd(up, down)
    P = up // g
    S = down // g
    return P, S, _GP * P, _GP * S


def upfirdn_pallas_viable(n_out: int, taps_len: int, up: int, down: int,
                          max_r: int = 4) -> bool:
    P, S, cols, R = upfirdn_geometry(up, down)
    Lh = -(-taps_len // up)
    W = (_GP - 1) * S + Lh + ((P - 1) * down) // up
    if W > max_r * R:
        return False            # taps much longer than a block stride
    if n_out < 2 * _BT * cols:
        return False            # too small to amortize; XLA path is fine
    if cols > 4096 or R > 4096:
        return False            # VMEM budget (K parts + scratch + acc)
    return True


def _band_matrix(taps_r: np.ndarray | jnp.ndarray, up: int, down: int):
    """The (W, cols) banded tap matrix of the gp=128 block form (same math
    as ops/filters._upfirdn_poly_planes, fixed gp).

    Concrete numpy taps build entirely on the HOST (round 5): traced-
    constant taps made the band build + K splits re-run inside every pjit
    call of a rep loop (XLA does not hoist across pjit boundaries) —
    numpy tables embed as program constants instead."""
    P, S, cols, R = upfirdn_geometry(up, down)
    T = taps_r.shape[-1]
    Lh = -(-T // up)
    if isinstance(taps_r, np.ndarray):
        hpad = np.pad(taps_r.astype(np.float32), (0, Lh * up - T))
        Hp = hpad.reshape(Lh, up).T
        c = np.arange(P)
        p_c = (c * down) % up
        qc_c = (c * down) // up
        Lw = Lh + int(qc_c[-1])
        W = (_GP - 1) * S + Lw
        t_full = np.arange(W)[:, None]
        col_full = np.arange(cols)[None, :]
        gi_f = col_full // P
        ci_f = col_full % P
        l_f = (gi_f * S + qc_c[ci_f] + Lh - 1) - t_full
        valid = (l_f >= 0) & (l_f < Lh)
        Kj = np.where(valid, Hp[p_c[ci_f], np.clip(l_f, 0, Lh - 1)],
                      np.float32(0.0))
        return Kj.astype(np.float32), Lh, W
    # pad, not .at[].set: a scatter on TRACED taps (perturbed-tap reps,
    # nested jits) costs ~1 ms/call at runtime; pad is free either way
    hpad = jnp.pad(taps_r, (0, Lh * up - T))
    Hp = hpad.reshape(Lh, up).T               # Hp[p, l] = h[p + l*up]
    c = np.arange(P)
    p_c = (c * down) % up
    qc_c = (c * down) // up
    Lw = Lh + int(qc_c[-1])
    W = (_GP - 1) * S + Lw
    t_full = np.arange(W)[:, None]
    col_full = np.arange(cols)[None, :]
    gi_f = col_full // P
    ci_f = col_full % P
    l_f = (gi_f * S + qc_c[ci_f] + Lh - 1) - t_full
    valid = (l_f >= 0) & (l_f < Lh)
    Kj = jnp.where(jnp.asarray(valid),
                   Hp[jnp.asarray(p_c[ci_f]),
                      jnp.asarray(np.clip(l_f, 0, Lh - 1))], 0)
    return Kj, Lh, W


def _kernel(xre_hbm, xim_hbm, *rest, r: int, bt: int, R: int, cols: int,
            widths, prec: str = "highest"):
    """rest = K part refs (r of them; 2r hi/lo pairs for bf16x3), out ref,
    double-buffered scratch (2 slots), DMA semaphore pairs.

    The two quadrature planes arrive as SEPARATE HBM refs (round 5): the
    caller feeds pure reshape views of its flat planes, so the former
    jnp.stack([re, im]) materialization (a full 32 MB round trip at the
    4M geometry) never happens — the same per-plane-operand lesson as
    ops/pallas/wola_fused.

    The input tile DMA is double-buffered: step g waits on its own slot and
    prefetches step g+1's tile into the other slot before computing, so HBM
    reads overlap the MXU dots (a serial start->wait per step measured
    0.65 ms of DMA stall for the whole 4M op — more than the matmuls).

    prec="bf16x3": each f32 dot runs as THREE DEFAULT-precision bf16 passes
    with explicit hi/lo splits — a_hi@K_hi + a_hi@K_lo + a_lo@K_hi (the
    dropped lo@lo term is ~2^-16 relative) — because Mosaic does not lower
    Precision.HIGH. The constant K side is split exactly at trace time.
    Half the MXU passes of HIGHEST at ~1e-6-grade accuracy."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nk = 2 * r if prec == "bf16x3" else r
    kparts = rest[:nk]
    out = rest[nk]
    scratch = rest[nk + 1]         # (2, 2, rows, R): [slot, plane, rows, R]
    sems = rest[nk + 2]            # (2, 2) DMA semaphores [slot, plane]
    planes_hbm = (xre_hbm, xim_hbm)

    gi = pl.program_id(0)
    nsteps = pl.num_programs(0)
    # HBM DMA row slices must be 8-sublane aligned: round bt + r - 1 up
    rows = bt + (-(-(r - 1) // 8)) * 8

    def tile_copies(step, slot):
        return [pltpu.make_async_copy(
            planes_hbm[p].at[pl.ds(step * bt, rows), :],
            scratch.at[slot, p], sems.at[slot, p]) for p in range(2)]

    two = jnp.asarray(2, gi.dtype)
    slot = jax.lax.rem(gi, two)
    nslot = jax.lax.rem(gi + 1, two)

    @pl.when(gi == 0)
    def _():
        for c in tile_copies(gi, slot):
            c.start()

    @pl.when(gi + 1 < nsteps)
    def _():
        for c in tile_copies(gi + 1, nslot):
            c.start()

    for c in tile_copies(gi, slot):
        c.wait()

    if prec == "bf16x3":
        dot = functools.partial(
            jax.lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        for p in range(2):
            acc = jnp.zeros((bt, cols), jnp.float32)
            for j in range(r):
                wj = widths[j]
                a = scratch[slot, p, pl.ds(j, bt), :][:, :wj]
                # hi part by explicit mantissa TRUNCATION (bitmask): the
                # arithmetic form a - f32(bf16(a)) measured zero on real
                # Mosaic (folded as an exact round-trip — hw_parity caught
                # 1.46e-3, single-pass grade); the bitwise split cannot be
                # simplified away. Truncated hi is bf16-exact by
                # construction; lo carries the next 16 mantissa bits.
                au = jax.lax.bitcast_convert_type(a, jnp.uint32)
                a_hi_f = jax.lax.bitcast_convert_type(
                    au & jnp.uint32(0xFFFF0000), jnp.float32)
                a_hi = a_hi_f.astype(jnp.bfloat16)
                a_lo = (a - a_hi_f).astype(jnp.bfloat16)
                k_hi = kparts[2 * j][...]
                k_lo = kparts[2 * j + 1][...]
                acc = acc + (dot(a_hi, k_hi) + dot(a_hi, k_lo)) \
                    + dot(a_lo, k_hi)
            out[p, 0] = acc
        return

    dot = functools.partial(
        jax.lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision={"highest": jax.lax.Precision.HIGHEST,
                   "default": jax.lax.Precision.DEFAULT}[prec])

    for p in range(2):
        acc = jnp.zeros((bt, cols), jnp.float32)
        for j in range(r):
            wj = widths[j]
            a = scratch[slot, p, pl.ds(j, bt), :][:, :wj]
            acc = acc + dot(a, kparts[j][...])
        out[p, 0] = acc


def _kernel_nopad(head_re, head_im, xre_hbm, xim_hbm, tail_re, tail_im,
                  *rest, r: int, bt: int, R: int, cols: int, widths,
                  left: int, prec: str = "highest"):
    """Pad-free variant (round 5): the wrapper never copies the 16 MB
    planes. Sources per plane:

      * head (bt+16, R): tiny wrapper-built array for step 0 — 8 zero rows
        then the raw first rows (the zero filter history),
      * body: the RAW (nrows0, R) reshape view; step g copies rows
        [g*bt - 8, g*bt - 8 + bt + 16) — start and count 8-aligned,
      * tail (bt+16, R): tiny wrapper-built array for the LAST step, with
        the input's trailing rows zero-extended.

    The ``left``-element zero-history lane offset (formerly a front pad of
    the whole plane) is applied in-kernel: with z = roll(tile, left) the
    padded-layout row i is where(lane < left, z[i-1], z[i]) — the same
    companion-select as ops/pallas/wola_fused. Row i of the old padded
    layout sits at local index 8 + i - g*bt.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nk = 2 * r if prec == "bf16x3" else r
    kparts = rest[:nk]
    out = rest[nk]
    scratch = rest[nk + 1]         # (2, 2, bt+16, R)
    sems = rest[nk + 2]            # (2, 2)
    body = (xre_hbm, xim_hbm)
    head = (head_re, head_im)
    tail = (tail_re, tail_im)

    gi = pl.program_id(0)
    nsteps = pl.num_programs(0)
    rows = bt + 16

    def body_copies(step, slot):
        return [pltpu.make_async_copy(
            body[p].at[pl.ds(step * bt - 8, rows), :],
            scratch.at[slot, p], sems.at[slot, p]) for p in range(2)]

    def edge_copies(src, slot):
        return [pltpu.make_async_copy(
            src[p].at[pl.ds(0, rows), :],
            scratch.at[slot, p], sems.at[slot, p]) for p in range(2)]

    def start_for(step, slot):
        if nsteps == 1:
            # single-step: head already carries the zero tail (wrapper)
            for c in edge_copies(head, slot):
                c.start()
            return
        @pl.when(step == 0)
        def _():
            for c in edge_copies(head, slot):
                c.start()

        @pl.when((step > 0) & (step < nsteps - 1))
        def _():
            for c in body_copies(step, slot):
                c.start()

        @pl.when(step == nsteps - 1)
        def _():
            for c in edge_copies(tail, slot):
                c.start()

    two = jnp.asarray(2, gi.dtype)
    slot = jax.lax.rem(gi, two)
    nslot = jax.lax.rem(gi + 1, two)

    @pl.when(gi == 0)
    def _():
        start_for(gi, slot)

    @pl.when(gi + 1 < nsteps)
    def _():
        start_for(gi + 1, nslot)

    for p in range(2):
        pltpu.make_async_copy(scratch.at[slot, p], scratch.at[slot, p],
                              sems.at[slot, p]).wait()

    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, R), 1)

    def xt_plane(p):
        z = pltpu.roll(scratch[slot, p], left, 1)
        zprev = jnp.concatenate([z[:1], z[:-1]], axis=0)
        return jnp.where(lane < left, zprev, z)

    if prec == "bf16x3":
        dot = functools.partial(
            jax.lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        for p in range(2):
            xt = xt_plane(p)
            acc = jnp.zeros((bt, cols), jnp.float32)
            for j in range(r):
                wj = widths[j]
                a = xt[8 + j: 8 + j + bt, :wj]
                au = jax.lax.bitcast_convert_type(a, jnp.uint32)
                a_hi_f = jax.lax.bitcast_convert_type(
                    au & jnp.uint32(0xFFFF0000), jnp.float32)
                a_hi = a_hi_f.astype(jnp.bfloat16)
                a_lo = (a - a_hi_f).astype(jnp.bfloat16)
                acc = acc + (dot(a_hi, kparts[2 * j][...])
                             + dot(a_hi, kparts[2 * j + 1][...])) \
                    + dot(a_lo, kparts[2 * j][...])
            out[p, 0] = acc
        return

    dot = functools.partial(
        jax.lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision={"highest": jax.lax.Precision.HIGHEST,
                   "default": jax.lax.Precision.DEFAULT}[prec])

    for p in range(2):
        xt = xt_plane(p)
        acc = jnp.zeros((bt, cols), jnp.float32)
        for j in range(r):
            wj = widths[j]
            a = xt[8 + j: 8 + j + bt, :wj]
            acc = acc + dot(a, kparts[j][...])
        out[p, 0] = acc


def _upfirdn_pallas_planes2(re: jnp.ndarray, im: jnp.ndarray,
                            taps_r: jnp.ndarray, up: int, down: int,
                            n_out: int, interpret: bool = False,
                            bt: int = _BT, prec: str = "highest"
                            ) -> jnp.ndarray:
    """re/im: (n,) float32 quadrature planes, handled as SEPARATE kernel
    operands (no stacked (2, n) intermediate is ever materialized — the
    stack cost a full 32 MB round trip at the 4M geometry). Returns
    (2, n_out) float32 (scipy upfirdn of each plane with real taps)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P, S, cols, R = upfirdn_geometry(up, down)
    Kj, Lh, W = _band_matrix(taps_r.astype(jnp.float32), up, down)
    r = -(-W // R)
    # K parts: rows [j*R : j*R + w_j], lane-padded to 128 multiples;
    # bf16x3 passes exact hi/lo split pairs instead. Numpy band matrices
    # (concrete taps) keep the parts numpy so they embed as program
    # constants — zero per-call tap work.
    host = isinstance(Kj, np.ndarray)
    xp = np if host else jnp
    if host:
        import ml_dtypes
        bf16 = np.dtype(ml_dtypes.bfloat16)
    widths, kparts = [], []
    for j in range(r):
        wj = min(R, W - j * R)
        wjp = -(-wj // 128) * 128
        kp = xp.pad(Kj[j * R: j * R + wj], ((0, wjp - wj), (0, 0)))
        widths.append(wjp)
        if prec == "bf16x3":
            k_hi = kp.astype(bf16 if host else jnp.bfloat16)
            k_lo = (kp - k_hi.astype(np.float32 if host else jnp.float32)
                    ).astype(bf16 if host else jnp.bfloat16)
            kparts.extend([k_hi, k_lo])
        else:
            kparts.append(kp)

    nb = -(-n_out // cols)
    nsteps = -(-nb // bt)
    extra = (-(-(r - 1) // 8)) * 8
    left = Lh - 1
    n_in = int(re.shape[-1])
    nrows0 = n_in // R

    # pad-free fast path (round 5): the body streams from the RAW reshape
    # view; step 0 / last step read tiny wrapper-built head/tail arrays and
    # the `left` zero-history offset is a static in-kernel lane roll — the
    # former whole-plane front pad cost a 66 MB round trip at 4M.
    if (n_in % R == 0 and nsteps >= 2 and r <= 9 and left < R
            and nrows0 >= (nsteps - 1) * bt + 8):
        def raws(p):
            return p.astype(jnp.float32).reshape(nrows0, R)

        def head_of(p2):
            return jnp.concatenate(
                [jnp.zeros((8, R), jnp.float32), p2[: bt + 8]], axis=0)

        def tail_of(p2):
            tl0 = (nsteps - 1) * bt - 8
            avail = min(nrows0 - tl0, bt + 16)
            return jnp.concatenate(
                [p2[tl0: tl0 + avail],
                 jnp.zeros((bt + 16 - avail, R), jnp.float32)], axis=0)

        x_re = raws(re)
        x_im = raws(im)
        out = pl.pallas_call(
            functools.partial(_kernel_nopad, r=r, bt=bt, R=R, cols=cols,
                              widths=tuple(widths), left=left, prec=prec),
            grid=(nsteps,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 6
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(kparts),
            out_specs=pl.BlockSpec((2, 1, bt, cols),
                                   lambda g: (0, g, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2, nsteps, bt, cols),
                                           jnp.float32),
            scratch_shapes=[pltpu.VMEM((2, 2, bt + 16, R), jnp.float32),
                            pltpu.SemaphoreType.DMA((2, 2))],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=2 * nsteps * 2 * bt * sum(widths) * cols,
                transcendentals=0,
                bytes_accessed=8 * x_re.size
                + 4 * 2 * nsteps * bt * cols),
            interpret=interpret,
        )(head_of(x_re), head_of(x_im), x_re, x_im, tail_of(x_re),
          tail_of(x_im), *kparts)
        return out.reshape(2, -1)[:, :n_out]

    # general path: whole-plane front/back pad + padded row view
    nrows = nsteps * bt + extra
    need = nrows * R

    def prep(p):
        p = p.astype(jnp.float32)
        p = jnp.pad(p, (left, max(0, need - p.shape[-1] - left)))
        return p[:need].reshape(nrows, R)

    x_re = prep(re)
    x_im = prep(im)

    out = pl.pallas_call(
        functools.partial(_kernel, r=r, bt=bt, R=R, cols=cols,
                          widths=tuple(widths), prec=prec),
        grid=(nsteps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(kparts),
        out_specs=pl.BlockSpec((2, 1, bt, cols), lambda g: (0, g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, nsteps, bt, cols), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, 2, bt + extra, R), jnp.float32),
                        pltpu.SemaphoreType.DMA((2, 2))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * nsteps * 2 * bt * sum(widths) * cols,
            transcendentals=0,
            bytes_accessed=8 * x_re.size + 4 * 2 * nsteps * bt * cols),
        interpret=interpret,
    )(x_re, x_im, *kparts)
    return out.reshape(2, -1)[:, :n_out]


def _upfirdn_pallas_planes(planes: jnp.ndarray, taps_r: jnp.ndarray,
                           up: int, down: int, n_out: int,
                           interpret: bool = False,
                           bt: int = _BT, prec: str = "highest"
                           ) -> jnp.ndarray:
    """(2, n)-stacked convenience wrapper over _upfirdn_pallas_planes2."""
    return _upfirdn_pallas_planes2(planes[0], planes[1], taps_r, up, down,
                                   n_out, interpret=interpret, bt=bt,
                                   prec=prec)
