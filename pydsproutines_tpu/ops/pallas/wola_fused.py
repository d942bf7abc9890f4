"""Fully-fused WOLA channelizer Pallas kernel (N == Dec path).

Reference semantics: the threaded WOLA C DLL fold+IFFT
(/root/reference/multiChannelWola.c:79-101) — here fused into ONE kernel so
the 8M-sample channelize is a single HBM read + single HBM write.

Design (v5e, N == 64): the kernel works in PAIR-ROW plane layout. Each f32
plane of xq = x.reshape(rows, 64) is VIEWED as (rows/2, 128) — lane
64*p + c of pair row t is xq[2t + p, c]. That view is a pure reshape (no
data movement), which is the whole point: two earlier layouts lost more time
converting than the kernel takes to run —

* re/im-INTERLEAVED lanes via jnp.stack(..., axis=-1): the minor-dim-2
  relayout cost ~1.2 ms/8M on v5e, 2x the entire kernel
  (benchmarks/exp_wola_anatomy.py: kernel alone 0.58 ms, public path 1.79).
* plane-CONCAT lanes with (rows, 64) plane DMAs: Mosaic cannot DMA 64-lane
  HBM slices (tpu.memref_slice to ...x64xf32 fails to infer).

Per kb-row grid step (pair rows):

1. DMA pair rows [g*kb - B/2, g*kb + kb) of both planes — one descriptor
   PER PLANE with its own semaphore (double-buffered; step 0 zeroes the
   B/2-row history instead — x is implicitly zero before index 0).
2. Polyphase fold on the VPU, split by tap parity. Even taps s = 2u touch
   the same pair row at shift u: B/2+1 sublane-shifted FMAs against the
   lane-duplicated even tap table. Odd taps s = 2u+1 cross row parity:
   they read the companion tile yt = select(lane < 64, zt[j-1], zt[j]) with
   zt = roll(xt, 64 lanes), built ONCE per tile (3 VPU passes), then fold
   exactly like the even half. Both folds use the aligned (r, q) regrouping
   (q-slices 8-sublane-aligned; only 8 final accumulate-adds are shifted) —
   the naive unaligned fold measured ~2x the FMA floor. Tap tables carry the
   xq-column-order taps (the a <-> (N-a)%N phase permutation is absorbed
   downstream, exactly as ops/wola._wola_fold_matmul), with the c == 0
   column's one-row alignment offset folded into the shift index.
3. IDFT as ONE real (kb, 256) @ (256, 256) MXU matmul: G = [g_re | g_im]
   pair-layout planes, and WW = [[D(Wr), D(Wi)], [-D(Wi), D(Wr)]] where
   D(A) = blockdiag(A, A) applies the row-permuted conjugate 64-point DFT
   to each row of the pair and the outer 2x2 does the complex arithmetic.
   Output is [out_re | out_im], still pair-layout — every reshape back to
   (rows, 64) planes is free.

Measured HBM traffic is the 2-pass minimum; the fold (VPU) and IDFT (MXU)
overlap the DMA stream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _idft_pair_block(n: int) -> np.ndarray:
    """(4n, 4n) f32 for the pair layout: WW = [[D(Wr), D(Wi)],
    [-D(Wi), D(Wr)]], D(A) = blockdiag(A, A), W = row-permuted conj-DFT."""
    k = np.arange(n, dtype=np.float64)
    wconj = np.exp(2j * np.pi * np.mod(np.outer(k, k), n) / n)
    perm = (-np.arange(n)) % n                       # xq column c -> phase a
    Wp = wconj[perm]

    def D(a):
        z = np.zeros((2 * n, 2 * n), np.float32)
        z[:n, :n] = a
        z[n:, n:] = a
        return z

    return np.block([[D(Wp.real), D(Wp.imag)],
                     [-D(Wp.imag), D(Wp.real)]])


def wola_fused_viable(n_ch: int, dec: int, taps: int, rows: int,
                      dtype) -> bool:
    if n_ch != dec:
        return False
    if n_ch == 64:
        B = taps // n_ch
        if B % 16 != 0 or B > 256:
            return False                             # even/odd split + align
    elif n_ch in (128, 256):
        # plane-direct layout (round 5): xq rows are already >= 128 lanes,
        # so no pair trick — straight sublane-shifted FMAs + one (2n, 2n)
        # IDFT matmul (ROADMAP round-3 lead #3)
        B = taps // n_ch
        if B % 8 != 0 or B > 256:
            return False                             # aligned-fold grouping
    else:
        return False
    if rows < 2048:
        return False                                 # too small to matter
    return jnp.dtype(dtype) == jnp.complex64


def _pick_kb2(n: int, B: int) -> int:
    return 1024


def _kernel(xre_hbm, xim_hbm, t3e, t3o, ww, out, scratch, sems, *, kb: int,
            H: int, nq: int, nsteps: int):
    """kb: pair rows per step. H = B/2 history pair rows. Tile rows =
    H + kb + 8 (8 over-read rows for the aligned-fold regrouping). The two
    planes arrive as SEPARATE HBM refs so the caller never materializes a
    stacked (2, rows, n) operand (the imag plane is a pure reshape view;
    the stack cost a measured ~0.3 ms/8M)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    gi = pl.program_id(0)
    two = jnp.asarray(2, gi.dtype)
    slot = jax.lax.rem(gi, two)
    nslot = jax.lax.rem(gi + 1, two)
    planes_hbm = (xre_hbm, xim_hbm)

    def full_copies(step, slot_):
        # pair rows [step*kb - H, step*kb + kb); valid for step >= 1
        return [pltpu.make_async_copy(
            planes_hbm[p].at[pl.ds(step * kb - H, kb + H), :],
            scratch.at[slot_, p, pl.ds(0, kb + H), :], sems.at[slot_, p])
            for p in range(2)]

    def head_copies(slot_):
        # step 0: history rows are implicit zeros
        return [pltpu.make_async_copy(
            planes_hbm[p].at[pl.ds(0, kb), :],
            scratch.at[slot_, p, pl.ds(H, kb), :], sems.at[slot_, p])
            for p in range(2)]

    @pl.when(gi == 0)
    def _():
        scratch[slot, :, :H, :] = jnp.zeros((2, H, 128), jnp.float32)
        # the 8 over-read rows are never DMA'd: uninitialized VMEM there
        # would poison zero-tap FMAs (0 * NaN) — zero them once per slot
        scratch[0, :, kb + H:, :] = jnp.zeros((2, 8, 128), jnp.float32)
        scratch[1, :, kb + H:, :] = jnp.zeros((2, 8, 128), jnp.float32)
        for c in head_copies(slot):
            c.start()

    # nsteps is a PYTHON static: at nsteps == 1 the (kb+H)-row descriptor
    # would not even fit the operand shape at trace time, so the full-copy
    # branches must not be constructed at all
    if nsteps > 1:
        @pl.when(gi + 1 < nsteps)
        def _():
            for c in full_copies(gi + 1, nslot):
                c.start()

        # waits must mirror the started copy exactly (byte counts differ)
        @pl.when(gi > 0)
        def _():
            for c in full_copies(gi, slot):
                c.wait()

    @pl.when(gi == 0)
    def _():
        for c in head_copies(slot):
            c.wait()

    lane = jax.lax.broadcasted_iota(jnp.int32, (kb + H + 8, 128), 1)

    def fold(plane):
        """Zero-waste aligned fold: the (r, q) loop runs nq = H/8 full
        q-groups — exactly the taps u in [1, H] (even) / [1, H-1] (odd; one
        zero slot at (r=0, q=0)) — and the u == 0 taps are one H-aligned
        extra FMA pair (table row 8*nq). The previous uniform
        nq = (H+8)/8 grouping burned 48 FMA passes for 33 valid taps at
        B = 32 (measured 0.466 vs 0.370 ms/8M,
        benchmarks/exp_wola_pair_anatomy.py)."""
        xt = scratch[slot, plane]                    # (kb+H+8, 128)
        # odd-parity companion: yt[j, c] = xq[2j-1, c], yt[j, 64+c] = xq[2j, c]
        zt = pltpu.roll(xt, 64, 1)
        zprev = jnp.concatenate([zt[:1, :], zt[:-1, :]], axis=0)
        yt = jnp.where(lane < 64, zprev, zt)
        acc = xt[H: H + kb, :] * t3e[8 * nq] + yt[H: H + kb, :] * t3o[8 * nq]
        for r in range(8):
            u = xt[0: kb + 8, :] * t3e[r * nq] + yt[0: kb + 8, :] * t3o[r * nq]
            for q in range(1, nq):
                u = u + xt[8 * q: 8 * q + kb + 8, :] * t3e[r * nq + q] \
                      + yt[8 * q: 8 * q + kb + 8, :] * t3o[r * nq + q]
            acc = acc + u[r: r + kb, :]
        return acc

    g = jnp.concatenate([fold(0), fold(1)], axis=-1)  # (kb, 256)
    res = jax.lax.dot_general(
        g, ww[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    out[0, 0] = res[:, :128]
    out[1, 0] = res[:, 128:]


def _fold_tables(f_tap, n: int, B: int):
    """Pair-layout aligned-fold tap tables t3e/t3o: (8*nq + 1, 128).

    Rows r*nq + q (q in [0, nq), nq = H/8) hold tap sub-index
    u = H - 8q - r in [1, H] — zero waste: every (r, q) slot is a valid
    tap except odd (r=0, q=0) — and the final row 8*nq holds the u == 0
    taps, applied by the kernel as one H-aligned extra FMA pair.
    t3e covers even taps s = 2u, t3o odd taps s = 2u + 1 read through the
    yt companion tile."""
    taps = f_tap.shape[-1]
    h = jnp.real(f_tap).astype(jnp.float32)
    # base table T[s, c]: g[k, c] = sum_s T[s, c] * xq[k - s, c] with
    #   T[s, 0] = h[s*n] (s < B);  T[s, c>0] = h[(s-1)*n + n - c] (s >= 1)
    # — xq-column order (phase permutation absorbed by the IDFT row perm),
    # the c == 0 one-row alignment offset folded into the shift index. Built
    # with a static-index gather so traced taps also work.
    s_i = np.arange(B + 1)[:, None]
    c_i = np.arange(n)[None, :]
    idx0 = np.clip(s_i * n, 0, taps - 1)
    idxc = np.clip((s_i - 1) * n + (n - c_i), 0, taps - 1)
    valid = np.where(c_i == 0, s_i < B, s_i >= 1)
    tap_idx = np.where(c_i == 0, idx0, idxc)
    T = jnp.where(jnp.asarray(valid), h[jnp.asarray(tap_idx)], 0.0)

    H = B // 2
    nq = H // 8                                      # H % 8 == 0 (B % 16)
    # u_r[t'] = sum_q t3[r*nq+q] * tile[t' + 8q]; acc[t] = sum_r u_r[t + r]
    # reads tile row H + t - u  =>  tap sub-index u = H - 8q - r, plus one
    # H-aligned extra row for u = 0
    u_i = H - 8 * np.tile(np.arange(nq), 8) - np.repeat(np.arange(8), nq)
    u_i = np.concatenate([u_i, [0]])
    ve = (u_i >= 0) & (u_i <= H)                     # even taps s = 2u
    vo = (u_i >= 0) & (u_i <= H - 1)                 # odd taps s = 2u + 1
    se = np.clip(2 * u_i, 0, B)
    so = np.clip(2 * u_i + 1, 0, B)
    t3e = jnp.where(jnp.asarray(ve)[:, None], T[jnp.asarray(se)], 0.0)
    t3o = jnp.where(jnp.asarray(vo)[:, None], T[jnp.asarray(so)], 0.0)
    # duplicate across the two pair-row lane halves
    t3e = jnp.concatenate([t3e, t3e], axis=1)
    t3o = jnp.concatenate([t3o, t3o], axis=1)
    return t3e, t3o, H, nq


def _check_geometry(dec: int, n: int):
    if n != dec or n not in (64, 128, 256):
        raise ValueError(
            f"wola_fused supports only critically-sampled n == dec with "
            f"n in (64, 128, 256) (got n={n}, dec={dec}); use "
            f"ops.wola.wola() — its banded-matmul path handles every "
            f"geometry, and the dispatcher (ops/wola.py) routes to this "
            f"kernel automatically when viable.")


# -- plane-direct variant (n in {128, 256}) -----------------------------------
# xq rows are already >= 128 lanes, so each (rows, n) f32 plane is natively
# tiled: the fold is straight sublane-shifted FMAs (no parity split, no
# companion tile) and the IDFT one (kb, 2n) @ (2n, 2n) matmul of
# [g_re | g_im] against [[Wr, Wi], [-Wi, Wr]].

def _idft_direct_block(n: int) -> np.ndarray:
    k = np.arange(n, dtype=np.float64)
    wconj = np.exp(2j * np.pi * np.mod(np.outer(k, k), n) / n)
    perm = (-np.arange(n)) % n                       # xq column c -> phase a
    Wp = wconj[perm]
    return np.block([[Wp.real.astype(np.float32),
                      Wp.imag.astype(np.float32)],
                     [-Wp.imag.astype(np.float32),
                      Wp.real.astype(np.float32)]])


def _fold_tables_direct(f_tap, n: int, B: int):
    """Direct-layout aligned-fold tap table t3: (8*nq + 1, n) with
    nq = B/8. Slot (r, q) holds tap u = B - 8q - r (all 8*nq slots are
    valid u in [1, B] — zero waste) and row 8*nq holds u == 0, applied as
    one B-aligned extra FMA. Same base table T as the pair variant
    (xq-column order, phase permutation absorbed by the IDFT row perm)."""
    taps = f_tap.shape[-1]
    h = jnp.real(f_tap).astype(jnp.float32)
    s_i = np.arange(B + 1)[:, None]
    c_i = np.arange(n)[None, :]
    idx0 = np.clip(s_i * n, 0, taps - 1)
    idxc = np.clip((s_i - 1) * n + (n - c_i), 0, taps - 1)
    valid = np.where(c_i == 0, s_i < B, s_i >= 1)
    tap_idx = np.where(c_i == 0, idx0, idxc)
    T = jnp.where(jnp.asarray(valid), h[jnp.asarray(tap_idx)], 0.0)
    nq = B // 8
    u_i = B - 8 * np.tile(np.arange(nq), 8) - np.repeat(np.arange(8), nq)
    u_i = np.concatenate([u_i, [0]])
    t3 = T[jnp.asarray(np.clip(u_i, 0, B))]
    return t3, nq


def _kernel_direct(xre_hbm, xim_hbm, t3, ww, out, scratch, sems, *, kb: int,
                   B: int, nq: int, n: int, nsteps: int):
    """Plane-direct fused fold+IDFT. Tile rows = B + kb + 8 (8 over-read
    rows for the aligned-fold regrouping); history = B rows."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    gi = pl.program_id(0)
    two = jnp.asarray(2, gi.dtype)
    slot = jax.lax.rem(gi, two)
    nslot = jax.lax.rem(gi + 1, two)
    planes_hbm = (xre_hbm, xim_hbm)

    def full_copies(step, slot_):
        return [pltpu.make_async_copy(
            planes_hbm[p].at[pl.ds(step * kb - B, kb + B), :],
            scratch.at[slot_, p, pl.ds(0, kb + B), :], sems.at[slot_, p])
            for p in range(2)]

    def head_copies(slot_):
        return [pltpu.make_async_copy(
            planes_hbm[p].at[pl.ds(0, kb), :],
            scratch.at[slot_, p, pl.ds(B, kb), :], sems.at[slot_, p])
            for p in range(2)]

    @pl.when(gi == 0)
    def _():
        scratch[slot, :, :B, :] = jnp.zeros((2, B, n), jnp.float32)
        scratch[0, :, kb + B:, :] = jnp.zeros((2, 8, n), jnp.float32)
        scratch[1, :, kb + B:, :] = jnp.zeros((2, 8, n), jnp.float32)
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

    def fold(plane):
        xt = scratch[slot, plane]                    # (kb+B+8, n)
        acc = xt[B: B + kb, :] * t3[8 * nq]
        for r in range(8):
            u = xt[0: kb + 8, :] * t3[r * nq]
            for q in range(1, nq):
                u = u + xt[8 * q: 8 * q + kb + 8, :] * t3[r * nq + q]
            acc = acc + u[r: r + kb, :]
        return acc

    g = jnp.concatenate([fold(0), fold(1)], axis=-1)  # (kb, 2n)
    res = jax.lax.dot_general(
        g, ww[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    out[0, 0] = res[:, :n]
    out[1, 0] = res[:, n:]


def _run_fused_direct(f_tap, pre, pim, n: int, B: int, nsteps: int, kb: int,
                      interpret: bool):
    """Invoke the direct kernel on (nsteps*kb, n) row planes; returns the
    raw (2, nsteps, kb, n) output."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t3, nq = _fold_tables_direct(f_tap, n, B)
    ww = jnp.asarray(_idft_direct_block(n))          # (2n, 2n)
    return pl.pallas_call(
        functools.partial(_kernel_direct, kb=kb, B=B, nq=nq, n=n,
                          nsteps=nsteps),
        grid=(nsteps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2, 1, kb, n), lambda g: (0, g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, nsteps, kb, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, 2, kb + B + 8, n), jnp.float32),
                        pltpu.SemaphoreType.DMA((2, 2))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * nsteps * kb * 2 * n * 2 * n
            + 4 * nsteps * kb * n * (B + 1),
            transcendentals=0,
            bytes_accessed=4 * 4 * nsteps * kb * n),
        interpret=interpret,
    )(pre, pim, t3, ww)


def _run_fused(f_tap, pre, pim, n: int, B: int, nsteps: int, kb: int,
               interpret: bool):
    """Invoke the fused kernel on prepared (nsteps*kb, 2n) pair planes;
    returns the raw (2, nsteps, kb, 2n) output."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t3e, t3o, H, nq = _fold_tables(f_tap, n, B)
    ww = jnp.asarray(_idft_pair_block(n))            # (256, 256)
    return pl.pallas_call(
        functools.partial(_kernel, kb=kb, H=H, nq=nq, nsteps=nsteps),
        grid=(nsteps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2, 1, kb, 2 * n), lambda g: (0, g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, nsteps, kb, 2 * n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, 2, kb + H + 8, 2 * n), jnp.float32),
                        pltpu.SemaphoreType.DMA((2, 2))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * nsteps * kb * 4 * n * 4 * n
            + 4 * nsteps * kb * 2 * n * (B + 1),
            transcendentals=0,
            bytes_accessed=4 * 4 * nsteps * kb * 2 * n),
        interpret=interpret,
    )(pre, pim, t3e, t3o, ww)


@functools.partial(jax.jit, static_argnames=("dec", "n", "interpret"))
def wola_fused_planes2(f_tap: jnp.ndarray, re: jnp.ndarray, im: jnp.ndarray,
                       dec: int, n: int,
                       interpret: bool = False) -> tuple:
    """Fused-channelizer core: ``re``/``im`` are (rows, n) float32 planes of
    xq = x.reshape(rows, n); returns (out_re, out_im) planes, each (rows, n)
    float32 (identical numbers to ops.wola.wola()). Keeping the planes as
    separate operands lets XLA feed pure reshape views straight into the
    kernel — no stacked intermediate is ever materialized. NOTE: on TPU a
    (rows, 64) array is lane-padded to 128, so this entry still pays a
    relayout each way (~0.4 ms/8M total); hot paths should use
    wola_fused_planes_flat, whose flat-plane I/O is physically identical to
    the kernel's pair-row tiling (zero-cost prologue AND epilogue)."""
    _check_geometry(dec, n)
    B = f_tap.shape[-1] // n
    rows = re.shape[0]
    kb = _pick_kb2(n, B)
    if n >= 128:
        # plane-direct: (rows, n) IS the kernel's native tiling
        nsteps = -(-rows // kb)
        pad = nsteps * kb - rows

        def prep(p):
            p = p.astype(jnp.float32)
            if pad:
                p = jnp.pad(p, ((0, pad), (0, 0)))
            return p

        out = _run_fused_direct(f_tap, prep(re), prep(im), n, B, nsteps,
                                kb, interpret)
        o = out.reshape(2, nsteps * kb, n)[:, :rows]
        return o[0], o[1]
    rows2 = -(-rows // 2)
    nsteps = -(-rows2 // kb)
    pad = nsteps * kb * 2 - rows

    def prep(p):
        p = p.astype(jnp.float32)
        if pad:
            p = jnp.pad(p, ((0, pad), (0, 0)))
        return p.reshape(nsteps * kb, 2 * n)         # pair-row view

    out = _run_fused(f_tap, prep(re), prep(im), n, B, nsteps, kb, interpret)
    o = out.reshape(2, nsteps * kb * 2, n)[:, :rows]
    return o[0], o[1]


@functools.partial(jax.jit, static_argnames=("dec", "n", "interpret"))
def wola_fused_planes_flat(f_tap: jnp.ndarray, re: jnp.ndarray,
                           im: jnp.ndarray, dec: int, n: int,
                           interpret: bool = False) -> tuple:
    """Flat-plane fused channelizer: ``re``/``im`` are 1-D float32 planes of
    the input samples; returns 1-D planes holding the row-major (rows, n)
    channel matrix (bit-identical bytes to wola_fused_planes2's outputs).

    This is the zero-relayout entry: a flat length-L f32 array is physically
    the (L/128, 128) pair-row tiling the kernel DMAs, and the kernel's
    output reshapes back to flat for free — measured ~0.4 ms/8M faster than
    the (rows, 64) plane surface on v5e, whose 64-lane minor dimension is
    padded and costs a relayout in each direction."""
    _check_geometry(dec, n)
    B = f_tap.shape[-1] // n
    rows = re.shape[-1] // dec
    kb = _pick_kb2(n, B)
    if n >= 128:
        nsteps = -(-rows // kb)
        pad_el = nsteps * kb * n - rows * n

        def prep(p):
            p = p[: rows * n].astype(jnp.float32)
            if pad_el:
                p = jnp.pad(p, (0, pad_el))
            return p.reshape(nsteps * kb, n)         # free: same bytes

        out = _run_fused_direct(f_tap, prep(re), prep(im), n, B, nsteps,
                                kb, interpret)
        o = out.reshape(2, nsteps * kb * n)[:, : rows * n]
        return o[0], o[1]
    rows2 = -(-rows // 2)
    nsteps = -(-rows2 // kb)
    pad_el = nsteps * kb * 2 * n - rows * n

    def prep(p):
        p = p[: rows * n].astype(jnp.float32)
        if pad_el:
            p = jnp.pad(p, (0, pad_el))
        return p.reshape(nsteps * kb, 2 * n)         # free: same bytes

    out = _run_fused(f_tap, prep(re), prep(im), n, B, nsteps, kb, interpret)
    o = out.reshape(2, nsteps * kb * 2 * n)[:, : rows * n]
    return o[0], o[1]


@functools.partial(jax.jit, static_argnames=("dec", "n", "interpret"))
def wola_fused_planes(f_tap: jnp.ndarray, planes: jnp.ndarray, dec: int,
                      n: int, interpret: bool = False) -> jnp.ndarray:
    """(2, rows, n) stacked-planes convenience wrapper around
    wola_fused_planes2."""
    o_re, o_im = wola_fused_planes2(f_tap, planes[0], planes[1], dec, n,
                                    interpret=interpret)
    return jnp.stack([o_re, o_im])


@functools.partial(jax.jit, static_argnames=("dec", "n", "interpret"))
def wola_fused(f_tap: jnp.ndarray, x: jnp.ndarray, dec: int, n: int,
               interpret: bool = False) -> jnp.ndarray:
    """Fused-channelizer entry: complex64 x, critically-sampled n == dec
    with n in (64, 128, 256). n == 64 runs the pair-row layout (2 channel
    rows per 128-lane vreg); n >= 128 runs the plane-direct layout (round
    5 — rows are natively lane-tiled, no pair trick). Other geometries
    raise ValueError — call ops.wola.wola(), whose dispatcher routes here
    automatically when viable. Returns (len(x)//dec, n) complex64
    identical to ops.wola.wola()."""
    rows = x.shape[-1] // dec
    xq = x[: rows * n].reshape(rows, n)
    o_re, o_im = wola_fused_planes2(
        f_tap, jnp.real(xq).astype(jnp.float32),
        jnp.imag(xq).astype(jnp.float32), dec, n, interpret=interpret)
    return jax.lax.complex(o_re, o_im)
