"""Fused three-stage CAF peak search for big composite windows (e.g. 10M).

Reference semantics: fastXcorr freq-scan peak search at the 10M-sample
"north star" geometry (/root/reference/xcorrRoutines.py:460,519-531;
/root/reference/benchmarks/README.md:21-23). The reference GPU path batches
window slices through cuFFT and fuses only the final abs-argmax
(custom_kernels/argmax.cu:94).

Why this kernel exists: at n ~ 1e7 the single-kernel two-factor pipeline
(ops/pallas/fused_xcorr.py) cannot fit its (n1, n1) stage matrices in VMEM
(n1 ~ 3163 -> 58 MB for one bf16 matrix triple), so rounds 1-4 ran the
multi-stage XLA "planes" formulation instead (~480 MB of HBM round trips
per shift; 8.06 Gss/s official for four rounds).

TPU-first design (round 5, v2 after on-chip anatomy): factor n = f0*f1*f2
with f2 a multiple of 128 (lane-exact tiling, no relayouts anywhere) and
process shifts in chunks of B so every expensive operand is amortized:

  * ONE dynamic_slice per B-shift chunk (the v1 per-shift slice alone
    measured 1.27 ms on v5e — more than the whole XLA pipeline; a shift-b
    window is just a b*step lane offset, handled in-kernel by pltpu.roll).
  * kernel A, grid (f1/WQ, B) with b innermost: the (f0, WQ*f2 + f2) input
    tile (WQ q1-digits + a 640-lane halo, contiguous 7.7 KB rows) is
    DMA'd ONCE per j and reused for all B shifts — total chunk input
    traffic is ~1.2 windows regardless of B (v1's per-q1 strip DMA at
    1.28 KB rows measured 0.76 ms/shift). Per step: lane-roll by b*step,
    modulate by conj(cutout), stage-1 Karatsuba matmuls, write the
    (f0, WQ*f2) result to the per-shift bf16 HBM scratch — which is laid
    out so kernel B's per-k0 reads are contiguous rows.
  * kernel B, grid (B, f0/KK): KK k0-digits per step (v1's one-k0 steps
    were grid-overhead bound). Per k0: fold the stage-1 twiddle's
    A1[k0, n1] digit into a per-k0 stage-2 matrix (VPU build — the
    twiddle matrix never exists), contract n1 (MXU), apply the combined
    A2[k0, n2]*TW2[k1, n2] twiddle (VPU), contract n2 against the
    (f2, f2) stage-3 matrix, reduce |.|^2 -> (max, argmax) in VMEM.
    Only (B, f0) scalars leave.

  Twiddle algebra (n = n0*f1*f2 + n1*f2 + n2, k = k0 + f0*k1 + f0*f1*k2):
    stage-1 twiddle W_N^{k0(n1 f2 + n2)} = A1[k0,n1] * A2[k0,n2] with
    A1[k0,n1] = exp(-2i pi k0 n1/(f0 f1)), A2[k0,n2] = exp(-2i pi k0 n2/N).
    A1 commutes into stage 2's matrix (it depends only on (k0, n1));
    A2 commutes past stage 2 (n1-independent) and merges with stage 2's
    own twiddle TW2[k1,n2] = exp(-2i pi k1 n2/(f1 f2)).

Precision: "bf16" is peak-search grade (~1e-2 spectrum rel err, same as
the planes path; fast_xcorr re-verifies the winning shift exactly in f32),
"f32" runs Precision.HIGHEST for parity tests.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

_INT_MAX = np.int32(2147483647)


def _pad128(x: int) -> int:
    return -(-x // 128) * 128


def find_triple(n: int) -> tuple[int, int, int] | None:
    """Factor n = f0*f1*f2 with f2 a lane-exact multiple of 128 in
    [128, 1024] and f0, f1 balanced in [16, 1024], minimizing the
    MXU-padded per-sample MAC cost sum(pad128(f)^2 / f). f0 and f1 must
    also admit the kernel batch groupings (f1 % WQ, f0 % KK)."""
    best = None
    best_cost = None
    for f2 in range(128, 1025, 128):
        if n % f2:
            continue
        rest = n // f2
        for f0 in range(int(math.isqrt(rest)), 15, -1):
            if rest % f0:
                continue
            f1 = rest // f0
            if f1 > 1024 or f0 < 16:
                break
            cost = (_pad128(f0) ** 2 / f0 + _pad128(f1) ** 2 / f1
                    + _pad128(f2) ** 2 / f2)
            if best_cost is None or cost < best_cost:
                best, best_cost = (f0, f1, f2), cost
            break  # most balanced split for this f2
    return best


def _group(n: int, target: int) -> int:
    """Largest divisor of n that is <= target (grid batch sizing)."""
    for g in range(min(target, n), 0, -1):
        if n % g == 0:
            return g
    return 1


def _planes(a: np.ndarray, dt) -> tuple[np.ndarray, np.ndarray]:
    return a.real.astype(dt), a.imag.astype(dt)


class Caf3Plan:
    """Host-side constants + geometry for the three-stage fused CAF."""

    def __init__(self, n: int, mode: str = "bf16"):
        self.n, self.mode = int(n), mode
        triple = find_triple(int(n))
        self.viable = triple is not None
        if not self.viable:
            return
        f0, f1, f2 = triple
        self.f0, self.f1, self.f2 = f0, f1, f2
        self.wq = _group(f1, 5)        # q1-digits per kernel-A grid step
        self.kk = _group(f0, 5)        # k0-digits per kernel-B grid step
        # max shifts per chunk: the in-kernel roll must stay inside the
        # one-f2-block halo, and the bf16 scratch (B windows) bounded
        self.halo = f2
        import ml_dtypes
        bf16 = np.dtype(ml_dtypes.bfloat16)
        wdt = bf16 if mode == "bf16" else np.float32
        self.store = wdt

        def dftmat(m):
            k = np.arange(m, dtype=np.float64)
            return np.exp(-2j * np.pi * np.mod(np.outer(k, k), m) / m)

        # stage matrices; stage-3 pre-transposed (n2, k2) for direct
        # contraction (it is symmetric, but keep the transpose explicit)
        w1 = dftmat(f0)
        w2 = dftmat(f1)
        w3t = dftmat(f2).T
        self.w1r, self.w1i = _planes(w1, wdt)
        self.w2r, self.w2i = _planes(w2, np.float32)  # per-k0 VPU build
        self.w3r, self.w3i = _planes(w3t, wdt)
        if mode == "bf16":
            self.w1s = (w1.real + w1.imag).astype(wdt)
            self.w3s = (w3t.real + w3t.imag).astype(wdt)
        else:
            self.w1s = np.zeros((1, 1), wdt)
            self.w3s = np.zeros((1, 1), wdt)
        # twiddle digit planes (f64 phase mod 2*pi, like ops/fft.py)
        k0 = np.arange(f0, dtype=np.float64)
        n1 = np.arange(f1, dtype=np.float64)
        n2 = np.arange(f2, dtype=np.float64)
        a1 = np.exp(-2j * np.pi
                    * np.mod(np.outer(k0, n1), f0 * f1) / (f0 * f1))
        a2 = np.exp(-2j * np.pi * np.mod(np.outer(k0, n2), n) / n)
        k1 = np.arange(f1, dtype=np.float64)
        tw2 = np.exp(-2j * np.pi
                     * np.mod(np.outer(k1, n2), f1 * f2) / (f1 * f2))
        # row groups shaped (f0/kk, kk, f) so kernel B's per-step blocks
        # keep Mosaic-legal last-two dims
        kk = self.kk
        self.a1r, self.a1i = (p.reshape(f0 // kk, kk, f1)
                              for p in _planes(a1, np.float32))
        self.a2r, self.a2i = (p.reshape(f0 // kk, kk, f2)
                              for p in _planes(a2, np.float32))
        self.tw2r, self.tw2i = _planes(tw2, np.float32)
        # inner flat index (k1-major over (k1, k2)); true bin reconstructed
        # by the wrapper as k0 + f0*(k1 + f1*k2)
        self.flatc = (np.arange(f1)[:, None] * f2
                      + np.arange(f2)[None, :]).astype(np.int32)


def _stage1_kernel(xr, xi, cr, ci, w1r, w1i, w1s, or_, oi_, *, step: int,
                   f2: int, wq: int, mode: str):
    """Grid (f1/wq, B), b innermost. One step: lane-roll the shared
    (f0, wq*f2 + f2) window tile by b*step, modulate, stage-1 matmul,
    write (f0, wq*f2) scratch block for shift b.

    xr/xi: (f0, wq*f2 + f2) window tile planes (same block for all b).
    cr/ci: (f0, wq*f2) template planes (pre-conjugated). w1*: (f0, f0)
    stage-1 matrix planes (+ Karatsuba sum in bf16 mode).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(1)
    w = xr.shape[1]
    cols = wq * f2
    # left-rotate by k = b*step: roll(z, W-k)[:, :cols] reads lanes
    # [k, cols+k) unwrapped since cols + k <= W. Mosaic dynamic_rotate is
    # 32-bit only, so bf16 tiles upcast first (VPU; DMA stays bf16).
    amt = jax.lax.rem(jnp.int32(w) - b * step, jnp.int32(w))
    zr = pltpu.roll(xr[...].astype(jnp.float32), amt, 1)[:, :cols]
    zi = pltpu.roll(xi[...].astype(jnp.float32), amt, 1)[:, :cols]
    pr = zr * cr[...].astype(jnp.float32) \
        - zi * ci[...].astype(jnp.float32)
    pi = zr * ci[...].astype(jnp.float32) \
        + zi * cr[...].astype(jnp.float32)
    dot = functools.partial(
        jax.lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if mode == "f32":
        dot32 = functools.partial(dot, precision=jax.lax.Precision.HIGHEST)
        or_[...] = dot32(w1r[...], pr) - dot32(w1i[...], pi)
        oi_[...] = dot32(w1r[...], pi) + dot32(w1i[...], pr)
    else:
        prb = pr.astype(jnp.bfloat16)
        pib = pi.astype(jnp.bfloat16)
        psb = (pr + pi).astype(jnp.bfloat16)
        t1 = dot(w1r[...], prb)
        t2 = dot(w1i[...], pib)
        t3 = dot(w1s[...], psb)
        or_[...] = (t1 - t2).astype(jnp.bfloat16)
        oi_[...] = (t3 - t1 - t2).astype(jnp.bfloat16)


def _stage23_kernel(sr, si, a1r, a1i, a2r, a2i, w2r, w2i, tw2r, tw2i,
                    w3r, w3i, w3s, flatc, out_max, out_idx, *, kk: int,
                    mode: str):
    """Grid (B, f0/kk). One step: kk k0-digits of shift b — fold A1 into
    per-k0 stage-2 matrices, contract n1, combined twiddle, contract n2,
    |.|^2 -> per-k0 (max, inner argmax) scalars.

    sr/si: (kk, f1, f2) scratch slices. a1*/a2*: (kk, f) twiddle digit
    rows. w2*: (f1, f1) f32 stage-2 planes. tw2*: (f1, f2). w3*: (f2, f2)
    (+ Karatsuba sum). out_*: (B, f0) SMEM.
    """
    import jax.experimental.pallas as pl

    b = pl.program_id(0)
    g = pl.program_id(1)
    dot = functools.partial(
        jax.lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dot32 = functools.partial(dot, precision=jax.lax.Precision.HIGHEST)

    for kkj in range(kk):
        ar = a1r[kkj].reshape(1, -1)
        ai = a1i[kkj].reshape(1, -1)
        w2pr = w2r[...] * ar - w2i[...] * ai
        w2pi = w2r[...] * ai + w2i[...] * ar
        srj = sr[kkj]
        sij = si[kkj]
        if mode == "f32":
            gr = dot32(w2pr, srj) - dot32(w2pi, sij)
            gi = dot32(w2pr, sij) + dot32(w2pi, srj)
        else:
            ssum = (srj.astype(jnp.float32)
                    + sij.astype(jnp.float32)).astype(jnp.bfloat16)
            t1 = dot(w2pr.astype(jnp.bfloat16), srj)
            t2 = dot(w2pi.astype(jnp.bfloat16), sij)
            t3 = dot((w2pr + w2pi).astype(jnp.bfloat16), ssum)
            gr = t1 - t2
            gi = t3 - t1 - t2

        br = a2r[kkj].reshape(1, -1)
        bi = a2i[kkj].reshape(1, -1)
        tr = tw2r[...] * br - tw2i[...] * bi
        ti = tw2r[...] * bi + tw2i[...] * br
        hr = gr * tr - gi * ti
        hi = gr * ti + gi * tr

        if mode == "f32":
            rr = dot32(hr, w3r[...]) - dot32(hi, w3i[...])
            ri = dot32(hr, w3i[...]) + dot32(hi, w3r[...])
        else:
            u1 = dot(hr.astype(jnp.bfloat16), w3r[...])
            u2 = dot(hi.astype(jnp.bfloat16), w3i[...])
            u3 = dot((hr + hi).astype(jnp.bfloat16), w3s[...])
            rr = u1 - u2
            ri = u3 - u1 - u2

        mag = rr * rr + ri * ri
        tmax = jnp.max(mag)
        tidx = jnp.min(jnp.where(mag >= tmax, flatc[...], _INT_MAX))
        out_max[b, g * kk + kkj] = tmax
        out_idx[b, g * kk + kkj] = tidx


@functools.partial(jax.jit, static_argnames=("nb", "step", "f0", "f1", "f2",
                                             "wq", "kk", "mode",
                                             "interpret"))
def _caf3_sweep_pallas(tiles_r, tiles_i, cc_r, cc_i, w1r, w1i, w1s, a1r,
                       a1i, a2r, a2i, w2r, w2i, tw2r, tw2i, w3r, w3i, w3s,
                       flatc, *, nb, step, f0, f1, f2, wq, kk, mode,
                       interpret=False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    store = jnp.bfloat16 if mode == "bf16" else jnp.float32
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    njt = f1 // wq
    cols = wq * f2
    tile = pl.BlockSpec((None, f0, cols + f2), lambda j, b: (j, 0, 0))
    ccb = pl.BlockSpec((f0, cols), lambda j, b: (0, j))
    scr_out = pl.BlockSpec((None, f0, cols), lambda j, b: (b, 0, j))
    flops1 = (6 if mode == "bf16" else 8) * nb * f1 * f0 * f0 * f2
    sr_, si_ = pl.pallas_call(
        functools.partial(_stage1_kernel, step=step, f2=f2, wq=wq,
                          mode=mode),
        grid=(njt, nb),
        in_specs=[tile, tile, ccb, ccb, const, const, const],
        out_specs=[scr_out, scr_out],
        out_shape=[jax.ShapeDtypeStruct((nb, f0, f1 * f2), store)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops1,
            bytes_accessed=2 * tiles_r.size * tiles_r.dtype.itemsize
            + 2 * nb * f0 * f1 * f2 * np.dtype(store).itemsize,
            transcendentals=0),
        interpret=interpret,
    )(tiles_r, tiles_i, cc_r, cc_i, w1r, w1i, w1s)
    sr_ = sr_.reshape(nb, f0, f1, f2)
    si_ = si_.reshape(nb, f0, f1, f2)

    scr_in = pl.BlockSpec((None, kk, f1, f2),
                          lambda b, g: (b, g, 0, 0))
    row1 = pl.BlockSpec((None, kk, f1), lambda b, g: (g, 0, 0))
    row2 = pl.BlockSpec((None, kk, f2), lambda b, g: (g, 0, 0))
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    flops2 = (6 if mode == "bf16" else 8) * nb * f0 * (f1 * f1 * f2
                                                       + f1 * f2 * f2)
    maxv, idx = pl.pallas_call(
        functools.partial(_stage23_kernel, kk=kk, mode=mode),
        grid=(nb, f0 // kk),
        in_specs=[scr_in, scr_in, row1, row1, row2, row2, const, const,
                  const, const, const, const, const, const],
        out_specs=[smem, smem],
        out_shape=[jax.ShapeDtypeStruct((nb, f0), jnp.float32),
                   jax.ShapeDtypeStruct((nb, f0), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops2,
            bytes_accessed=2 * nb * f0 * f1 * f2 * np.dtype(store).itemsize,
            transcendentals=0),
        interpret=interpret,
    )(sr_, si_, a1r, a1i, a2r, a2i, w2r, w2i, tw2r, tw2i, w3r, w3i, w3s,
      flatc)
    return maxv, idx


_PLAN_CACHE: dict = {}


def get_caf3_plan(n: int, mode: str = "bf16") -> Caf3Plan:
    key = (n, mode)
    if key not in _PLAN_CACHE:
        _PLAN_CACHE[key] = Caf3Plan(n, mode)
    return _PLAN_CACHE[key]


def caf3_chunk_size(plan: Caf3Plan, step: int) -> int:
    """Shifts per chunk: the in-kernel roll must stay inside the f2-lane
    halo ((B-1)*step <= f2), scratch stays <= ~2.6 GB at bf16."""
    bmax = plan.halo // max(1, step) + 1
    scr_cap = max(1, (2_600_000_000 // (2 * plan.n *
                                        np.dtype(plan.store).itemsize)))
    return max(1, min(64, bmax, scr_cap))


def caf3_sweep(rxr, rxi, ccr, cci, s0, nb: int, step: int, plan: Caf3Plan,
               interpret: bool = False):
    """(peak |X[k]|^2, true bin) of the modulated-window DFT for shifts
    s0 + i*step, i in [0, nb).

    rxr/rxi: 1-D window-source planes at the plan's storage dtype, length
    >= s0 + n + (nb-1)*step + f2 + 1 (caller pads). ccr/cci: (n,)
    PRE-CONJUGATED template planes. Returns ((nb,) f32, (nb,) uint32).
    """
    f0, f1, f2 = plan.f0, plan.f1, plan.f2
    n = plan.n
    cols = plan.wq * f2
    njt = f1 // plan.wq
    rowlen = f1 * f2
    idt = jnp.bfloat16 if plan.mode == "bf16" else jnp.float32

    span = n + (nb - 1) * step + f2
    wr = jax.lax.dynamic_slice(rxr, (s0,), (span,))
    wi = jax.lax.dynamic_slice(rxi, (s0,), (span,))

    # overlap tiles (njt, f0, cols + f2): tile j, row n0 = window lanes
    # [n0*rowlen + j*cols, + cols + f2) — built from static slices of the
    # one chunk window (per-shift windows are in-kernel rolls of these)
    def tiles(w):
        out = []
        for j in range(njt):
            base = j * cols
            v = jax.lax.slice(w, (base,), (base + (f0 - 1) * rowlen
                                           + cols + f2,))
            rows = jax.lax.slice(
                jnp.pad(v, (0, rowlen - cols - f2)), (0,),
                (f0 * rowlen,)).reshape(f0, rowlen)[:, : cols + f2]
            out.append(rows)
        return jnp.stack(out)

    t_r = tiles(wr).astype(idt)
    t_i = tiles(wi).astype(idt)
    cc2r = jnp.asarray(ccr).astype(idt).reshape(f0, rowlen)
    cc2i = jnp.asarray(cci).astype(idt).reshape(f0, rowlen)

    maxv, inner = _caf3_sweep_pallas(
        t_r, t_i, cc2r, cc2i,
        jnp.asarray(plan.w1r), jnp.asarray(plan.w1i), jnp.asarray(plan.w1s),
        jnp.asarray(plan.a1r), jnp.asarray(plan.a1i),
        jnp.asarray(plan.a2r), jnp.asarray(plan.a2i),
        jnp.asarray(plan.w2r), jnp.asarray(plan.w2i),
        jnp.asarray(plan.tw2r), jnp.asarray(plan.tw2i),
        jnp.asarray(plan.w3r), jnp.asarray(plan.w3i),
        jnp.asarray(plan.w3s), jnp.asarray(plan.flatc),
        nb=nb, step=step, f0=f0, f1=f1, f2=f2, wq=plan.wq, kk=plan.kk,
        mode=plan.mode, interpret=interpret)
    k0 = jnp.argmax(maxv, axis=1)
    pk = jnp.take_along_axis(maxv, k0[:, None], axis=1)[:, 0]
    fl = jnp.take_along_axis(inner, k0[:, None], axis=1)[:, 0]
    k1 = fl // f2
    k2 = fl % f2
    return pk, (k0 + f0 * (k1 + f1 * k2)).astype(jnp.uint32)


def caf3_peak(xr: jnp.ndarray, xi: jnp.ndarray, ccr, cci, plan: Caf3Plan,
              interpret: bool = False):
    """Single-window convenience: (peak |X[k]|^2, true argmax bin) of the
    n-point DFT of (xr + i*xi) * (ccr + i*cci). xr/xi: (n,) planes."""
    idt = jnp.bfloat16 if plan.mode == "bf16" else jnp.float32
    rxr = jnp.pad(jnp.asarray(xr).astype(idt), (0, plan.f2 + 8))
    rxi = jnp.pad(jnp.asarray(xi).astype(idt), (0, plan.f2 + 8))
    pk, bins = caf3_sweep(rxr, rxi, ccr, cci, jnp.int32(0), 1, 1, plan,
                          interpret=interpret)
    return pk[0], bins[0]
