"""Fused group-xcorr CAF kernel: per shift-chunk, the whole
modulate -> tone-bank DFT -> group-phase combine pipeline stays in VMEM.

Reference semantics: GroupXcorrCZT.xcorr (/root/reference/xcorrRoutines.py:
996-1037; single-kernel GPU analogue group_xcorr_kernelv2 :1798 keeps the
template + slice in shared memory). The XLA path spends ~17 of 23 ms per
1024x8x4096 sweep shuffling the (B, G, m) gathered slices and elementwise
products through HBM; here each chunk's G group windows are small enough to
sit in VMEM, every shift's modulated products are built by lane rotations
(no HBM round trip), and the per-group tone banks — tones[t, f] pre-scaled
by the group phases exp(-j*2*pi*f*start_g/fs) — are resident constants, so
per chunk the kernel does G MXU matmuls of (B, m) @ (m, k) and accumulates
the coherent sum. Only the (B, k) complex CAF rows leave the core.

Precision: bf16 matmul inputs with f32 accumulation (CAF peak-search grade,
rel err ~1e-2 on |combined|^2). The class-level XLA path remains the parity
tier.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_VMEM_BUDGET = 88 * 1024 * 1024


def group_caf_viable(g: int, m: int, k: int, batch: int, step: int) -> bool:
    """Everything must fit VMEM: per-group tone banks (G, m, k) bf16 planes,
    the chunk window planes, the (B, m) product scratch, and the (B, k)
    accumulators."""
    if m % 128 != 0 or batch % 8 != 0:
        return False
    wpad = -(-(m + (batch - 1) * step) // 128) * 128
    tones = 2 * g * m * k * 2                     # bf16 planes
    win = 2 * g * wpad * 4 * 2                    # f32 planes, double-buffered
    yst = 2 * g * m * 4
    pdt = 2 * batch * m * 4 + 2 * batch * m * 2   # f32 rows + bf16 cast
    acc = 2 * batch * k * 4 * 2
    return tones + win + yst + pdt + acc <= _VMEM_BUDGET


def _kernel(win_re, win_im, yst_re, yst_im, t_re, t_im, out_re, out_im,
            pdt_re, pdt_im, *, g: int, m: int, k: int, batch: int,
            step: int):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    accr = jnp.zeros((batch, k), jnp.float32)
    acci = jnp.zeros((batch, k), jnp.float32)
    wpad = win_re.shape[-1]

    for gi in range(g):                            # G is small and static
        wr = win_re[0, gi][None, :]                # (1, Wpad)
        wi = win_im[0, gi][None, :]
        yr = yst_re[gi][None, :]                   # (1, m) conj'd template
        yi = yst_im[gi][None, :]

        def build(j, _):
            # shift j's window starts j*step lanes in: left-rotate and keep
            # the first m lanes (roll takes non-negative right shifts)
            amt = jax.lax.rem(jnp.int32(wpad) - j * step, jnp.int32(wpad))
            xr = pltpu.roll(wr, amt, 1)[:, :m]
            xi = pltpu.roll(wi, amt, 1)[:, :m]
            pr = xr * yr - xi * yi
            pi = xr * yi + xi * yr
            pdt_re[pl.ds(j, 1), :] = pr
            pdt_im[pl.ds(j, 1), :] = pi
            return 0

        jax.lax.fori_loop(0, batch, build, 0)

        dot = functools.partial(
            jax.lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        prb = pdt_re[...].astype(jnp.bfloat16)
        pib = pdt_im[...].astype(jnp.bfloat16)
        tr = t_re[gi]                              # (m, k) bf16
        ti = t_im[gi]
        accr = accr + dot(prb, tr) - dot(pib, ti)
        acci = acci + dot(prb, ti) + dot(pib, tr)

    out_re[0] = accr
    out_im[0] = acci


@functools.partial(jax.jit, static_argnames=("g", "m", "k", "batch", "step",
                                             "interpret"))
def _group_caf_pallas(wins_re, wins_im, yst_re, yst_im, t_re, t_im, *,
                      g, m, k, batch, step, interpret=False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nchunks, _, wpad = wins_re.shape
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    win_spec = pl.BlockSpec((1, g, wpad), lambda ci: (ci, 0, 0),
                            memory_space=pltpu.VMEM)
    flops = 8 * nchunks * batch * m * k * g
    return pl.pallas_call(
        functools.partial(_kernel, g=g, m=m, k=k, batch=batch, step=step),
        grid=(nchunks,),
        in_specs=[win_spec, win_spec] + [const] * 4,
        out_specs=[pl.BlockSpec((1, batch, k), lambda ci: (ci, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, batch, k), lambda ci: (ci, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((nchunks, batch, k), jnp.float32),
                   jax.ShapeDtypeStruct((nchunks, batch, k), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((batch, m), jnp.float32),
                        pltpu.VMEM((batch, m), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=0,
            bytes_accessed=2 * 4 * wins_re.size + 2 * 2 * t_re.size),
        interpret=interpret,
    )(wins_re, wins_im, yst_re, yst_im, t_re, t_im)


def group_caf_tonedot(rx, shift0: int, nchunks: int, plan_consts: dict,
                      interpret: bool = False):
    """Round-5 tone-dot formulation of the fused group CAF: the conjugated
    template AND the per-group phases fold into the tone banks on the host
    (Tf[g, t, f] = conj(y_g[t]) * tones[t, f] * phase[g, f]), so the whole
    per-chunk pipeline is ONE bf16 Karatsuba matmul

        C[b, f] = X[b, :] @ Tfold,  X[b] = concat_g rx[s_b + start_g : + m]

    with no per-shift roll loop at all (the v1 Pallas kernel's 1-row
    pltpu.roll build ran at 1/8 sublane occupancy and serialized B*G
    iterations — ROADMAP round-4: 'roll/VPU-bound'). The X gather is B
    static slices of the per-group chunk windows, built directly in bf16.
    Same outputs as fused_group_caf ((nchunks, B, k) planes).
    """
    del interpret
    g = plan_consts["g"]
    m = plan_consts["m"]
    k = plan_consts["k"]
    batch = plan_consts["batch"]
    step = plan_consts["step"]
    starts = plan_consts["starts"]
    halo = (batch - 1) * step
    span_per = m + halo

    tr = jnp.asarray(plan_consts["tf_re"])        # (G*m, k) bf16
    ti = jnp.asarray(plan_consts["tf_im"])
    ts = jnp.asarray(plan_consts["tf_s"])         # Karatsuba sum plane
    rre = jnp.real(rx).astype(jnp.bfloat16)
    rim = jnp.imag(rx).astype(jnp.bfloat16)

    mm = functools.partial(jnp.matmul,
                           preferred_element_type=jnp.float32)

    def one_chunk(ci):
        base = shift0 + ci * batch * step

        def rows(plane):
            wins = jax.vmap(lambda s: jax.lax.dynamic_slice(
                plane, (base + s,), (span_per,)))(jnp.asarray(starts))
            return jnp.stack([
                jax.lax.slice(wins, (0, i * step), (g, i * step + m))
                for i in range(batch)]).reshape(batch, g * m)

        xr = rows(rre)
        xi = rows(rim)
        xs = (xr.astype(jnp.float32)
              + xi.astype(jnp.float32)).astype(jnp.bfloat16)
        a = mm(xr, tr)
        b = mm(xi, ti)
        s = mm(xs, ts)
        return a - b, s - a - b                   # (B, k) re/im planes

    out = jax.lax.map(one_chunk, jnp.arange(nchunks))
    return out[0], out[1]


def fused_group_caf(rx, shift0: int, nchunks: int, plan_consts: dict,
                    interpret: bool = False):
    """Complex CAF rows for shifts ``shift0 + step*i`` over nchunks chunks of
    ``batch`` shifts. ``plan_consts``: numpy dict from GroupXcorrCZT
    (_fused_consts). Normalization is the caller's."""
    g = plan_consts["g"]
    m = plan_consts["m"]
    k = plan_consts["k"]
    batch = plan_consts["batch"]
    step = plan_consts["step"]
    starts = plan_consts["starts"]
    halo = (batch - 1) * step
    wpad = -(-(m + halo) // 128) * 128
    span_per = m + halo

    rre = jnp.real(rx).astype(jnp.float32)
    rim = jnp.imag(rx).astype(jnp.float32)

    def windows(plane):
        def one_chunk(ci):
            base = shift0 + ci * batch * step
            rows = jax.vmap(lambda s: jax.lax.dynamic_slice(
                plane, (base + s,), (span_per,)))(jnp.asarray(starts))
            return jnp.pad(rows, ((0, 0), (0, wpad - span_per)))
        return jax.lax.map(one_chunk, jnp.arange(nchunks))

    wre = windows(rre)
    wim = windows(rim)
    out_re, out_im = _group_caf_pallas(
        wre, wim,
        jnp.asarray(plan_consts["yst_re"]), jnp.asarray(plan_consts["yst_im"]),
        jnp.asarray(plan_consts["t_re"]), jnp.asarray(plan_consts["t_im"]),
        g=g, m=m, k=k, batch=batch, step=step, interpret=interpret)
    return out_re, out_im
