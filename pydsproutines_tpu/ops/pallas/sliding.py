"""Pallas kernel: dense sliding normalized multi-template dot product.

Reference semantics: custom_kernels/multiplySlices.cu
(slidingMultiplyNormalised :114, multiTemplateSlidingDotProduct :252) — the
short-template time-domain matched filter: for every shift s and template t,

    qf2[t, s] = | sum_n x[s+n] * conj(tmpl[t, n]) |^2
                / sum_n |x[s+n]|^2 / ||tmpl_t||^2

The reference stages template + input slices through 48 kB of CUDA shared
memory; here each grid step DMAs one input tile (tile + template-length halo)
from HBM into VMEM scratch (~16 MB available), builds the im2col window
matrix W[m, j] = x[tile_start + j - m] with lane rotates, and feeds the MXU:
the sliding MAC is (T, Lp) x (Lp, tile) matmuls. Each input element is read
from HBM exactly once per tile, and the templates stay VMEM-resident across
the whole sweep.

Mosaic constraints shape the im2col construction: there are no unaligned
dynamic vector loads, and a strided rotate may not shift any sublane by more
than a vreg width (128 lanes). So the Lp window rows are built in blocks of
128: a static coarse rotate by 128*a + 1 lanes, then one strided rotate
giving row b an extra shift of b in [0, 128). Matmuls accumulate per block,
so peak VMEM is one (128, tile+Lp) block triple, not the full im2col.

Complex data is carried as separate re/im float32 planes (TPU Pallas has no
complex vregs). Inputs must be padded so every tile's halo read stays in
bounds — the public wrapper handles padding, template reversal, and trimming.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# template-length cap: rows of the im2col block triple must fit VMEM next to
# the accumulators; beyond this the FFT overlap-save xcorr path wins anyway
MAX_TEMPLATE_LEN = 2048


def _kernel(xre_hbm, xim_hbm, tre_r, tim_r, ones_r, tnorm, out,
            scratch_re, scratch_im, sem_re, sem_im, *, tile: int, lp: int):
    """tre_r/tim_r: (T, Lp) REVERSED zero-padded template planes, where
    column r corresponds to tap n = Lp - 1 - r. ones_r: (1, Lp) reversed
    window-energy selector (ones in the last L columns)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    gi = pl.program_id(0)
    w = tile + lp
    # DMA this tile's input window (tile + halo) into VMEM
    cp_re = pltpu.make_async_copy(
        xre_hbm.at[:, pl.ds(gi * tile, w)], scratch_re, sem_re)
    cp_im = pltpu.make_async_copy(
        xim_hbm.at[:, pl.ds(gi * tile, w)], scratch_im, sem_im)
    cp_re.start()
    cp_im.start()
    cp_re.wait()
    cp_im.wait()

    buf_re = scratch_re[:, :]                      # (1, w)
    buf_im = scratch_im[:, :]
    buf_sq = buf_re * buf_re + buf_im * buf_im

    ntmpl = tre_r.shape[0]
    dot = functools.partial(jax.lax.dot_general,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)

    acc_re = jnp.zeros((ntmpl, tile), jnp.float32)
    acc_im = jnp.zeros((ntmpl, tile), jnp.float32)
    energy = jnp.zeros((1, tile), jnp.float32)

    # W[m, j] = buf[(j - m) mod w] for m = 128*a + b + 1; used columns
    # j in [lp, lp+tile) never wrap since m <= lp <= j. With tap index
    # n = lp - m, column j of the matmul output is shift s = j - lp:
    #   sum_m A[:, m-1] * buf[j - m] = sum_n conj(t[n]) * x[s + n].
    for a in range(lp // 128):
        shift = 128 * a + 1
        rows = []
        for buf in (buf_re, buf_im, buf_sq):
            coarse = pltpu.roll(buf, shift, 1)                  # (1, w)
            blk = jnp.broadcast_to(coarse, (128, w))
            # row b gets an extra right-rotate of b in [0, 128)
            rows.append(pltpu.roll(blk, 0, 1, stride=1, stride_axis=0))
        wre, wim, wsq = (r[:, lp:lp + tile] for r in rows)      # aligned slice
        a_sl = slice(128 * a, 128 * (a + 1))
        tr = tre_r[:, a_sl]
        ti = tim_r[:, a_sl]
        # acc = sum_n x[s+n] * conj(t[n]) ; A holds t (not conj) planes
        acc_re = acc_re + dot(tr, wre) + dot(ti, wim)
        acc_im = acc_im + dot(tr, wim) - dot(ti, wre)
        energy = energy + dot(ones_r[:, a_sl], wsq)

    mag = acc_re * acc_re + acc_im * acc_im
    denom = energy * tnorm[:, :1]
    out[:, :] = jnp.where(denom > 0, mag / denom, 0.0)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def _sliding_pallas(xre, xim, tre_r, tim_r, ones_r, tnorm, *, tile: int,
                    interpret: bool = False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    lp = tre_r.shape[1]
    ntmpl = tre_r.shape[0]
    nshifts = xre.shape[1] - lp     # padded (1, N) input: shifts = N - lp
    ntiles = nshifts // tile

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # x re (HBM)
            pl.BlockSpec(memory_space=pl.ANY),        # x im (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),    # reversed templates re
            pl.BlockSpec(memory_space=pltpu.VMEM),    # reversed templates im
            pl.BlockSpec(memory_space=pltpu.VMEM),    # energy selector (1,Lp)
            pl.BlockSpec(memory_space=pltpu.VMEM),    # template norms (T, 1)
        ],
        out_specs=pl.BlockSpec((ntmpl, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, tile + lp), jnp.float32),
            pltpu.VMEM((1, tile + lp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, tile=tile, lp=lp),
        out_shape=jax.ShapeDtypeStruct((ntmpl, ntiles * tile), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(xre, xim, tre_r, tim_r, ones_r, tnorm)


@functools.partial(jax.jit,
                   static_argnames=("tlen", "tile", "interpret"))
def _sliding_device(x, templates, *, tlen: int, tile: int,
                    interpret: bool = False):
    """Fully-jitted prep + kernel for device-resident complex inputs: pad,
    reverse, split to float planes, run the Pallas kernel, trim — one compile
    (eager ops are expensive on remote-compile transports)."""
    lp = max(128, -(-tlen // 128) * 128)
    nshifts = x.shape[-1] - tlen + 1
    ntiles = -(-nshifts // tile)
    padded_len = ntiles * tile + lp
    xp = jnp.pad(x, (0, padded_len - x.shape[-1]))
    tpad = jnp.pad(templates, ((0, 0), (0, lp - tlen)))
    trev = tpad[:, ::-1]
    ones_r = jnp.zeros((1, lp), jnp.float32).at[0, lp - tlen:].set(1.0)
    tnorm = jnp.sum(templates.real ** 2 + templates.imag ** 2,
                    axis=1, keepdims=True).astype(jnp.float32)
    out = _sliding_pallas(
        xp.real.astype(jnp.float32)[None, :],
        xp.imag.astype(jnp.float32)[None, :],
        trev.real.astype(jnp.float32), trev.imag.astype(jnp.float32),
        ones_r, tnorm, tile=tile, interpret=interpret)
    return out[:, :nshifts]


def sliding_multiply_normalised(x: jnp.ndarray, templates: jnp.ndarray,
                                tile: int = 1024,
                                interpret: bool = False) -> jnp.ndarray:
    """QF^2 of every template against every dense shift of ``x``.

    x : (N,) complex; templates : (T, L) complex, L <= 2048.
    Returns (T, N - L + 1) float32. Uses the Pallas VMEM-tiled MXU kernel;
    set ``interpret=True`` to run the kernel on CPU for testing.
    """
    tmpl_is_np = isinstance(templates, np.ndarray)
    templates = (np if tmpl_is_np else jnp).atleast_2d(templates)
    tlen = int(templates.shape[1])
    if tlen > MAX_TEMPLATE_LEN:
        raise ValueError(
            f"template length {tlen} > {MAX_TEMPLATE_LEN}; use the FFT "
            "overlap-save xcorr path for long templates")
    nshifts = int(x.shape[-1]) - tlen + 1
    if nshifts <= 0:
        raise ValueError("template longer than input")
    if not isinstance(x, np.ndarray):
        # device-resident input: everything inside one jit
        return _sliding_device(x, jnp.asarray(templates), tlen=tlen,
                               tile=tile, interpret=interpret)
    # host numpy input: prep on host — the axon transport cannot transfer
    # complex arrays, so re/im planes are split before device_put
    templates = np.asarray(templates)
    lp = max(128, -(-tlen // 128) * 128)        # pad taps to lane multiple
    ntiles = -(-nshifts // tile)
    # pad so that (padded_len - lp) == ntiles * tile and every halo read is
    # in bounds: need ntiles*tile + lp samples
    padded_len = ntiles * tile + lp
    xp = np.pad(x, (0, padded_len - int(x.shape[-1])))
    # reversed, zero-padded template planes: column r <-> tap n = lp - 1 - r
    tpad = np.pad(templates, ((0, 0), (0, lp - tlen)))
    trev = tpad[:, ::-1]
    ones_r = np.zeros((1, lp), np.float32)
    ones_r[0, lp - tlen:] = 1.0
    tnorm = np.sum(templates.real ** 2 + templates.imag ** 2,
                   axis=1, keepdims=True).astype(np.float32)
    out = _sliding_pallas(
        jnp.asarray(np.ascontiguousarray(xp.real.astype(np.float32))[None, :]),
        jnp.asarray(np.ascontiguousarray(xp.imag.astype(np.float32))[None, :]),
        jnp.asarray(np.ascontiguousarray(trev.real.astype(np.float32))),
        jnp.asarray(np.ascontiguousarray(trev.imag.astype(np.float32))),
        jnp.asarray(ones_r),
        jnp.asarray(tnorm), tile=tile, interpret=interpret)
    return out[:, :nshifts]


def sliding_multiply_normalised_reference(x, templates) -> np.ndarray:
    """Plain numpy fallback with identical semantics (for parity tests and
    platforms without Pallas)."""
    x = np.asarray(x)
    templates = np.atleast_2d(np.asarray(templates))
    tlen = templates.shape[1]
    nshifts = x.shape[-1] - tlen + 1
    power = np.abs(x) ** 2
    energy = np.convolve(power, np.ones(tlen), mode="valid")
    out = np.zeros((templates.shape[0], nshifts), np.float32)
    for t in range(templates.shape[0]):
        corr = np.correlate(x, templates[t], mode="valid")
        tnorm = np.sum(np.abs(templates[t]) ** 2)
        out[t] = (np.abs(corr) ** 2 / energy[:nshifts] / tnorm).astype(np.float32)
    return out
