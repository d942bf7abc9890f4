"""Pallas median filter: VMEM-resident radix select per output block.

The reference brags ~1000x GPU medfilt over CPU scipy on long captures
(/root/reference/filterRoutines.py:1068, cupyx medfilt). XLA offers no fast
path: jnp.median sorts (serial comparator networks on the VPU — measured
4.07 s for 4M samples, k=129 on v5e), jax.lax.top_k over (rows, k) windows
OOMs on layout padding, and an XLA radix select re-reads the O(n*k) window
matrix from HBM every bit (measured 204 ms). This kernel keeps one block's
windows resident in VMEM:

  grid = n / C output blocks. Per block: load the (1, C + k - 1) padded
  segment, build the (k, C) rolled window matrix IN VMEM (k lane-rotates —
  Mosaic needs 128-aligned static lane slices, so rotation is the aligned
  way to shift), map floats to order-preserving uint32 keys, then run a
  32-step MSB-first radix select shared across all C outputs: the median is
  the largest v with count(keys < v) <= k//2 per column. Keys are exact —
  the result bit-matches scipy.signal.medfilt (zero-padded edges).

HBM traffic: read n + write n floats (plus the overlap halo), vs 32*n*k for
the XLA radix form. Compute: 32*k*C int compares per block on the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _kernel(seg_ref, out_ref, win_ref, *, c: int, k: int, half: int):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    seg = seg_ref[0]                                   # (1, CW) float32
    i32 = jax.lax.bitcast_convert_type(seg, jnp.int32)
    u32 = jax.lax.bitcast_convert_type(seg, jnp.uint32)
    keys = jnp.where(i32 >= 0, u32 + jnp.uint32(0x80000000), ~u32)
    cw = keys.shape[1]
    k8 = win_ref.shape[0]                              # k rounded up to 8

    # window scratch row j = seg rotated left by j (right rotation by
    # CW - j; pltpu.roll requires non-negative shifts), first C lanes valid
    # since j + c <= CW. fori_loop + dynamic roll keeps the program small —
    # a python-unrolled k-row build compiled for minutes at k=129.
    def build(j, _):
        amt = jax.lax.rem(jnp.int32(cw) - j, jnp.int32(cw))
        row = pltpu.roll(keys, amt, 1)[:, :c]
        win_ref[pl.ds(j, 1), :] = row
        return 0

    jax.lax.fori_loop(0, k, build, 0)
    if k8 > k:
        # alignment pad rows: MAX key, so (pad < cand) never counts in the
        # MXU reduction below (strict less; cand <= 0xFFFFFFFF always)
        win_ref[pl.ds(k, k8 - k), :] = jnp.full((k8 - k, c), 0xFFFFFFFF,
                                                jnp.uint32)
    win = win_ref[...]                                 # (k8, C) uint32
    ones = jnp.ones((8, k8), jnp.float32)

    def bit_step(b, acc):
        shift = (jnp.uint32(31) - b.astype(jnp.uint32))
        cand = acc | (jnp.uint32(1) << shift)
        # count via a ones-matmul: the (k, C) -> (1, C) sum reduction rides
        # the MXU instead of burning a VPU pass per element (1/3 of the
        # loop's VPU work; counts <= k are exact in f32 accumulation)
        ind = (win < cand).astype(jnp.float32)
        cnt = jax.lax.dot_general(
            ones, ind, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[:1]
        return jnp.where(cnt <= half, cand, acc)

    acc = jax.lax.fori_loop(0, 32, bit_step,
                            jnp.zeros((1, c), jnp.uint32))

    # keys -> float32 (inverse of the order-preserving map)
    neg = acc < jnp.uint32(0x80000000)
    bits = jnp.where(neg, ~acc, acc - jnp.uint32(0x80000000))
    out_ref[0] = jax.lax.bitcast_convert_type(
        bits.astype(jnp.uint32), jnp.float32)


@functools.partial(jax.jit, static_argnames=("kernel_size", "block",
                                             "interpret"))
def medfilt_pallas(x: jnp.ndarray, kernel_size: int, block: int | None = None,
                   interpret: bool = False) -> jnp.ndarray:
    """scipy.signal.medfilt-exact median filter for 1-D real float input."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if kernel_size % 2 != 1:
        raise ValueError("kernel_size must be odd")
    k = int(kernel_size)
    half = k // 2
    n = x.shape[-1]
    if block is None:
        # win (k, C) uint32 must fit comfortably in VMEM next to the segment
        block = max(512, min(16384, (40 * 1024 * 1024 // (4 * k))
                             // 128 * 128))
    c = int(min(block, max(512, -(-n // 128) * 128)))
    nblk = -(-n // c)
    cw = -(-(c + k - 1) // 128) * 128

    # overlapping (nblk, CW) window views via shifted reshapes: block b's
    # row = xp[b*c : b*c + cw]
    xp = jnp.pad(x.astype(jnp.float32), (half, half))
    rr = -(-cw // c)
    need = (nblk - 1) * c + rr * c
    xpp = jnp.pad(xp, (0, max(0, need - xp.shape[0])))
    parts = [jax.lax.slice(xpp, (i * c,), (i * c + nblk * c,))
             .reshape(nblk, c) for i in range(rr)]
    segs = jnp.concatenate(parts, axis=1)[:, :cw]      # (nblk, CW)
    segs = segs[:, None, :]      # (nblk, 1, CW): trailing block dims match
                                 # the array dims (TPU block alignment rule)

    out = pl.pallas_call(
        functools.partial(_kernel, c=c, k=k, half=half),
        grid=(nblk,),
        in_specs=[pl.BlockSpec((1, 1, cw), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, c), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((-(-k // 8) * 8, c), jnp.uint32)],
        out_shape=jax.ShapeDtypeStruct((nblk, 1, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=32 * k * nblk * c, transcendentals=0,
            bytes_accessed=2 * 4 * nblk * c),
        interpret=interpret,
    )(segs)
    return out.reshape(-1)[:n].astype(x.dtype)
