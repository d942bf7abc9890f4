#!/usr/bin/env python
"""Isolate the Pallas upfirdn kernel's 1.6 ms (bound says ~0.6): sweep dot
precision, drop the offset-row part, vary Bt, and time DMA-only."""

import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import rep_differenced
from pydsproutines_tpu.ops.pallas.upfirdn import (_band_matrix,
                                                  upfirdn_geometry)
from pydsproutines_tpu.ops.filters import get_upfirdn_size

N = 4_194_304
RS_TAPS, UP, DOWN = 95, 5, 4
rng = np.random.default_rng(1)
x_ri = rng.standard_normal((2, N), dtype=np.float32)
h_rs = rng.standard_normal(RS_TAPS).astype(np.float32)
n_out = get_upfirdn_size(N, RS_TAPS, UP, DOWN)
P, S, cols, R = upfirdn_geometry(UP, DOWN)


def variant(bt, prec, parts, dma_only=False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Kj, Lh, W = _band_matrix(jnp.asarray(h_rs), UP, DOWN)
    r = -(-W // R)
    widths, kparts = [], []
    for j in range(r):
        wj = min(R, W - j * R)
        wjp = -(-wj // 128) * 128
        kp = jnp.zeros((wjp, cols), jnp.float32).at[:wj].set(
            Kj[j * R: j * R + wj])
        widths.append(wjp)
        kparts.append(kp)
    r_use = min(parts, r)

    nb = -(-n_out // cols)
    nsteps = -(-nb // bt)
    extra = 8
    nrows = nsteps * bt + extra
    need = nrows * R

    def kernel(x_hbm, *rest):
        kps = rest[:r_use]
        out = rest[r_use]
        scratch = rest[r_use + 1]
        sem = rest[r_use + 2]
        gi = pl.program_id(0)
        cp = pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(gi * bt, bt + extra), :], scratch, sem)
        cp.start()
        cp.wait()
        dot = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        for p in range(2):
            if dma_only:
                out[p, 0] = jnp.broadcast_to(
                    jnp.sum(scratch[p, 0:8, :]), (bt, cols))
                continue
            acc = jnp.zeros((bt, cols), jnp.float32)
            for j in range(r_use):
                a = scratch[p, pl.ds(j, bt), :][:, :widths[j]]
                acc = acc + dot(a, kps[j][...])
            out[p, 0] = acc
        return

    @jax.jit
    def run(planes):
        xp = jnp.pad(planes, ((0, 0), (Lh - 1, max(0, need - N - (Lh - 1)))))
        x_rows = xp[:, :need].reshape(2, nrows, R)
        out = pl.pallas_call(
            kernel, grid=(nsteps,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * r_use,
            out_specs=pl.BlockSpec((2, 1, bt, cols), lambda g: (0, g, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2, nsteps, bt, cols),
                                           jnp.float32),
            scratch_shapes=[pltpu.VMEM((2, bt + extra, R), jnp.float32),
                            pltpu.SemaphoreType.DMA(())],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=2 * nsteps * 2 * bt * sum(widths[:r_use]) * cols,
                transcendentals=0, bytes_accessed=8 * N),
            )(x_rows, *kparts[:r_use])
        return out.reshape(2, -1)[:, :n_out]
    return run


d_x = jax.device_put(jnp.asarray(x_ri))


def measure(name, run):
    @functools.partial(jax.jit, static_argnames=("n_reps",))
    def step(xri, salt, n_reps):
        outs = []
        for i in range(n_reps):
            outs.append(jnp.sum(run(xri * (1.0 + 1e-7 * (salt + i)))))
        return jnp.stack(outs)
    dt = rep_differenced(step, d_x)
    print(f"{name:52s} {dt * 1e3:8.3f} ms  {N / dt / 1e9:7.2f} GS/s",
          flush=True)


HI = jax.lax.Precision.HIGHEST
DEF = jax.lax.Precision.DEFAULT
measure("bt=128 HIGHEST 2 parts (shipped)", variant(128, HI, 2))
measure("bt=128 HIGHEST 1 part (wrong, perf probe)", variant(128, HI, 1))
measure("bt=128 DEFAULT 2 parts (perf probe)", variant(128, DEF, 2))
measure("bt=256 HIGHEST 2 parts", variant(256, HI, 2))
measure("bt=512 HIGHEST 2 parts", variant(512, HI, 2))
measure("bt=128 dma+write only", variant(128, HI, 2, dma_only=True))
