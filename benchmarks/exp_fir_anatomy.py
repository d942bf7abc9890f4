"""Chip anatomy of the FIR+upfirdn chain at the official 4M geometry.

Round-5 question: the kernel's HIGHEST-mode MXU floor is ~0.49 ms but the
chain ships ~1.2-1.3 ms (3.2 GS/s). Where are the other ~0.7 ms?

Variants (all rep-differenced with bench.py's harness):
  a. bench-identical chain (taps perturbed per rep — K tables rebuild)
  b. chain with STATIC taps, input perturbed (isolates per-rep K build)
  c. kernel-only: planes pre-padded/pre-shaped outside the rep loop,
     static taps (isolates the pad+stack wrapper)
  d. (c) at bt=256 (fewer grid steps)
  e. (c) with prec="default" (single-pass bf16: the 6x HIGHEST premium —
     accuracy-invalid, bounds only)

Run: timeout 3000 python benchmarks/exp_fir_anatomy.py
"""

from __future__ import annotations

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

if __name__ == "__main__":
    import jax
    import jax.numpy as jnp

    from bench import rep_differenced
    from pydsproutines_tpu.ops.filters import fir_upfirdn_planes_flat
    from pydsproutines_tpu.ops.pallas.upfirdn import (_upfirdn_pallas_planes,
                                                      upfirdn_geometry)
    from pydsproutines_tpu.ops.filters import get_upfirdn_size

    n, t1, t2, up, down = 4_194_304, 128, 95, 5, 4
    rng = np.random.default_rng(1)
    x_ri = rng.standard_normal((2, n), dtype=np.float32)
    h_fir = rng.standard_normal(t1).astype(np.float32)
    h_rs = rng.standard_normal(t2).astype(np.float32)

    ft = jnp.asarray(h_fir)
    h_up = jnp.concatenate(
        [ft[:, None], jnp.zeros((t1, up - 1), ft.dtype)],
        axis=1).reshape(-1)[: t1 * up - (up - 1)]
    h_comb = np.asarray(jnp.convolve(h_up, jnp.asarray(h_rs),
                                     precision=jax.lax.Precision.HIGHEST))
    n_out = get_upfirdn_size(n, t2, up, down)
    print(f"n_out={n_out} T={h_comb.shape[-1]}", flush=True)

    d_x = jax.device_put(jnp.asarray(x_ri))
    d_fir = jax.device_put(jnp.asarray(h_fir))
    d_rs = jax.device_put(jnp.asarray(h_rs))
    d_comb = jax.device_put(jnp.asarray(h_comb))

    # a. bench-identical (tap perturb)
    @functools.partial(jax.jit, static_argnames=("n_reps",))
    def step_a(xri, fir, rs, salt, n_reps):
        def body(acc, i):
            f2 = fir * (1.0 + 1e-7 * (salt.astype(jnp.float32) + i))
            yr, yi = fir_upfirdn_planes_flat(f2, rs, xri[0], xri[1], up, down)
            return acc + yr[0] + yr[-1] + yi[0], None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(n_reps, dtype=jnp.float32))
        return acc

    # b. static taps, input perturb
    @functools.partial(jax.jit, static_argnames=("n_reps",))
    def step_b(xri, fir, rs, salt, n_reps):
        def body(acc, i):
            x0 = xri[0] * (1.0 + 1e-7 * (salt.astype(jnp.float32) + i))
            yr, yi = fir_upfirdn_planes_flat(fir, rs, x0, xri[1], up, down)
            return acc + yr[0] + yr[-1] + yi[0], None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(n_reps, dtype=jnp.float32))
        return acc

    # c/d/e. kernel-only with pre-shaped input
    def make_kernel_step(bt, prec):
        @functools.partial(jax.jit, static_argnames=("n_reps",))
        def step(xri, comb, salt, n_reps):
            planes = xri  # (2, n) — pad+reshape INSIDE the timed region?
            # no: kernel-only means we still pay pad/reshape (they are part
            # of _upfirdn_pallas_planes) but skip stack + h_comb conv + the
            # dispatch wrapper; input perturb on the flat planes
            def body(acc, i):
                p2 = planes * (1.0 + 1e-7 * (salt.astype(jnp.float32) + i))
                y = _upfirdn_pallas_planes(p2, comb, up, down, n_out,
                                           bt=bt, prec=prec)
                return acc + y[0, 0] + y[0, -1] + y[1, 0], None
            acc, _ = jax.lax.scan(body, jnp.float32(0),
                                  jnp.arange(n_reps, dtype=jnp.float32))
            return acc
        return step

    for name, fn, args in [
            ("a. chain, tap-perturb (bench)", step_a, (d_x, d_fir, d_rs)),
            ("b. chain, static taps       ", step_b, (d_x, d_fir, d_rs)),
            ("c. kernel-only bt=128       ", make_kernel_step(128, "highest"),
             (d_x, d_comb)),
            ("d. kernel-only bt=256       ", make_kernel_step(256, "highest"),
             (d_x, d_comb)),
            ("e. kernel-only bf16 1-pass  ", make_kernel_step(128, "default"),
             (d_x, d_comb)),
    ]:
        try:
            dt = rep_differenced(fn, *args, max_r_hi=64)
            print(f"{name}: {dt*1e3:7.3f} ms  -> {n/dt/1e9:6.2f} GS/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
