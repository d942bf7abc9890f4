"""HISTORICAL (round 5, v1 kernel): this anatomy probed the v1 fused_caf3
API (_caf3_pallas with per-shift windows), which the v2 chunk-amortized
rewrite removed. Findings are recorded in ROADMAP.md ("Round-5 state"):
slice-only 1.274 ms/shift, kernel A 0.759, A+B 1.301, full 0.926 —
the measurements that motivated v2. Kept for the record; not runnable
against the current module.
"""
raise SystemExit("exp_caf3_anatomy probed the retired v1 API - see ROADMAP")

# --- original script below ---
'''
"""Chip anatomy of the three-stage fused 10M CAF (fused_caf3).

First A/B read 1.08 ms/shift for BOTH fused3 and the old planes path —
either something shared dominates (the per-shift dynamic_slice / lax.map
structure) or the kernels underperform their ~0.45 ms model. Isolate:

  1. slice-only: dynamic_slice of the bf16 planes + trivial reduce
  2. kernel A only (stage-1 strips -> scratch), fixed window
  3. kernel A+B (caf3_peak), fixed window (no slice, no map)
  4. full per-shift pipeline (slice + A + B) under lax.map, B shifts

Run: timeout 3000 python benchmarks/exp_caf3_anatomy.py
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
    from pydsproutines_tpu.ops.pallas import fused_caf3 as fc

    n = 10_000_000
    plan = fc.get_caf3_plan(n, "bf16")
    f0, f1, f2 = plan.f0, plan.f1, plan.f2
    print(f"triple: {f0} x {f1} x {f2}", flush=True)

    rng = np.random.default_rng(0)
    rx_ri = rng.standard_normal((2, n + 256), dtype=np.float32)
    cc_ri = rng.standard_normal((2, n), dtype=np.float32)
    d_rx = jax.device_put(jnp.asarray(rx_ri))
    d_cc = jax.device_put(jnp.asarray(cc_ri))

    consts = tuple(jnp.asarray(a) for a in (
        plan.w1r, plan.w1i, plan.w1s, plan.a1r, plan.a1i, plan.a2r,
        plan.a2i, plan.w2r, plan.w2i, plan.tw2r, plan.tw2i, plan.w3r,
        plan.w3i, plan.w3s, plan.flatc))

    # 1. slice-only
    @functools.partial(jax.jit, static_argnames=("n_reps",))
    def slice_only(rxri, salt, n_reps):
        rb = rxri.astype(jnp.bfloat16)

        def one(s):
            xr = jax.lax.dynamic_slice(rb[0], (s,), (n,))
            xi = jax.lax.dynamic_slice(rb[1], (s,), (n,))
            return (xr[::65536].astype(jnp.float32)
                    + xi[::65536].astype(jnp.float32)).sum()
        return jax.lax.map(one, salt + jnp.arange(n_reps))

    # 2/3. kernels on a FIXED window (salt-perturbed cc defeats CSE)
    def make_fixed(stage):
        @functools.partial(jax.jit, static_argnames=("n_reps",))
        def step(rxri, ccri, salt, n_reps):
            xr = rxri[0, :n].astype(jnp.bfloat16).reshape(f0, f1 * f2)
            xi = rxri[1, :n].astype(jnp.bfloat16).reshape(f0, f1 * f2)

            def body(acc, i):
                ccr = (ccri[0] * (1.0 + 1e-7 * (salt.astype(jnp.float32)
                                                + i))).astype(
                    jnp.bfloat16).reshape(f0, f1 * f2)
                cci = ccri[1].astype(jnp.bfloat16).reshape(f0, f1 * f2)
                out = fc._caf3_pallas(xr, xi, ccr, cci, *consts,
                                      f0=f0, f1=f1, f2=f2, mode="bf16",
                                      stage=stage)
                if stage == "a":
                    return acc + out[0].sum() + out[1].sum(), None
                return acc + out[0][0] + out[1][0].astype(jnp.float32), None
            acc, _ = jax.lax.scan(body, jnp.float32(0),
                                  jnp.arange(n_reps, dtype=jnp.float32))
            return acc
        return step

    # 4. full per-shift pipeline, B shifts per rep
    B = 4

    @functools.partial(jax.jit, static_argnames=("n_reps",))
    def full(rxri, ccri, salt, n_reps):
        rb0 = rxri[0].astype(jnp.bfloat16)
        rb1 = rxri[1].astype(jnp.bfloat16)
        ccr = ccri[0].astype(jnp.bfloat16)
        cci = ccri[1].astype(jnp.bfloat16)

        def one(s):
            xr = jax.lax.dynamic_slice(rb0, (s,), (n,))
            xi = jax.lax.dynamic_slice(rb1, (s,), (n,))
            return fc.caf3_peak(xr, xi, ccr, cci, plan)
        pk, bins = jax.lax.map(one, salt % 8 + jnp.arange(n_reps * B))
        return pk.sum() + bins.astype(jnp.float32).sum()

    for name, fn, args, per in [
            ("1. slice-only (per shift)   ", slice_only, (d_rx,), 1),
            ("2. kernel A only            ", make_fixed("a"), (d_rx, d_cc), 1),
            ("3. kernel A+B (caf3_peak)   ", make_fixed("both"),
             (d_rx, d_cc), 1),
            ("4. full slice+A+B x4 shifts ", full, (d_rx, d_cc), B),
    ]:
        try:
            dt = rep_differenced(fn, *args, max_r_hi=64)
            print(f"{name}: {dt/per*1e3:7.3f} ms/shift "
                  f"-> {n / (dt/per) / 1e9:6.2f} Gss/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)

'''
