"""Chip sweep: caf3 kernel-A tile width (wq) x kernel-B k0 batch (kk).

Default (5, 5) shipped 12.87 Gss/s official. Wider tiles cut grid steps
(fixed per-step overhead) at more VMEM; this sweeps the divisor ladder.

Run: timeout 3000 python benchmarks/exp_caf3_tune.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

if __name__ == "__main__":
    import bench
    from pydsproutines_tpu.ops.pallas.fused_caf3 import get_caf3_plan
    import pydsproutines_tpu.ops.xcorr as xc

    n, nshifts, batch = 10_000_000, 128, 16
    plan = get_caf3_plan(n, "bf16")
    for wq, kk in [(5, 5), (25, 25), (5, 25), (25, 5)]:
        plan.wq, plan.kk = wq, kk
        # kk rows feed the (f0/kk, kk, f) twiddle row groups
        f0, f1, f2 = plan.f0, plan.f1, plan.f2
        plan.a1r = plan.a1r.reshape(f0 // kk, kk, f1)
        plan.a1i = plan.a1i.reshape(f0 // kk, kk, f1)
        plan.a2r = plan.a2r.reshape(f0 // kk, kk, f2)
        plan.a2i = plan.a2i.reshape(f0 // kk, kk, f2)
        xc._fast_xcorr_impl._clear_cache()
        try:
            rate, dt = bench.bench_fft_xcorr(n, nshifts, batch, r_hi=2)
            print(f"wq={wq:2d} kk={kk:2d}: {rate:7.2f} Gss/s "
                  f"({dt/nshifts*1e3:.3f} ms/shift)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"wq={wq:2d} kk={kk:2d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
