"""Chip A/B: three-stage fused CAF chain (fused3) vs the round-4 XLA planes
path at the official 10M x 128 geometry, using bench.py's harness.

Run: timeout 3000 python benchmarks/exp_caf3.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

if __name__ == "__main__":
    import bench

    import pydsproutines_tpu.ops.xcorr as xc

    n, nshifts, batch = 10_000_000, 128, 16

    # A: new routing (fused3)
    path, reason = xc.select_xcorr_path(n, n + 200, "complex64", True, False,
                                        True, batch, 1)
    print(f"routing now: {path} ({reason})", flush=True)
    rate, dt = bench.bench_fft_xcorr(n, nshifts, batch, r_hi=2)
    print(f"fused3 : {rate:8.2f} Gss/s  ({dt*1e3:.1f} ms/sweep, "
          f"{dt/nshifts*1e3:.3f} ms/shift)", flush=True)

    # B: force the old planes path for the same-process comparison
    orig = xc.select_xcorr_path

    def force_planes(*a, **k):
        p, r = orig(*a, **k)
        if p == "fused3":
            return "planes", "forced for A/B"
        return p, r

    xc.select_xcorr_path = force_planes
    xc._fast_xcorr_impl._clear_cache()
    rate2, dt2 = bench.bench_fft_xcorr(n, nshifts, batch, r_hi=2)
    print(f"planes : {rate2:8.2f} Gss/s  ({dt2*1e3:.1f} ms/sweep, "
          f"{dt2/nshifts*1e3:.3f} ms/shift)", flush=True)
    print(f"speedup: {rate/rate2:.2f}x", flush=True)
