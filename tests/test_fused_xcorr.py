"""Property tests for the single-kernel fused CAF peak search
(ops/pallas/fused_xcorr.py) across an (n, batch, step, mode) grid — VERDICT
round 1: non-unit steps and batch*step near the n2 boundary were untested.

All runs use interpret mode (CPU); the kernel's grid/rotation/argmax logic is
identical on hardware. Ground truth is the direct per-shift
|FFT(rx[s:s+n] * conj(cutout))|^2 argmax with QF^2 normalization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pydsproutines_tpu.ops.pallas.fused_xcorr import (FusedXcorrPlan,
                                                      fused_freq_scan_xcorr,
                                                      get_fused_plan)


def _truth(cutout, rx, shifts):
    n = cutout.shape[-1]
    cc = np.conj(np.asarray(cutout))
    rx = np.asarray(rx)
    cns = float(np.sum(np.abs(cc) ** 2))
    qf2 = np.zeros(len(shifts))
    bins = np.zeros(len(shifts), dtype=np.int64)
    for i, s in enumerate(shifts):
        w = rx[s: s + n]
        spec = np.abs(np.fft.fft(w * cc)) ** 2
        bins[i] = int(np.argmax(spec))
        qf2[i] = spec[bins[i]] / cns / float(np.sum(np.abs(w) ** 2))
    return qf2, bins


def _scene(rng, n, rxlen, plant_at=None):
    cut = (rng.standard_normal(n)
           + 1j * rng.standard_normal(n)).astype(np.complex64)
    rx = (0.1 * (rng.standard_normal(rxlen)
                 + 1j * rng.standard_normal(rxlen))).astype(np.complex64)
    if plant_at is not None:
        rx[plant_at: plant_at + n] += cut
    return cut, rx


@pytest.mark.parametrize("n,batch,step,nshifts", [
    (4096, 8, 1, 24),          # smallest viable n
    (4096, 8, 3, 16),          # non-unit step
    (8192, 16, 1, 16),
    (8192, 4, 22, 12),         # batch*step=88 vs n2=128: near boundary
    (16384, 8, 16, 16),        # halo = 112 < n2 = 128, within one row
])
def test_fused_matches_direct_over_grid(rng, n, batch, step, nshifts):
    plan = get_fused_plan(n, batch, step, "bf16")
    assert plan.viable, (n, batch, step)
    cut, rx = _scene(rng, n, n + step * (nshifts + batch) + 256,
                     plant_at=step * 2)
    qf2, bins = fused_freq_scan_xcorr(jnp.asarray(cut), jnp.asarray(rx),
                                      0, nshifts, batch=batch, step=step,
                                      mode="bf16", interpret=True)
    shifts = np.arange(nshifts) * step
    tq, tb = _truth(cut, rx, shifts)
    # bf16 is peak-search grade: the planted peak and its bin must be exact,
    # off-peak QF^2 within loose tolerance
    np.testing.assert_array_equal(np.asarray(bins)[2 // max(step, 1)],
                                  tb[2 // max(step, 1)])
    i_star = int(np.argmax(tq))
    assert int(np.argmax(np.asarray(qf2))) == i_star
    np.testing.assert_allclose(np.asarray(qf2), tq, rtol=0.15, atol=5e-3)
    np.testing.assert_allclose(float(qf2[i_star]), tq[i_star], rtol=2e-2)


def test_fused_f32_mode_bins_match_everywhere(rng):
    """f32 mode is reference grade: every bin matches the numpy argmax, not
    just the peak."""
    n, batch, step, nshifts = 4096, 8, 1, 16
    cut, rx = _scene(rng, n, n + 300, plant_at=5)
    qf2, bins = fused_freq_scan_xcorr(jnp.asarray(cut), jnp.asarray(rx),
                                      0, nshifts, batch=batch, step=step,
                                      mode="f32", interpret=True)
    tq, tb = _truth(cut, rx, np.arange(nshifts))
    np.testing.assert_array_equal(np.asarray(bins), tb)
    np.testing.assert_allclose(np.asarray(qf2), tq, rtol=1e-4)


def test_plan_viability_boundaries():
    # halo > n2 disqualifies (two-reshape window build limit)
    n = 4096                       # n1=n2=64
    assert not FusedXcorrPlan(n, batch=128, step=1).viable  # halo 127 > 64
    assert FusedXcorrPlan(n, batch=64, step=1).viable       # halo 63 <= 64
    assert not FusedXcorrPlan(n, batch=16, step=8).viable   # halo 120 > 64
    # primes and tiny sizes are never viable
    assert not FusedXcorrPlan(4099).viable
    assert not FusedXcorrPlan(2048).viable

    p = FusedXcorrPlan(1_000_000, batch=128, step=1)
    assert p.viable and (p.n1, p.n2) == (1000, 1000)


def test_fused_num_shifts_not_multiple_of_batch(rng):
    """Ragged tails: num_shifts that don't fill the last chunk are trimmed
    exactly (padded shifts never leak into the output)."""
    n, batch = 4096, 8
    cut, rx = _scene(rng, n, n + 200, plant_at=9)
    qf2_13, bins_13 = fused_freq_scan_xcorr(
        jnp.asarray(cut), jnp.asarray(rx), 0, 13, batch=batch, step=1,
        mode="bf16", interpret=True)
    qf2_16, bins_16 = fused_freq_scan_xcorr(
        jnp.asarray(cut), jnp.asarray(rx), 0, 16, batch=batch, step=1,
        mode="bf16", interpret=True)
    assert qf2_13.shape == (13,)
    np.testing.assert_allclose(np.asarray(qf2_13), np.asarray(qf2_16)[:13],
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(bins_13),
                                  np.asarray(bins_16)[:13])


def test_fused_nonzero_start_offset(rng):
    n, batch = 4096, 8
    cut, rx = _scene(rng, n, n + 400, plant_at=117)
    qf2, bins = fused_freq_scan_xcorr(jnp.asarray(cut), jnp.asarray(rx),
                                      100, 32, batch=batch, step=1,
                                      mode="bf16", interpret=True)
    assert int(np.argmax(np.asarray(qf2))) == 17  # 100 + 17 == 117
