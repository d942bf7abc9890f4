"""Fused Pallas CAF-peak kernel (ops/pallas/fft_peak.py): interpret-mode
parity against jnp.fft on the four-step plan's sizes, plus the fast_xcorr
integration (reference semantics: fastXcorr freq-scan peak,
/root/reference/xcorrRoutines.py:519-531)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pydsproutines_tpu.ops.fft import get_fft_plan
from pydsproutines_tpu.ops.xcorr import fast_xcorr


@pytest.mark.parametrize("n", [4096, 12800])
@pytest.mark.parametrize("mode,tol", [("bf16", 5e-3), ("bf16x3", 5e-5),
                                      ("f32", 5e-6)])
def test_call_peak_matches_fft_argmax(n, mode, tol):
    plan = get_fft_plan(n, "complex64")
    assert plan.peak_viable(mode)
    rng = np.random.default_rng(7)
    x = (rng.standard_normal((3, n))
         + 1j * rng.standard_normal((3, n))).astype(np.complex64)
    ref = np.fft.fft(x.astype(np.complex128), axis=-1)
    rmag = np.abs(ref) ** 2

    pmax, ibin = plan.call_peak(jnp.asarray(x), mode=mode, interpret=True)
    np.testing.assert_array_equal(np.asarray(ibin), np.argmax(rmag, axis=-1))
    np.testing.assert_allclose(np.asarray(pmax), rmag.max(axis=-1), rtol=tol)


def test_call_peak_batch_shape_preserved():
    plan = get_fft_plan(4096, "complex64")
    rng = np.random.default_rng(3)
    x = (rng.standard_normal((2, 3, 4096))
         + 1j * rng.standard_normal((2, 3, 4096))).astype(np.complex64)
    pmax, ibin = plan.call_peak(jnp.asarray(x), interpret=True)
    assert pmax.shape == (2, 3) and ibin.shape == (2, 3)


def test_fast_xcorr_routes_through_peak_kernel():
    """A tone-shifted template embedded in noise: the fused path must find
    the right shift and frequency bin and report QF2 ~ signal fraction."""
    n = 4096
    rng = np.random.default_rng(11)
    cut = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
           ).astype(np.complex64)
    rx = 0.05 * (rng.standard_normal(n + 64)
                 + 1j * rng.standard_normal(n + 64)).astype(np.complex64)
    f_off = 9
    tone = np.exp(1j * 2 * np.pi * f_off * np.arange(n) / n)
    rx[21:21 + n] += (cut * tone).astype(np.complex64)

    qf2, freqs = fast_xcorr(jnp.asarray(cut), jnp.asarray(rx),
                            freqsearch=True)
    qf2 = np.asarray(qf2)
    i = int(np.argmax(qf2))
    assert i == 21
    assert int(np.asarray(freqs)[i]) == f_off
    assert qf2[i] > 0.98

    # at f32 precision the fused path agrees with the spectrum-materializing
    # CAF path to float tolerance (default "bf16" is peak-search grade)
    qf2_f32, _ = fast_xcorr(jnp.asarray(cut), jnp.asarray(rx),
                            freqsearch=True, precision="f32")
    qf2_caf = np.asarray(fast_xcorr(
        jnp.asarray(cut), jnp.asarray(rx), freqsearch=True, output_caf=True))
    np.testing.assert_allclose(np.asarray(qf2_f32), qf2_caf.max(axis=-1),
                               rtol=1e-4)
    np.testing.assert_allclose(qf2, qf2_caf.max(axis=-1), rtol=2e-2)


@pytest.mark.parametrize("mode", ["bf16", "bf16x3", "f32"])
def test_fast_xcorr_precision_knob(mode):
    n = 4096
    rng = np.random.default_rng(5)
    cut = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
           ).astype(np.complex64)
    rx = np.roll(np.pad(cut, (0, 32)), 7).astype(np.complex64)
    qf2, freqs = fast_xcorr(jnp.asarray(cut), jnp.asarray(rx),
                            freqsearch=True, precision=mode)
    assert int(np.argmax(np.asarray(qf2))) == 7
    assert int(np.asarray(freqs)[7]) == 0


@pytest.mark.parametrize("factors", [[32, 16, 16], [8, 8, 8, 8]])
@pytest.mark.parametrize("mode,tol", [("bf16", 5e-3), ("f32", 5e-6)])
def test_call_peak_multistage_matches_fft_argmax(factors, mode, tol):
    """Multi-stage plans route the last two factors through the fused
    kernel and argmax the leading-digit rows in XLA; bins and tie-breaks
    must match the natural-order spectrum argmax."""
    from pydsproutines_tpu.ops.fft import FourStepFFT
    n = int(np.prod(factors))
    plan = FourStepFFT(n, factors=list(factors))
    assert plan.viable and plan.peak_viable(mode)
    rng = np.random.default_rng(13)
    x = (rng.standard_normal((3, n))
         + 1j * rng.standard_normal((3, n))).astype(np.complex64)
    # plant distinct peaks so bf16 noise cannot flip the winner
    for r, k in enumerate([5, n // 2 + 3, n - 17]):
        x[r] += 40.0 * np.exp(2j * np.pi * k * np.arange(n) / n)
    ref = np.fft.fft(x.astype(np.complex128), axis=-1)
    rmag = np.abs(ref) ** 2

    pmax, ibin = plan.call_peak(jnp.asarray(x), mode=mode, interpret=True)
    np.testing.assert_array_equal(np.asarray(ibin), np.argmax(rmag, axis=-1))
    np.testing.assert_allclose(np.asarray(pmax), rmag.max(axis=-1), rtol=tol)


def test_call_peak_multistage_device_gen_plan():
    """A plan big enough to trigger on-device matrix generation still
    supports the fused peak path (host-side last-stage constants)."""
    from pydsproutines_tpu.ops.fft import FourStepFFT
    n = 40 * 32 * 32
    plan = FourStepFFT(n, factors=[40, 32, 32])
    plan.device_gen = True   # force the in-trace matrix path
    plan.stage_w = plan.stage_tw = None
    assert plan.peak_viable("bf16")
    rng = np.random.default_rng(29)
    x = (rng.standard_normal((2, n))
         + 1j * rng.standard_normal((2, n))).astype(np.complex64)
    x[0] += 30.0 * np.exp(2j * np.pi * 1234 * np.arange(n) / n)
    x[1] += 30.0 * np.exp(2j * np.pi * (n - 5) * np.arange(n) / n)
    ref = np.fft.fft(x.astype(np.complex128), axis=-1)
    rmag = np.abs(ref) ** 2
    pmax, ibin = plan.call_peak(jnp.asarray(x), interpret=True)
    np.testing.assert_array_equal(np.asarray(ibin), np.argmax(rmag, axis=-1))
    np.testing.assert_allclose(np.asarray(pmax), rmag.max(axis=-1), rtol=5e-3)


@pytest.mark.parametrize("factors", [[32, 16, 16], [8, 8, 8, 8]])
@pytest.mark.parametrize("mode,tol", [("bf16", 2e-2), ("f32", 5e-6)])
def test_call_peak_planes_matches_fft_argmax(factors, mode, tol):
    """The planes fast path (bf16 inter-stage storage) must agree with the
    natural-order spectrum argmax on planted peaks."""
    from pydsproutines_tpu.ops.fft import FourStepFFT
    n = int(np.prod(factors))
    plan = FourStepFFT(n, factors=list(factors))
    rng = np.random.default_rng(17)
    x = (rng.standard_normal((3, n))
         + 1j * rng.standard_normal((3, n))).astype(np.complex64)
    for r, k in enumerate([2, n // 3, n - 9]):
        x[r] += 50.0 * np.exp(2j * np.pi * k * np.arange(n) / n)
    ref = np.fft.fft(x.astype(np.complex128), axis=-1)
    rmag = np.abs(ref) ** 2

    pmax, ibin = plan.call_peak_planes(
        jnp.asarray(x.real), jnp.asarray(x.imag), mode=mode, interpret=True)
    np.testing.assert_array_equal(np.asarray(ibin), np.argmax(rmag, axis=-1))
    np.testing.assert_allclose(np.asarray(pmax), rmag.max(axis=-1), rtol=tol)


def test_call_peak_planes_device_gen():
    from pydsproutines_tpu.ops.fft import FourStepFFT
    n = 40 * 32 * 32
    plan = FourStepFFT(n, factors=[40, 32, 32])
    plan.device_gen = True
    plan.stage_w = plan.stage_tw = None
    rng = np.random.default_rng(23)
    x = (rng.standard_normal((2, n))
         + 1j * rng.standard_normal((2, n))).astype(np.complex64)
    x[0] += 40.0 * np.exp(2j * np.pi * 999 * np.arange(n) / n)
    x[1] += 40.0 * np.exp(2j * np.pi * 3 * np.arange(n) / n)
    ref = np.fft.fft(x.astype(np.complex128), axis=-1)
    rmag = np.abs(ref) ** 2
    pmax, ibin = plan.call_peak_planes(
        jnp.asarray(x.real), jnp.asarray(x.imag), interpret=True)
    np.testing.assert_array_equal(np.asarray(ibin), np.argmax(rmag, axis=-1))
    np.testing.assert_allclose(np.asarray(pmax), rmag.max(axis=-1), rtol=2e-2)
