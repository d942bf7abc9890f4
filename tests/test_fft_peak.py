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
