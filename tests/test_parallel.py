import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal as sps

from pydsproutines_tpu.parallel import (
    make_mesh,
    sharded_fast_xcorr,
    sharded_caf_peak,
    sharded_lfilter,
    sharded_wola,
)
from pydsproutines_tpu.ops import fast_xcorr, lfilter_fir, wola
from pydsproutines_tpu.signal import rand_psk_syms, add_sig_to_noise


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh((8,), ("dsp",))


def _scene(key, n_cutout=256, n_rx=2048, start=777, fshift=0.021):
    k1, k2 = jax.random.split(key)
    syms, _ = rand_psk_syms(k1, n_cutout, 4, dtype=jnp.complex64)
    _, rx = add_sig_to_noise(k2, syms, noise_len=n_rx, sig_start_idx=start,
                             snr_inband_linear=10.0, fshift=fshift)[:2]
    return syms, rx


def test_sharded_fast_xcorr_matches_single(mesh, key):
    cutout, rx = _scene(key)
    shifts = jnp.arange(640, 920)  # 280 shifts, 35 per device
    ref_qf2, ref_freq = fast_xcorr(cutout, rx, freqsearch=True, shifts=shifts)
    qf2, freqs = sharded_fast_xcorr(cutout, rx, shifts, mesh)
    assert np.allclose(np.asarray(qf2), np.asarray(ref_qf2), rtol=1e-5)
    assert np.array_equal(np.asarray(freqs), np.asarray(ref_freq))


def test_sharded_caf_peak(mesh, key):
    cutout, rx = _scene(key, start=777)
    shifts = jnp.arange(640, 896)
    peak, best_shift, best_bin = sharded_caf_peak(cutout, rx, shifts, mesh)
    ref_qf2, ref_freq = fast_xcorr(cutout, rx, freqsearch=True, shifts=shifts)
    i = int(np.argmax(np.asarray(ref_qf2)))
    assert int(best_shift) == 640 + i == 777
    assert float(peak) == pytest.approx(float(ref_qf2[i]), rel=1e-5)
    assert int(best_bin) == int(ref_freq[i])


def test_sharded_lfilter_matches_single(mesh, rng):
    taps = sps.firwin(63, 0.2).astype(np.float32)
    x = (rng.standard_normal(4096) + 1j * rng.standard_normal(4096)).astype(np.complex64)
    ref = np.asarray(lfilter_fir(jnp.asarray(taps), jnp.asarray(x)))
    ours = np.asarray(sharded_lfilter(jnp.asarray(taps), jnp.asarray(x), mesh))
    assert np.max(np.abs(ours - ref)) < 1e-4


def test_sharded_wola_matches_single_n_eq_dec(mesh, rng):
    N = Dec = 8
    f_tap = sps.firwin(8 * N, 1.0 / Dec).astype(np.float32)
    x = (rng.standard_normal(4096) + 1j * rng.standard_normal(4096)).astype(np.complex64)
    ref = np.asarray(wola(jnp.asarray(f_tap), jnp.asarray(x), Dec, N))
    ours = np.asarray(sharded_wola(jnp.asarray(f_tap), jnp.asarray(x), Dec, N, mesh))
    assert ours.shape == ref.shape
    assert np.max(np.abs(ours - ref)) < 1e-4


def test_sharded_wola_matches_single_n_eq_2dec(mesh, rng):
    Dec, N = 4, 8
    f_tap = sps.firwin(4 * N, 1.0 / Dec).astype(np.float32)
    x = (rng.standard_normal(2048) + 1j * rng.standard_normal(2048)).astype(np.complex64)
    ref = np.asarray(wola(jnp.asarray(f_tap), jnp.asarray(x), Dec, N))
    ours = np.asarray(sharded_wola(jnp.asarray(f_tap), jnp.asarray(x), Dec, N, mesh))
    assert np.max(np.abs(ours - ref)) < 1e-4


def test_sharded_wola_2d_mesh_axis(key, rng):
    """Sharding must also work on one axis of a 2-D mesh."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh2 = make_mesh((2, 4), ("time", "shifts"))
    N = Dec = 4
    f_tap = sps.firwin(4 * N, 1.0 / Dec).astype(np.float32)
    x = (rng.standard_normal(1024) + 1j * rng.standard_normal(1024)).astype(np.complex64)
    ref = np.asarray(wola(jnp.asarray(f_tap), jnp.asarray(x), Dec, N))
    ours = np.asarray(sharded_wola(jnp.asarray(f_tap), jnp.asarray(x),
                                   Dec, N, mesh2, axis="time"))
    assert np.max(np.abs(ours - ref)) < 1e-4
