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


def test_sharded_wola_nontrivial_geometry(mesh, rng):
    """Realistic tap counts: the halo spans MANY output rows (jump = 162
    rows, taps = 81*N) with N == 2*Dec, and each device owns an ODD number
    of output rows (163), so shard boundaries land on alternating parities —
    the odd-row phase flip must stay globally consistent across every one."""
    Dec, N = 8, 16
    taps = 81 * N                   # jump = 1296/8 = 162 rows
    f_tap = sps.firwin(taps, 1.0 / Dec).astype(np.float32)
    nsamp = 8 * Dec * 163           # 163 rows per device (odd)
    x = (rng.standard_normal(nsamp)
         + 1j * rng.standard_normal(nsamp)).astype(np.complex64)
    ref = np.asarray(wola(jnp.asarray(f_tap), jnp.asarray(x), Dec, N))
    ours = np.asarray(sharded_wola(jnp.asarray(f_tap), jnp.asarray(x),
                                   Dec, N, mesh))
    assert ours.shape == ref.shape
    assert np.max(np.abs(ours - ref)) < 1e-4


def test_sharded_multichannel_wola(mesh, rng):
    """Independent captures sharded over the channel axis (the reference's
    channel-striped threading, multiChannelWola.c:79)."""
    from pydsproutines_tpu.parallel import sharded_multichannel_wola
    Dec = N = 8
    f_tap = sps.firwin(8 * N, 1.0 / Dec).astype(np.float32)
    x = (rng.standard_normal((16, 1024))
         + 1j * rng.standard_normal((16, 1024))).astype(np.complex64)
    ref = np.stack([np.asarray(wola(jnp.asarray(f_tap), jnp.asarray(r),
                                    Dec, N)) for r in x])
    ours = np.asarray(sharded_multichannel_wola(
        jnp.asarray(f_tap), jnp.asarray(x), Dec, N, mesh))
    assert ours.shape == ref.shape
    assert np.max(np.abs(ours - ref)) < 1e-4


def test_sharded_group_xcorr_czt(mesh, rng):
    from pydsproutines_tpu.ops.groupxcorr import GroupXcorrCZT
    from pydsproutines_tpu.parallel import (sharded_group_xcorr_czt,
                                            sharded_group_xcorr_peak)
    fs = 1e5
    glen, m = 128, 4
    starts = np.arange(m) * 512
    lengths = np.full(m, glen)
    span = int(starts[-1] + glen)
    y = (rng.standard_normal(span)
         + 1j * rng.standard_normal(span)).astype(np.complex64)
    rx = (0.05 * (rng.standard_normal(span + 300)
                  + 1j * rng.standard_normal(span + 300))).astype(np.complex64)
    true_shift = 123
    rx[true_shift: true_shift + span] += y
    bw = fs / glen / 2
    gx = GroupXcorrCZT(y, starts, lengths, -8 * bw, 7 * bw, bw, fs)
    shifts = np.arange(64, 64 + 128)

    ref_caf, _ = gx.xcorr(jnp.asarray(rx), jnp.asarray(shifts))
    caf, freqs = sharded_group_xcorr_czt(gx, jnp.asarray(rx),
                                         jnp.asarray(shifts), mesh)
    assert np.allclose(np.asarray(caf), np.asarray(ref_caf), rtol=1e-4,
                       atol=1e-7)

    peak, sbest, fbest = sharded_group_xcorr_peak(
        gx, jnp.asarray(rx), jnp.asarray(shifts), mesh)
    r = np.asarray(ref_caf)
    i, j = np.unravel_index(np.argmax(r), r.shape)
    assert int(sbest) == int(shifts[i]) == true_shift
    assert int(fbest) == int(j)
    assert float(peak) == pytest.approx(float(r[i, j]), rel=1e-5)


def test_sharded_group_xcorr_fft(mesh, rng):
    from pydsproutines_tpu.ops.groupxcorr import GroupXcorrFFT
    from pydsproutines_tpu.parallel import sharded_group_xcorr_fft
    fs = 1e5
    glen, m = 64, 3
    starts = np.arange(m) * 256
    ygroups = (rng.standard_normal((m, glen))
               + 1j * rng.standard_normal((m, glen))).astype(np.complex64)
    rx = (rng.standard_normal(1500)
          + 1j * rng.standard_normal(1500)).astype(np.complex64)
    gx = GroupXcorrFFT(ygroups, starts, fs)
    shifts = np.arange(32, 32 + 64)
    ref = gx.xcorr(jnp.asarray(rx), jnp.asarray(shifts))
    ours = sharded_group_xcorr_fft(gx, jnp.asarray(rx), jnp.asarray(shifts),
                                   mesh)
    assert np.allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4,
                       atol=1e-7)
