"""Tests for MUSIC, cyclostationary estimators, matrix profile, cancellation,
and min-max scaling."""

import jax
import jax.numpy as jnp
import numpy as np

from pydsproutines_tpu.ops.music import (
    snapshot_matrix, covariance, music_alg, MUSIC, CAPON, ESPRIT)
from pydsproutines_tpu.ops.cyclostationary import (
    PSKOrderDetector, estimate_baud, estimate_offset_via_cm)
from pydsproutines_tpu.ops.matrixprofile import MatrixProfile, matrix_profile
from pydsproutines_tpu.ops.cancellation import cancel_signal_at_idx
from pydsproutines_tpu.ops.minmax import multichannel_minmax_scale
from pydsproutines_tpu.signal import rand_psk_syms, syms_from_bits, rand_bits


def _two_tone(n=2000, f1=0.1, f2=0.13, snr=1e3):
    rng = np.random.default_rng(5)
    t = np.arange(n)
    x = (np.exp(2j * np.pi * f1 * t) + np.exp(2j * np.pi * f2 * t)
         + np.sqrt(1 / snr) * (rng.standard_normal(n)
                               + 1j * rng.standard_normal(n)))
    return x


def test_snapshot_matrix_modes():
    x = np.arange(6)
    m = snapshot_matrix(x, 2)
    assert np.array_equal(m, [[0, 2, 4], [1, 3, 5]])
    m2 = snapshot_matrix(x, 2, snapshot_jump=1)
    assert np.array_equal(m2, [[0, 1, 2, 3, 4], [1, 2, 3, 4, 5]])


def test_covariance_fwd_bwd_hermitian():
    x = _two_tone()
    rx = covariance(x, 16, fwd_bwd=True)
    assert np.allclose(rx, rx.conj().T, atol=1e-9)


def test_music_resolves_two_tones():
    x = _two_tone()
    freqlist = np.arange(0.05, 0.2, 1e-3)
    f, u, s, vh = music_alg(x, freqlist * 2, 32, 2, snapshot_jump=1)
    # note: freqs normalized to cycles/sample*2 in reference convention
    # (freqlist vs arange(rows) — e^{-j2pi f n}); use direct normalized freq
    f2, *_ = music_alg(x, freqlist, 32, 2, snapshot_jump=1)
    peaks, ph = MUSIC.pick_peaks(f2, 2)
    found = np.sort(freqlist[peaks])
    assert abs(found[0] - 0.1) < 2e-3
    assert abs(found[1] - 0.13) < 2e-3


def test_music_class_and_signal_numerator():
    x = _two_tone()
    freqlist = np.arange(0.05, 0.2, 1e-3)
    m = MUSIC(rows=32, snapshot_jump=1)
    f, u, s, vh, rx = m.run(x, freqlist, 2, use_signal_as_numerator=True)
    peaks, _ = MUSIC.pick_peaks(f, 2)
    found = np.sort(freqlist[peaks])
    assert abs(found[0] - 0.1) < 2e-3 and abs(found[1] - 0.13) < 2e-3


def test_capon_spectrum():
    x = _two_tone(snr=100)
    freqlist = np.arange(0.05, 0.2, 1e-3)
    c = CAPON(rows=24, snapshot_jump=1)
    f, rx = c.run(x, freqlist)
    mag = np.abs(f)
    top2 = np.sort(freqlist[np.argsort(mag)[-6:]])
    assert np.any(np.abs(top2 - 0.1) < 3e-3)
    assert np.any(np.abs(top2 - 0.13) < 3e-3)


def test_esprit_frequencies():
    x = _two_tone(snr=1e4)
    e = ESPRIT(rows=16, snapshot_jump=1)
    freqs, *_ = e.run(x, 2, fs=1.0)
    freqs = np.sort(freqs)
    assert abs(freqs[0] - 0.1) < 2e-3
    assert abs(freqs[1] - 0.13) < 2e-3


def test_psk_order_detector(key):
    ks = jax.random.split(key, 3)
    sigs = []
    for i, m in enumerate((2, 4, 8)):
        s, _ = rand_psk_syms(ks[i], 4096, m, dtype=jnp.complex64)
        sigs.append(np.asarray(s))
    # max_m=4 distinguishes BPSK vs QPSK (the reference's later iterations
    # overwrite earlier assignments, so pure BPSK under max_m=8 reads as 4 —
    # reference semantics, cyclostationaryRoutines.py:109-121)
    det4 = PSKOrderDetector(max_m=4)
    order4 = det4.estimate_order(jnp.asarray(np.stack(sigs[:2])))
    assert np.array_equal(order4, [2, 4])
    det8 = PSKOrderDetector(max_m=8)
    order8 = det8.estimate_order(jnp.asarray(np.stack(sigs[1:])))
    assert np.array_equal(order8, [4, 8])


def test_estimate_baud():
    # rectangular-pulse BPSK at osr 8 -> |x| cyclic peaks at +-baud
    rng = np.random.default_rng(2)
    bits = rng.integers(0, 2, 512)
    up = 8
    fs = 1.0
    baud = fs / up
    # shaped with a root-raised-cosine-ish ramp to create amplitude cyclo-
    # stationarity; simple half-sine pulse works
    pulse = np.sin(np.pi * np.arange(up) / up)
    x = np.zeros(512 * up)
    x[::up] = bits * 2.0 - 1.0
    x = np.convolve(x, pulse)[: 512 * up].astype(complex)
    est, i1, i2, Xf, freq = estimate_baud(x, fs)
    assert abs(est - baud) / baud < 0.05


def test_estimate_offset_via_cm(key):
    s, _ = rand_psk_syms(key, 8192, 4, dtype=jnp.complex64)
    f_true = 0.012
    x = np.asarray(s) * np.exp(2j * np.pi * f_true * np.arange(8192))
    off = float(estimate_offset_via_cm(jnp.asarray(x.astype(np.complex64)),
                                       1.0, 4))
    assert abs(off - f_true) < 1e-3


def _np_matrix_profile_reference(x, window, num_diags):
    power = np.abs(x) ** 2
    norms = np.convolve(power, np.ones(window), mode="valid")
    rows = []
    for d in range(1, num_diags + 1):
        s1, s2 = x[:-d], x[d:]
        pdt = s1 * s2.conj()
        kdiag = np.convolve(pdt, np.ones(window), mode="valid")
        kdiag = np.abs(kdiag) ** 2 / norms[:-d] / norms[d:]
        rows.append(kdiag)
    return rows


def test_matrix_profile_matches_reference(rng):
    x = (rng.standard_normal(128) + 1j * rng.standard_normal(128))
    W, D = 8, 20
    mp = np.asarray(matrix_profile(jnp.asarray(x), W, D))
    ref = _np_matrix_profile_reference(x, W, D)
    for d in range(D):
        row = mp[d]
        assert np.allclose(row[: len(ref[d])], ref[d], atol=1e-9), d
        assert np.allclose(row[len(ref[d]):], 0)


def test_matrix_profile_finds_repeat(key):
    """A repeated motif produces a near-1 profile value at the right diagonal
    and offset."""
    s, _ = rand_psk_syms(key, 32, 4, dtype=jnp.complex128)
    rng = np.random.default_rng(1)
    x = 0.05 * (rng.standard_normal(256) + 1j * rng.standard_normal(256))
    x[10:42] += np.asarray(s)
    x[110:142] += np.asarray(s)
    mpo = MatrixProfile(window_length=32, output_chains=True,
                        min_threshold=0.5)
    chains = mpo.compute(jnp.asarray(x))
    # the repeat is at diagonal 100, offset 10
    assert any(d == 100 and start <= 10 < end for d, start, end in chains)


def test_cancel_signal_at_idx(key):
    s, _ = rand_psk_syms(key, 100, 4, dtype=jnp.complex128)
    rng = np.random.default_rng(0)
    rx = 0.1 * (rng.standard_normal(300) + 1j * rng.standard_normal(300))
    amp_true = 2.0 * np.exp(1j * 0.7)
    rx[50:150] += amp_true * np.asarray(s)
    cancelled, amp = cancel_signal_at_idx(s, jnp.asarray(rx), 50)
    assert abs(complex(amp) - amp_true) < 0.05
    resid = np.linalg.norm(np.asarray(cancelled)[50:150])
    before = np.linalg.norm(rx[50:150])
    assert resid < 0.2 * before


def test_multichannel_minmax_scale(rng):
    ch = (rng.standard_normal((4, 100)) + 1j * rng.standard_normal((4, 100)))
    scaled = np.asarray(multichannel_minmax_scale(jnp.asarray(ch)))
    assert scaled.shape == (4, 100)
    assert np.all(scaled >= 0) and np.all(scaled <= 1 + 1e-6)
    for row in scaled:
        assert abs(row.min()) < 1e-6 and abs(row.max() - 1) < 1e-6
    # phase-preserving variant keeps angles
    scaled_c = np.asarray(multichannel_minmax_scale(jnp.asarray(ch),
                                                    preserve_phase=True))
    mask = np.abs(ch) > 0
    assert np.allclose(np.angle(scaled_c[mask] / ch[mask]), 0, atol=1e-5)


class TestMaskedOps:
    """maskedaccess.cu equivalents (VERDICT round 1: unmapped)."""

    def test_multiply_only_masked_rows(self, rng):
        from pydsproutines_tpu.ops.masked import multiply_only_masked_rows
        x = (rng.standard_normal((6, 16))
             + 1j * rng.standard_normal((6, 16))).astype(np.complex64)
        y = (rng.standard_normal((6, 16))
             + 1j * rng.standard_normal((6, 16))).astype(np.complex64)
        mask = np.array([1, 0, 1, 1, 0, 2], np.int32)
        out = np.asarray(multiply_only_masked_rows(
            jnp.asarray(mask), jnp.asarray(x), jnp.asarray(y)))
        for i in range(6):
            ref = x[i] * y[i] if mask[i] == 1 else x[i]
            np.testing.assert_allclose(out[i], ref, rtol=1e-6)

    def test_multiply_rows_based_on_mask(self, rng):
        from pydsproutines_tpu.ops.masked import multiply_rows_based_on_mask
        x, y0, y1 = [(rng.standard_normal((5, 8))
                      + 1j * rng.standard_normal((5, 8))).astype(np.complex64)
                     for _ in range(3)]
        mask = np.array([0, 1, 1, 0, 1], np.int32)
        out = np.asarray(multiply_rows_based_on_mask(
            jnp.asarray(mask), jnp.asarray(x), jnp.asarray(y0),
            jnp.asarray(y1)))
        for i in range(5):
            np.testing.assert_allclose(out[i],
                                       x[i] * (y1[i] if mask[i] else y0[i]),
                                       rtol=1e-6)

    def test_multiply_masked_rows_gathered(self, rng):
        from pydsproutines_tpu.ops.masked import multiply_masked_rows_gathered
        x = (rng.standard_normal((8, 4))
             + 1j * rng.standard_normal((8, 4))).astype(np.complex64)
        y = np.ones_like(x) * 2
        mask = np.array([0, 1, 0, 1, 1, 0, 0, 0], np.int32)
        rows, count = multiply_masked_rows_gathered(
            jnp.asarray(mask), jnp.asarray(x), jnp.asarray(y), capacity=4)
        assert int(count) == 3
        got = np.asarray(rows)
        np.testing.assert_allclose(got[:3], 2 * x[[1, 3, 4]], rtol=1e-6)
        np.testing.assert_array_equal(got[3:], 0)


def test_music_xcorr_device_matches_host(rng):
    """The device-batched covariance path reproduces the host numpy
    music_xcorr grid (VERDICT round 1: MUSIC never touched the TPU)."""
    from pydsproutines_tpu.ops.music import music_xcorr, music_xcorr_device
    fs = 1e4
    dsr = 4
    n = 512 + 16        # (n - taps//2) divisible by dsr (parity precondition)
    f0 = 300.0
    t = np.arange(n) / fs
    cutout = np.exp(2j * np.pi * 100.0 * t).astype(np.complex64)
    rx = np.zeros(n + 32, dtype=np.complex64)
    rx[8: 8 + n] = cutout * np.exp(2j * np.pi * f0 * t)
    rx += 0.01 * (rng.standard_normal(n + 32)
                  + 1j * rng.standard_normal(n + 32))
    import scipy.signal as sps
    ftap = sps.firwin(32, 0.8 / dsr).astype(np.float32)
    f_search = np.linspace(200.0, 400.0, 21)
    shifts = np.arange(6, 11)
    rows = 32
    host = music_xcorr(cutout, rx, f_search, ftap, fs, dsr, [1],
                       musicrows=rows, shifts=shifts)
    dev = music_xcorr_device(cutout, rx, f_search, ftap, fs, dsr, [1],
                             musicrows=rows, shifts=shifts)
    np.testing.assert_allclose(dev[1], host[1], rtol=2e-2, atol=1e-3
                               * np.max(np.abs(host[1])))
    # and the grid peaks at the planted doppler at the true shift
    i, j = np.unravel_index(np.argmax(dev[1]), dev[1].shape)
    assert shifts[i] == 8
    assert abs(f_search[j] - f0) <= 10.0


def test_music_device_eig_matches_host_svd(rng):
    """On-device vmapped eigh == per-shift host np.linalg.svd on the SAME
    covariances (round-2 review #7: remove the host SVD round-trip). The
    pseudospectrum depends only on subspace projectors, so eigenvector
    basis/phase freedom cancels."""
    from pydsproutines_tpu.ops.music import music_xcorr_device
    fs = 1e4
    dsr = 4
    n = 512 + 16
    t = np.arange(n) / fs
    cutout = np.exp(2j * np.pi * 100.0 * t).astype(np.complex64)
    rx = np.zeros(n + 32, dtype=np.complex64)
    # two distinct-power dopplers: the p=1 AND p=2 signal subspaces are then
    # both well-separated from the noise cluster (with a single signal, the
    # second "signal" eigenvector is an arbitrary noise direction and svd vs
    # eigh legitimately disagree)
    rx[8: 8 + n] = cutout * (np.exp(2j * np.pi * 300.0 * t)
                             + 0.5 * np.exp(2j * np.pi * 360.0 * t))
    rx += 0.01 * (rng.standard_normal(n + 32)
                  + 1j * rng.standard_normal(n + 32))
    import scipy.signal as sps
    ftap = sps.firwin(32, 0.8 / dsr).astype(np.float32)
    f_search = np.linspace(200.0, 400.0, 21)
    shifts = np.arange(6, 11)
    kw = dict(musicrows=32, shifts=shifts)
    for p in ([1], [1, 2]):
        dev = music_xcorr_device(cutout, rx, f_search, ftap, fs, dsr, p, **kw)
        host = music_xcorr_device(cutout, rx, f_search, ftap, fs, dsr, p,
                                  eig_on_device=False, **kw)
        for pi in p:
            # the pseudospectrum peak divides by a near-zero noise
            # projection, so its VALUE is ill-conditioned in c64; the
            # inverse grid is the well-conditioned quantity to compare,
            # and the peak location must agree exactly
            np.testing.assert_allclose(
                1.0 / dev[pi], 1.0 / host[pi], rtol=1e-3,
                atol=1e-6 * np.max(1.0 / host[pi]))
            assert (np.unravel_index(np.argmax(dev[pi]), dev[pi].shape)
                    == np.unravel_index(np.argmax(host[pi]), host[pi].shape))
