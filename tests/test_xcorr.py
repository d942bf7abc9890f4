import jax
import jax.numpy as jnp
import numpy as np

from pydsproutines_tpu.ops import (
    fast_xcorr,
    czt_xcorr,
    calc_qf2,
    fine_freq_time_search,
    convert_qf2_to_snr,
    convert_qf2_to_eff_snr,
    convert_eff_snr_to_qf2,
    expected_eff_snr,
    theoretical_multi_peak,
    argmax2d,
)
from pydsproutines_tpu.signal import rand_psk_syms, add_sig_to_noise


def _np_fast_xcorr_freqscan(cutout, rx, shifts):
    """Reference semantics re-derived in numpy (xcorrRoutines.py:460)."""
    cutoutNormSq = np.linalg.norm(cutout) ** 2
    result = np.zeros(len(shifts))
    freqlist = np.zeros(len(shifts), dtype=np.uint32)
    for i, s in enumerate(shifts):
        sl = rx[s: s + len(cutout)]
        pdt = sl * cutout.conj()
        pdtfft = np.fft.fft(pdt)
        mag = np.abs(pdtfft) ** 2
        imax = np.argmax(mag)
        freqlist[i] = imax
        result[i] = mag[imax] / cutoutNormSq / (np.linalg.norm(sl) ** 2)
    return result, freqlist


def _make_scene(key, n_cutout=256, n_rx=1024, start=300, fshift=0.0213,
                snr=10.0, m=4):
    k1, k2 = jax.random.split(key)
    syms, _ = rand_psk_syms(k1, n_cutout, m, dtype=jnp.complex128)
    _, rx = add_sig_to_noise(k2, syms, noise_len=n_rx, sig_start_idx=start,
                             snr_inband_linear=snr, fshift=fshift)[:2]
    return np.asarray(syms), np.asarray(rx)


def test_fast_xcorr_freqsearch_parity(key):
    cutout, rx = _make_scene(key)
    shifts = np.arange(200, 400)
    ours_qf2, ours_freq = fast_xcorr(
        jnp.asarray(cutout), jnp.asarray(rx), freqsearch=True,
        shifts=jnp.asarray(shifts), batch_size=64)
    ref_qf2, ref_freq = _np_fast_xcorr_freqscan(cutout, rx, shifts)
    assert np.max(np.abs(np.asarray(ours_qf2) - ref_qf2)) < 1e-9
    assert np.array_equal(np.asarray(ours_freq), ref_freq)
    # Peak should be at the true start index
    assert shifts[np.argmax(np.asarray(ours_qf2))] == 300


def test_fast_xcorr_no_freqsearch(key):
    cutout, rx = _make_scene(key, fshift=0.0)
    shifts = np.arange(280, 320)
    ours = np.asarray(fast_xcorr(jnp.asarray(cutout), jnp.asarray(rx),
                                 shifts=jnp.asarray(shifts)))
    cutoutNormSq = np.linalg.norm(cutout) ** 2
    ref = np.array([
        np.abs(np.vdot(rx[s: s + len(cutout)], cutout)) ** 2
        / cutoutNormSq / np.linalg.norm(rx[s: s + len(cutout)]) ** 2
        for s in shifts
    ])
    assert np.max(np.abs(ours - ref)) < 1e-9
    assert shifts[np.argmax(ours)] == 300


def test_fast_xcorr_complex_result(key):
    cutout, rx = _make_scene(key, fshift=0.0)
    shifts = np.arange(295, 305)
    ours = np.asarray(fast_xcorr(jnp.asarray(cutout), jnp.asarray(rx),
                                 shifts=jnp.asarray(shifts), abs_result=False))
    ref = np.array([
        np.vdot(rx[s: s + len(cutout)], cutout)
        / np.linalg.norm(cutout) / np.linalg.norm(rx[s: s + len(cutout)])
        for s in shifts
    ])
    assert np.max(np.abs(ours - ref)) < 1e-9


def test_fast_xcorr_caf_output(key):
    cutout, rx = _make_scene(key, n_cutout=64, n_rx=256, start=100)
    shifts = np.arange(90, 110)
    caf = np.asarray(fast_xcorr(jnp.asarray(cutout), jnp.asarray(rx),
                                freqsearch=True, output_caf=True,
                                shifts=jnp.asarray(shifts)))
    assert caf.shape == (len(shifts), len(cutout))
    si, fi = np.unravel_index(np.argmax(caf), caf.shape)
    assert shifts[si] == 100


def test_fast_xcorr_default_shifts_and_odd_batch(key):
    cutout, rx = _make_scene(key, n_cutout=32, n_rx=100, start=40, fshift=0.0)
    out = np.asarray(fast_xcorr(jnp.asarray(cutout), jnp.asarray(rx),
                                batch_size=7))
    assert out.shape == (100 - 32 + 1,)
    assert np.argmax(out) == 40


def test_czt_xcorr_finds_freq_offset(key):
    fs = 1.0
    f_true = 0.0213
    cutout, rx = _make_scene(key, fshift=f_true, snr=100.0)
    # remove the shift from the template: cutout is unshifted syms, rx has tone
    shifts = np.arange(295, 306)
    vals, freqs = czt_xcorr(jnp.asarray(cutout), jnp.asarray(rx),
                            f_search_min=0.0, f_search_max=0.05, fs=fs,
                            czt_step=1e-3, shifts=jnp.asarray(shifts))
    vals = np.asarray(vals)
    freqs = np.asarray(freqs)
    i = np.argmax(np.abs(vals))
    assert shifts[i] == 300
    # the rx tone starts at phase 0 of the *rx*, frequency found should be close
    assert abs(freqs[i] - f_true) < 2e-3


def test_czt_xcorr_caf(key):
    cutout, rx = _make_scene(key, n_cutout=128, n_rx=512, start=200,
                             fshift=0.01, snr=100.0)
    shifts = np.arange(195, 206)
    caf, f_search = czt_xcorr(jnp.asarray(cutout), jnp.asarray(rx),
                              f_search_min=-0.02, f_search_max=0.02, fs=1.0,
                              czt_step=1e-3, output_caf=True,
                              shifts=jnp.asarray(shifts))
    caf = np.asarray(caf)
    si, fi = np.unravel_index(np.argmax(caf), caf.shape)
    assert shifts[si] == 200
    assert abs(np.asarray(f_search)[fi] - 0.01) < 2e-3


def test_fine_freq_time_search(key):
    """Sub-sample alignment: y is x delayed by a fraction of a sample."""
    from pydsproutines_tpu.signal import propagate_signal

    n = 1024
    fs = 1.0
    k1, _ = jax.random.split(key)
    syms, _ = rand_psk_syms(k1, n, 4, dtype=jnp.complex128)
    tau = 0.31  # samples (= seconds at fs=1)
    y = propagate_signal(syms, tau, fs)
    td_scan = jnp.asarray(np.arange(-1.0, 1.0, 0.01))
    ff, td, cost = fine_freq_time_search(
        syms, y, [], 0.0, 0.0, fs, td_scan)
    # convention: y later than x -> positive timediff
    assert abs(float(td) - tau) < 0.01 + 1e-9


def test_fine_freq_search_finds_offset(key):
    n = 2048
    fs = 1.0
    k1, _ = jax.random.split(key)
    syms, _ = rand_psk_syms(k1, n, 4, dtype=jnp.complex128)
    f_true = 0.00123
    nn = np.arange(n)
    x = np.asarray(syms)
    y = x * np.exp(1j * 2 * np.pi * f_true * nn / fs)  # y has extra tone
    td_scan = jnp.asarray(np.arange(-0.5, 0.5, 0.05))
    ff, td, cost = fine_freq_time_search(
        jnp.asarray(x), jnp.asarray(y), [1e-4, 1e-5], 0.0, 0.005, fs, td_scan)
    # convention (matches reference): freqfound is the tone on y relative to x
    assert abs(float(ff) - f_true) < 1e-4


def test_qf2_conversions():
    qf2 = 0.5
    assert np.isclose(convert_qf2_to_snr(qf2), 1.0)
    assert np.isclose(convert_qf2_to_eff_snr(qf2), 2.0)
    assert np.isclose(convert_eff_snr_to_qf2(2.0), 0.5)
    # Stein example from reference docstring: 10 linear in-band, pure ref,
    # OSR 2 -> eff SNR = 20/2 = 10
    assert np.isclose(expected_eff_snr(10.0, np.inf, 2), 10.0)


def test_calc_qf2_perfect_match(key):
    syms, _ = rand_psk_syms(key, 512, 4, dtype=jnp.complex128)
    assert np.isclose(float(calc_qf2(syms, syms)), 1.0)
    # 2-D row-wise
    x = jnp.stack([syms, syms * 1j])
    q = np.asarray(calc_qf2(x, x))
    assert np.allclose(q, 1.0)


def test_theoretical_multi_peak():
    u = theoretical_multi_peak([0, 100], [10, 130])
    assert np.array_equal(u, np.unique([10, 30, -90, 130]))
    u, eff = theoretical_multi_peak([0], [10], 1.0, np.array([1.0]))
    assert np.isclose(eff[0], 1 / (0.5 * 3))


def test_argmax2d():
    m = jnp.asarray(np.arange(12).reshape(3, 4))
    i, j = argmax2d(m)
    assert (int(i), int(j)) == (2, 3)


def test_fast_xcorr_freqsearch_parity_large_plan(key):
    """Exercises the matmul-FFT plan path (n >= 4096): permuted-spectrum
    argmax + prefix-sum window energies must match the numpy reference
    exactly in peak bin and to tolerance in QF^2."""
    cutout, rx = _make_scene(key, n_cutout=5000, n_rx=8192, start=1777,
                             fshift=0.0031)
    from pydsproutines_tpu.ops.fft import get_fft_plan
    assert get_fft_plan(5000, "complex128").viable
    shifts = np.arange(1700, 1860)
    ours_qf2, ours_freq = fast_xcorr(
        jnp.asarray(cutout), jnp.asarray(rx), freqsearch=True,
        shifts=jnp.asarray(shifts), batch_size=32)
    ref_qf2, ref_freq = _np_fast_xcorr_freqscan(cutout, rx, shifts)
    assert np.max(np.abs(np.asarray(ours_qf2) - ref_qf2)) < 1e-7
    assert np.array_equal(np.asarray(ours_freq), ref_freq)
    assert shifts[np.argmax(np.asarray(ours_qf2))] == 1777


class TestPathSelection:
    """The compile-time routing of fast_xcorr, exposed via select_xcorr_path
    (VERDICT round 1: silent fused-plan fallbacks must be observable)."""

    def _sel(self, n, rx_len, **kw):
        from pydsproutines_tpu.ops.xcorr import select_xcorr_path
        args = dict(dtype=np.complex64, freqsearch=True, output_caf=False,
                    abs_result=True, batch_size=128, step=1, fft_mode="bf16")
        args.update(kw)
        return select_xcorr_path(n, rx_len, **args)

    def test_fused_for_two_factor_uniform_sweep(self):
        path, reason = self._sel(1_000_000, 1_001_000)
        assert path == "fused" and reason == ""

    def test_fused3_for_multistage_sizes(self):
        # round 5: big composite n with a lane-exact triple (10M =
        # 125*125*640) routes to the three-stage fused chain
        path, reason = self._sel(10_000_000, 10_001_000)
        assert path == "fused3"

    def test_planes_when_no_lane_exact_triple(self):
        # 5^10 has no divisor that is a multiple of 128 -> no fused3
        # triple; the multi-stage XLA planes path remains the fallback
        path, reason = self._sel(5 ** 10, 5 ** 10 + 1000)
        assert path == "planes"
        assert "triple" in reason

    def test_halo_fallback_warns_with_remedy(self):
        # batch*step halo exceeding n2 silently disqualified the fused plan
        # in round 1 — now the reason names the cure
        path, reason = self._sel(1_000_000, 1_300_000, batch_size=256,
                                 step=1000)
        assert path != "fused"
        assert "halo" in reason and "batch_size" in reason

    def test_dot_and_caf_paths(self):
        assert self._sel(4096, 8192, freqsearch=False)[0] == "dot"
        assert self._sel(4096, 8192, output_caf=True)[0] == "caf"

    def test_nonuniform_shifts_fall_back(self):
        path, reason = self._sel(1_000_000, 1_001_000, step=None)
        assert path in ("peak-kernel", "permuted")
        assert "uniform" in reason

    def test_prime_n_is_naive(self):
        path, reason = self._sel(4099, 8192)  # prime
        assert path == "naive"

    def test_routing_matches_execution(self, key):
        """The observability function and the jitted impl agree: a sweep at a
        fused-viable geometry returns identical results through fast_xcorr
        (which routes) and the explicitly-selected generic path."""
        from pydsproutines_tpu.ops.xcorr import (_fast_xcorr_impl,
                                                 select_xcorr_path)
        n, nsh = 4096, 32
        k1, k2 = jax.random.split(key)
        cut = (jax.random.normal(k1, (n,)) +
               1j * jax.random.normal(k2, (n,))).astype(jnp.complex64)
        rx = jnp.pad(cut, (100, 200)) + 0.01 * (
            jax.random.normal(k1, (n + 300,)).astype(jnp.complex64))
        path, _ = select_xcorr_path(n, n + 300, np.complex64, True, False,
                                    True, nsh, 1)
        shifts = jnp.arange(nsh) + 90
        qf2_a, f_a = _fast_xcorr_impl(cut, rx, shifts, n=n, freqsearch=True,
                                      output_caf=False, abs_result=True,
                                      batch_size=nsh, step=1, interpret=True)
        qf2_b, f_b = _fast_xcorr_impl(cut, rx, shifts, n=n, freqsearch=True,
                                      output_caf=False, abs_result=True,
                                      batch_size=nsh, step=None,
                                      interpret=True)
        assert int(jnp.argmax(qf2_a)) == int(jnp.argmax(qf2_b)) == 10
        np.testing.assert_allclose(np.asarray(qf2_a), np.asarray(qf2_b),
                                   rtol=2e-2, atol=1e-6)


def test_bf16_peak_autorefines_to_f32(key):
    """In the default bf16 sweep mode the winning shift's QF^2 and freq bin
    are automatically re-verified in f32 (round-2 review: silent ~1e-2
    peak-value error was a thresholding footgun)."""
    import pydsproutines_tpu.ops.xcorr as X
    cutout, rx = _make_scene(key, n_cutout=1024, n_rx=2048, start=512)
    cutout = cutout.astype(np.complex64)
    rx = rx.astype(np.complex64)
    shifts = np.arange(384, 640)
    qf2, freqs = fast_xcorr(jnp.asarray(cutout), jnp.asarray(rx),
                            freqsearch=True, shifts=jnp.asarray(shifts),
                            batch_size=64, precision="bf16")
    ref_qf2, ref_freq = _np_fast_xcorr_freqscan(cutout, rx, shifts)
    i = int(np.argmax(np.asarray(qf2)))
    j = int(np.argmax(ref_qf2))
    assert i == j
    # the winner is f32-grade even though the sweep ran bf16
    assert abs(float(np.asarray(qf2)[i]) - ref_qf2[j]) < 1e-5
    assert int(np.asarray(freqs)[i]) == int(ref_freq[j])
