import jax
import jax.numpy as jnp
import numpy as np

from pydsproutines_tpu.signal import (
    rand_psk_syms,
    randnoise,
    add_sig_to_noise,
    make_cpfsk_syms,
    make_pulsed_cpfsk_syms,
    propagate_signal,
    propagate_signal_exact,
    make_scaled_src4,
)


def _np_make_freq(length, fs):
    f = np.arange(length) / length * fs
    return np.where(f >= fs / 2, f - fs, f)


def test_rand_psk_syms_unit_modulus(key):
    for m in (2, 4, 8):
        syms, bits = rand_psk_syms(key, 1000, m)
        assert np.allclose(np.abs(np.asarray(syms)), 1.0, atol=1e-6)
        assert np.asarray(bits).max() < m


def test_randnoise_power_calibration(key):
    # SNR 10 linear, chnBW/bw = 2 -> noise power = 1/10 * 2 = 0.2
    noise = randnoise(key, 200_000, bw_signal=1.0, chn_bw=2.0,
                      snr_inband_linear=10.0)
    pwr = np.mean(np.abs(np.asarray(noise)) ** 2)
    assert abs(pwr - 0.2) / 0.2 < 0.02


def test_add_sig_to_noise_placement(key):
    syms, _ = rand_psk_syms(key, 100, 4)
    noise, rx = add_sig_to_noise(key, syms, noise_len=300, sig_start_idx=50,
                                 snr_inband_linear=np.inf)
    rx = np.asarray(rx)
    assert np.allclose(rx[:50], 0)
    assert np.allclose(rx[50:150], np.asarray(syms), atol=1e-7)
    assert np.allclose(rx[150:], 0)


def test_make_cpfsk_syms_reference_semantics(key):
    """Re-derive the reference formula directly in numpy and compare."""
    bits = np.array([1, 0, 1, 1, 0, 0, 1, 0], dtype=np.uint8)
    baud, m, h, up = 100.0, 2, 0.5, 8
    sig, fs, data = make_cpfsk_syms(jnp.asarray(bits), baud, m, h, up,
                                    dtype=jnp.complex128)
    assert fs == baud * up

    # numpy reference (signalCreationRoutines.py:220 semantics)
    T = 1.0 / baud
    d = bits.astype(np.int8) * m - 1
    n = np.arange(len(bits) * up)
    i_list = (n // up).astype(int)
    t_list = n / fs
    a = np.hstack(([0], np.cumsum(d)))[: len(d)]
    a_list = np.repeat(a, up)
    theta = d[i_list] * np.pi * h * (t_list - i_list * T) / T + np.pi * h * a_list
    expected = np.exp(1j * theta)
    assert np.max(np.abs(np.asarray(sig) - expected)) < 1e-9


def test_pulsed_cpfsk_matches_rect_pulse(key):
    """With the default rect pulse, pulsed CPFSK should equal the plain one
    over the valid region (reference docstring, signalCreationRoutines.py:254)."""
    bits = jnp.asarray(np.random.default_rng(1).integers(0, 2, 64, dtype=np.uint8))
    up = 8
    sig, fs, data = make_cpfsk_syms(bits, 100.0, up=up, dtype=jnp.complex128)
    # rect pulse of length up scaled to integral 0.5 at normalized rate
    g = np.ones(up) / (2 * up)
    psig, pfs, pdata, css = make_pulsed_cpfsk_syms(
        bits, 100.0, jnp.asarray(g), up=up, dtype=jnp.complex128)
    # with the rect pulse the two coincide from index 0 (verified against the
    # reference formulas numerically)
    a = np.asarray(sig)
    b = np.asarray(psig)[: a.size]
    assert np.max(np.abs(a - b)) < 1e-6


def test_propagate_signal_integer_shift(key):
    """An integer-sample shift via the FFT phase ramp equals np.roll for a
    periodic signal."""
    n = 256
    x = np.exp(1j * 2 * np.pi * 5 * np.arange(n) / n)  # periodic tone
    fs = 1.0
    shifted = np.asarray(propagate_signal(jnp.asarray(x), 3.0, fs))
    expected = np.roll(x, 3)
    assert np.max(np.abs(shifted - expected)) < 1e-9


def test_propagate_signal_exact_constant_tau():
    """propagate_signal_exact with constant tau equals the circular-shift
    interpretation of the DFT interpolation formula."""
    n = 128
    rng = np.random.default_rng(2)
    x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    fs = 1.0
    tau = np.full(n, 2.0)  # 2-sample delay
    out = np.asarray(propagate_signal_exact(
        jnp.asarray(x), jnp.asarray(tau), fs))
    expected = np.roll(x, 2)
    assert np.max(np.abs(out - expected)) < 1e-6


def test_make_scaled_src4_sums_to_half():
    g = make_scaled_src4(8)
    assert abs(np.sum(g) - 0.5) < 1e-3
