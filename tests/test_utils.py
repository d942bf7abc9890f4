import numpy as np
import jax.numpy as jnp

from pydsproutines_tpu.utils import (
    next_fast_len,
    prev_fast_len,
    prime_factors,
    make_freq,
    freqshift_signal,
    compare_values,
)


def _np_make_freq(length, fs):
    freq = np.zeros(length)
    for i in range(length):
        freq[i] = i / length * fs
        if freq[i] >= fs / 2:
            freq[i] -= fs
    return freq


def test_prime_factors():
    assert prime_factors(1) == []
    assert prime_factors(2) == [2]
    assert prime_factors(360) == [2, 3, 5]
    assert prime_factors(97) == [97]


def test_next_prev_fast_len():
    # 7-smooth checks
    for n in [1, 2, 100, 1023, 1e6 + 3]:
        n = int(n)
        nf = next_fast_len(n)
        assert nf >= n
        assert max(prime_factors(nf), default=1) <= 7
        pf = prev_fast_len(n)
        assert pf <= n
        assert max(prime_factors(pf), default=1) <= 7
    # already-smooth lengths are returned unchanged
    assert next_fast_len(1024) == 1024
    assert prev_fast_len(1024) == 1024
    assert next_fast_len(11) == 12
    assert prev_fast_len(11) == 10


def test_make_freq_matches_reference_semantics():
    for length, fs in [(8, 1.0), (7, 100.0), (100, 192000.0)]:
        ours = np.asarray(make_freq(length, fs, dtype=jnp.float64))
        ref = _np_make_freq(length, fs)
        assert np.allclose(ours, ref, atol=1e-9)


def test_freqshift_signal():
    x = np.exp(1j * 2 * np.pi * 0.1 * np.arange(64))
    shifted = np.asarray(freqshift_signal(jnp.asarray(x), 0.05, 1.0))
    expected = x * np.exp(1j * 2 * np.pi * 0.05 * np.arange(64))
    assert np.max(np.abs(shifted - expected)) < 1e-6


def test_compare_values():
    a = np.array([1.0, 2.0])
    b = np.array([1.0, 2.5])
    d, f = compare_values(a, b)
    assert np.isclose(d, 0.5)
    assert np.isclose(f, 0.2)
