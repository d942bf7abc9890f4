import jax
import jax.numpy as jnp
import numpy as np

from pydsproutines_tpu.ops.detection import (
    threshold_edges,
    find_local_maxima,
    auto_detect_threshold,
    BurstDetector,
    energy_detection,
    kmeans2,
)
from pydsproutines_tpu.signal import rand_psk_syms, add_sig_to_noise


def test_threshold_edges_basic():
    x = jnp.asarray(np.array([0, 0, 5, 5, 5, 0, 0, 7, 7, 0], dtype=np.float32))
    e = threshold_edges(x, 1.0, capacity=4)
    assert int(e.count) == 2
    assert np.array_equal(np.asarray(e.starts[:2]), [2, 7])
    assert np.array_equal(np.asarray(e.ends[:2]), [5, 9])
    assert int(e.starts[2]) == -1


def test_threshold_edges_length_limits():
    x = jnp.asarray(np.array([0, 5, 0, 7, 7, 7, 0, 9, 9, 0], dtype=np.float32))
    e = threshold_edges(x, 1.0, capacity=4, min_length=2, max_length=2)
    assert int(e.count) == 1
    assert (int(e.starts[0]), int(e.ends[0])) == (7, 9)


def test_threshold_edges_open_run_at_end():
    x = jnp.asarray(np.array([0, 0, 3, 3, 3], dtype=np.float32))
    e = threshold_edges(x, 1.0, capacity=2)
    assert int(e.count) == 1
    assert (int(e.starts[0]), int(e.ends[0])) == (2, 5)


def test_find_local_maxima():
    x = jnp.asarray(np.array([0, 2, 1, 5, 1, 0.5, 3, 0], dtype=np.float32))
    idx, count = find_local_maxima(x, height=1.5, max_peaks=4)
    assert int(count) == 3
    assert np.array_equal(np.asarray(idx[:3]), [1, 3, 6])


def test_burst_detector_end_to_end(key):
    """Synthetic bursty scene: two bursts in noise; detector finds both."""
    k1, k2, k3 = jax.random.split(key, 3)
    s1, _ = rand_psk_syms(k1, 500, 4, dtype=jnp.complex64)
    s2, _ = rand_psk_syms(k2, 700, 4, dtype=jnp.complex64)
    n = 5000
    _, rx = add_sig_to_noise(k3, s1 * 3, noise_len=n, sig_start_idx=1000,
                             snr_inband_linear=1.0)
    rx = rx + jax.lax.dynamic_update_slice(
        jnp.zeros(n, rx.dtype), (s2 * 3).astype(rx.dtype), (3000,))

    bd = BurstDetector(medfiltlen=65)
    bd.medfilt(rx)
    edges = bd.detect_via_threshold(threshold=4.0, capacity=16, min_length=200)
    count = int(edges.count)
    assert count == 2
    starts = np.asarray(edges.starts[:count])
    ends = np.asarray(edges.ends[:count])
    assert abs(starts[0] - 1000) < 80 and abs(ends[0] - 1500) < 80
    assert abs(starts[1] - 3000) < 80 and abs(ends[1] - 3700) < 80


def test_auto_detect_threshold(key):
    k1, k2 = jax.random.split(key)
    s, _ = rand_psk_syms(k1, 2000, 4, dtype=jnp.complex64)
    _, rx = add_sig_to_noise(k2, s * 4, noise_len=10000, sig_start_idx=4000,
                             snr_inband_linear=1.0)
    bd = BurstDetector(medfiltlen=65)
    bd.medfilt(rx)
    thr = bd.auto_detect_threshold(np.arange(0.0, 20.0, 0.5))
    assert thr is not None
    # noise power is ~1, signal power ~16: threshold should sit between
    assert 0.5 < thr < 16.0
    edges = bd.detect_via_threshold(thr * 1.0, capacity=8, min_length=500)
    assert int(edges.count) >= 1


def test_kmeans2_separates_clusters(rng):
    x = np.concatenate([rng.normal(1.0, 0.1, 500), rng.normal(10.0, 0.5, 100)])
    lo, hi = kmeans2(jnp.asarray(x.astype(np.float32)), 1.5, 9.0)
    assert abs(float(lo) - 1.0) < 0.2
    assert abs(float(hi) - 10.0) < 0.5


def test_energy_detection(key):
    k1, k2 = jax.random.split(key)
    s, _ = rand_psk_syms(k1, 1000, 4, dtype=jnp.complex64)
    _, rx = add_sig_to_noise(k2, s * 4, noise_len=8000, sig_start_idx=5000,
                             snr_inband_linear=1.0)
    amp_sq = np.abs(np.asarray(rx)) ** 2
    mean_noise, req, filtered, edges = energy_detection(
        jnp.asarray(amp_sq.astype(np.float32)), 65, snr_req_linear=4.0,
        noise_indices=jnp.arange(4000))
    assert abs(float(mean_noise) - 1.0) < 0.3
    assert int(edges.count) >= 1
    assert abs(int(edges.starts[0]) - 5000) < 100


def test_detect_regular_sections_finds_period(rng):
    # bursty signal: 300-sample bursts every 1000 samples
    period, burst = 1000, 300
    n = 20 * period
    x = rng.normal(0, 0.1, n).astype(np.float32)
    for s in range(0, n, period):
        x[s:s + burst] += rng.normal(0, 3.0, burst).astype(np.float32)
    bd = BurstDetector(medfiltlen=31)
    bd.medfilt(jnp.asarray(x))
    sizes = np.array([700, 850, 1000, 1150, 1300])
    metric, codebooks = bd.detect_regular_sections(sizes)
    assert metric.shape == (5, 2) and codebooks.shape == (5, 2)
    # the true period has the widest cluster separation
    assert sizes[np.argmax(metric[:, 0])] == period
    assert np.all(codebooks[:, 1] >= codebooks[:, 0])


def test_xcorr_complexity_estimators():
    from pydsproutines_tpu.ops import (compute_fast_xcorr_complexity,
                                       compute_group_xcorr_czt_complexity)
    # K shifts scale linearly; larger FFTs cost more
    assert compute_fast_xcorr_complexity(1024, 4) == 4 * compute_fast_xcorr_complexity(1024, 1)
    assert compute_fast_xcorr_complexity(2048) > compute_fast_xcorr_complexity(1024)
    c1 = compute_group_xcorr_czt_complexity(3, 128, 100, k=2)
    c2 = compute_group_xcorr_czt_complexity(3, 128, 100, k=1)
    assert c1 == 2 * c2 and c2 > 0
