import jax.numpy as jnp
import numpy as np

from pydsproutines_tpu.ops.viterbi import ViterbiDemodulator


def _np_viterbi_reference(alphabet, pretransitions, pulses, omegas, up, y,
                          pathlen, allowed_start=(0,)):
    """Direct numpy re-derivation of the reference trellis
    (viterbiDemodClasses.py:53-254)."""
    A = len(alphabet)
    L = pulses.shape[0]
    pulselen = pulses.shape[1]
    omegavecs = np.exp(1j * (-omegas[:, None] * np.arange(len(y) + pulselen)))

    paths = np.zeros((A, pathlen), dtype=alphabet.dtype)
    pathmetrics = np.full(A, np.inf)
    for a in range(A):
        if a not in allowed_start:
            continue
        paths[a, 0] = alphabet[a]
        xall = np.zeros((L, pulselen), dtype=complex)
        for i in range(L):
            xc = np.convolve(pulses[i], paths[a, :1])[-pulselen:]
            xall[i] = np.exp(1j * (-omegas[i] * np.arange(pulselen))) * xc
        summed = xall.sum(axis=0)
        pathmetrics[a] = np.linalg.norm(y[:up] - summed[:up]) ** 2

    for n in range(1, pathlen):
        branch = np.zeros(pretransitions.shape)
        shortb = np.zeros_like(branch)
        for p in range(A):
            for t in range(pretransitions.shape[1]):
                q = pretransitions[p, t]
                if pathmetrics[q] == np.inf:
                    branch[p, t] = np.inf
                    shortb[p, t] = np.inf
                    continue
                guess = paths[q].copy()
                guess[n] = alphabet[p]
                upguess = np.zeros(pathlen * up, dtype=complex)
                upguess[::up] = guess
                s = max(n * up - pulselen + 1, 0)
                xall = np.zeros((L, pulselen), dtype=complex)
                for i in range(L):
                    pad = np.pad(upguess[s: n * up + 1], (0, pulselen - 1))
                    xc = np.convolve(pulses[i], pad)[len(pad) - 1:][:pulselen] \
                        if False else None
                    # scipy-lfilter equivalent: full conv truncated to input len
                    xc = np.convolve(pulses[i], pad)[: len(pad)][-pulselen:]
                    xall[i] = omegavecs[i, n * up: n * up + pulselen] * xc
                summed = xall.sum(axis=0)
                yseg = y[up * n: up * n + pulselen]
                branch[p, t] = np.linalg.norm(yseg - summed[: len(yseg)]) ** 2
                shortb[p, t] = np.linalg.norm(
                    y[up * n: up * (n + 1)] - summed[:up]) ** 2
        temppaths = paths.copy()
        tempmetrics = pathmetrics.copy()
        for p in range(A):
            if np.all(branch[p] == np.inf):
                tempmetrics[p] = np.inf
                continue
            bt = np.argmin(branch[p])
            temppaths[p] = paths[pretransitions[p, bt]]
            temppaths[p, n] = alphabet[p]
            tempmetrics[p] = pathmetrics[pretransitions[p, bt]] + shortb[p, bt]
        paths = temppaths
        pathmetrics = tempmetrics

    best = np.argmin(pathmetrics)
    return paths[best], pathmetrics, paths


def _make_cpm_setup():
    """4-phase-state CPM-ish setup: alphabet = 4 phases, transitions allow
    +/-1 phase steps, single source, rectangular pulse over 2 symbols."""
    A = 4
    alphabet = np.exp(1j * np.arange(A) * np.pi / 2).astype(np.complex128)
    pretransitions = np.array([[(p - 1) % A, (p + 1) % A] for p in range(A)],
                              dtype=np.int32)
    up = 4
    pulselen = 2 * up
    pulses = (np.ones((1, pulselen)) * 0.5).astype(np.complex128)
    omegas = np.array([0.05])
    return alphabet, pretransitions, pulses, omegas, up


def _synthesize(alphabet_path, pulses, omegas, up, nsamps):
    ups = np.zeros(nsamps, dtype=complex)
    ups[: len(alphabet_path) * up: up] = alphabet_path
    y = np.zeros(nsamps, dtype=complex)
    for i in range(pulses.shape[0]):
        xc = np.convolve(pulses[i], ups)[:nsamps]
        y += xc * np.exp(1j * (-omegas[i] * np.arange(nsamps)))
    return y


def test_viterbi_matches_numpy_reference_on_noisy_input(rng):
    alphabet, pre, pulses, omegas, up = _make_cpm_setup()
    pathlen = 12
    nsamps = pathlen * up + pulses.shape[1]
    # random noisy observation — the trellis decisions must still agree
    y = (rng.standard_normal(nsamps) + 1j * rng.standard_normal(nsamps))

    ref_path, ref_metrics, ref_paths = _np_viterbi_reference(
        alphabet, pre, pulses, omegas, up, y, pathlen)

    vd = ViterbiDemodulator(alphabet, pre, pulses, omegas, up)
    best_path, metrics, paths = vd.run(jnp.asarray(y), pathlen)

    assert np.allclose(np.asarray(metrics), ref_metrics, rtol=1e-4)
    assert np.max(np.abs(np.asarray(best_path) - ref_path)) < 1e-5


def test_viterbi_recovers_clean_path(rng):
    """On a noiseless synthesized signal the decoder must recover the true
    symbol sequence exactly."""
    alphabet, pre, pulses, omegas, up = _make_cpm_setup()
    pathlen = 20
    # random walk respecting transitions, starting at state 0
    states = [0]
    for _ in range(pathlen - 1):
        step = rng.choice([-1, 1])
        states.append((states[-1] + step) % 4)
    states = np.array(states)
    true_path = alphabet[states]
    nsamps = pathlen * up + pulses.shape[1]
    y = _synthesize(true_path, pulses, omegas, up, nsamps)

    vd = ViterbiDemodulator(alphabet, pre, pulses, omegas, up)
    best_path, metrics, paths = vd.run(jnp.asarray(y), pathlen)
    assert np.max(np.abs(np.asarray(best_path) - true_path)) < 1e-4
    assert float(jnp.min(metrics)) < 1e-6 * nsamps


def test_fast_table_path_matches_scan_path(rng):
    """The table-precompute fast path and the general scan implementation
    produce identical survivor paths and metrics (multi-source, nonzero
    omegas, noisy input)."""
    from pydsproutines_tpu.ops.viterbi import (_viterbi_run_fast,
                                               _viterbi_run_scan,
                                               _viterbi_fast_viable)
    alphabet = np.exp(1j * np.arange(4) * np.pi / 2).astype(np.complex64)
    pre = np.array([[(p - 1) % 4, (p + 1) % 4] for p in range(4)], np.int32)
    up = 4
    pulses = np.stack([np.hanning(8), 0.3 * np.ones(8)]).astype(np.complex64)
    omegas = np.array([0.05, -0.11], np.float32)
    start = np.array([True, False, True, False])
    pathlen = 37
    assert _viterbi_fast_viable(4, 2, pathlen, 8)
    y = (rng.standard_normal(pathlen * up + 16)
         + 1j * rng.standard_normal(pathlen * up + 16)).astype(np.complex64)
    args = (jnp.asarray(y), jnp.asarray(alphabet), jnp.asarray(pre),
            jnp.asarray(pulses), jnp.asarray(omegas), jnp.asarray(start))
    kw = dict(up=up, pulselen=8, k_syms=2, pathlen=pathlen)
    pf, mf = _viterbi_run_fast(*args, **kw)
    ps, ms = _viterbi_run_scan(*args, **kw)
    np.testing.assert_allclose(np.asarray(mf), np.asarray(ms), rtol=1e-4)
    # scan path stores state indices in paths via .at[:, n]; fast path
    # reconstructs via backtrack — must be the same trellis decisions
    np.testing.assert_array_equal(np.asarray(pf), np.asarray(ps))


def test_memoryless_path_matches_scan_path(rng):
    """The k_syms==1 precomputed-table dispatch must reproduce the general
    scan exactly (paths AND metrics), including dead start states and
    multi-source frequency offsets."""
    from pydsproutines_tpu.ops.viterbi import (_viterbi_run_memoryless,
                                               _viterbi_run_scan)
    up = 4
    A = 4
    alphabet = np.exp(1j * 2 * np.pi * np.arange(A) / A).astype(np.complex64)
    pret = np.stack([np.roll(np.arange(A), 1),
                     np.roll(np.arange(A), -1)], axis=1).astype(np.int32)
    pulses = np.stack([np.hanning(up) + 0.1,
                       0.3 * np.ones(up)]).astype(np.complex64)
    omegas = np.array([0.0, 0.05], dtype=np.float32)
    pathlen = 37
    y = (rng.standard_normal(pathlen * up)
         + 1j * rng.standard_normal(pathlen * up)).astype(np.complex64)
    start = np.array([True, False, True, False])
    for survivor in ("branch", "path"):
        p1, m1 = _viterbi_run_memoryless(
            jnp.asarray(y), jnp.asarray(alphabet), jnp.asarray(pret),
            jnp.asarray(pulses), jnp.asarray(omegas), jnp.asarray(start),
            up=up, pulselen=up, pathlen=pathlen, survivor_metric=survivor)
        p2, m2 = _viterbi_run_scan(
            jnp.asarray(y), jnp.asarray(alphabet), jnp.asarray(pret),
            jnp.asarray(pulses), jnp.asarray(omegas), jnp.asarray(start),
            up=up, pulselen=up, k_syms=1, pathlen=pathlen,
            survivor_metric=survivor)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m2),
                                   rtol=2e-5, err_msg=survivor)
        assert np.array_equal(np.asarray(p1), np.asarray(p2)), survivor


def test_path_survivor_fixes_memoryless_degeneracy(rng):
    """Round-3 finding: the reference's branch-only survivor selection
    degenerates for memoryless pulses (ties always to transition 0, path
    history collapses). The opt-in survivor_metric='path' variant must
    recover a clean 2FSK symbol stream that the faithful default cannot."""
    up = 8
    alphabet = np.array([1.0, -1.0], dtype=np.complex64)
    pret = np.array([[0, 1], [0, 1]], dtype=np.int32)
    pulses = np.ones((1, up), dtype=np.complex64)
    omegas = np.zeros(1, dtype=np.float32)
    pathlen = 64
    true_syms = rng.integers(0, 2, pathlen)
    y = np.repeat(alphabet[true_syms], up).astype(np.complex64)

    kw = dict(pretransitions=pret, pulses=pulses, omegas=omegas, up=up,
              allowed_start_idx=np.array([0, 1]))
    vd_path = ViterbiDemodulator(alphabet, survivor_metric="path", **kw)
    best, metrics, _ = vd_path.run(jnp.asarray(y), pathlen)
    decoded = (np.asarray(best).real < 0).astype(int)
    assert np.array_equal(decoded, true_syms)
    assert np.isclose(float(np.min(np.asarray(metrics))), 0.0, atol=1e-3)

    vd_branch = ViterbiDemodulator(alphabet, survivor_metric="branch", **kw)
    best_b, metrics_b, _ = vd_branch.run(jnp.asarray(y), pathlen)
    # final metrics still reach ~0 (metric accumulation is unaffected), but
    # the degenerate survivor history cannot follow the symbol sequence
    decoded_b = (np.asarray(best_b).real < 0).astype(int)
    assert not np.array_equal(decoded_b, true_syms)


def test_static_tables_path_matches_scan(rng):
    """The host-unrolled control-flow path (pret/start passed statically)
    must reproduce the general scan's paths and metrics exactly, including
    dead start states."""
    from pydsproutines_tpu.ops.viterbi import (_viterbi_run_memoryless,
                                               _viterbi_run_scan)
    up = 4
    A = 4
    alphabet = np.exp(1j * 2 * np.pi * np.arange(A) / A).astype(np.complex64)
    pret = np.stack([np.roll(np.arange(A), 1),
                     np.roll(np.arange(A), -1)], axis=1).astype(np.int32)
    pulses = np.stack([np.hanning(up) + 0.1]).astype(np.complex64)
    omegas = np.array([0.03], dtype=np.float32)
    pathlen = 41
    y = (rng.standard_normal(pathlen * up)
         + 1j * rng.standard_normal(pathlen * up)).astype(np.complex64)
    for start in (np.array([True, False, False, False]),
                  np.array([True, True, True, True])):
        p1, m1 = _viterbi_run_memoryless(
            jnp.asarray(y), jnp.asarray(alphabet), jnp.asarray(pret),
            jnp.asarray(pulses), jnp.asarray(omegas), jnp.asarray(start),
            up=up, pulselen=up, pathlen=pathlen,
            pret_static=tuple(map(tuple, pret.tolist())),
            start_static=tuple(bool(v) for v in start))
        p2, m2 = _viterbi_run_scan(
            jnp.asarray(y), jnp.asarray(alphabet), jnp.asarray(pret),
            jnp.asarray(pulses), jnp.asarray(omegas), jnp.asarray(start),
            up=up, pulselen=up, k_syms=1, pathlen=pathlen)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=2e-5)
        assert np.array_equal(np.asarray(p1), np.asarray(p2))


def _np_window_mlse(alphabet, pre, pulses, omegas, up, y, pathlen,
                    allowed_start=(0,)):
    """Brute-force exact MLSE over the (A+1)^k window-state trellis:
    the independent oracle for _viterbi_run_path_acs."""
    A = len(alphabet)
    base = A + 1
    pulselen = pulses.shape[1]
    k = pulselen // up
    codes = base ** k

    def bm_short(n, c):
        digs = [(c // base ** (k - 1 - i)) % base for i in range(k)]
        w = np.array([0 if d == 0 else alphabet[d - 1] for d in digs])
        ups = np.zeros(k * up, complex)
        ups[::up] = w
        seg = np.zeros(pulselen, complex)
        for i in range(pulses.shape[0]):
            cv = np.convolve(ups, pulses[i])
            s = cv[(k - 1) * up: (k - 1) * up + pulselen]
            t = n * up + np.arange(pulselen)
            seg += s * np.exp(-1j * omegas[i] * t)
        yseg = np.zeros(pulselen, complex)
        avail = y[n * up: n * up + pulselen]
        yseg[: len(avail)] = avail
        valid = (n * up + np.arange(pulselen)) < len(y)
        d = np.where(valid, yseg - seg, 0)
        return np.sum(np.abs(d[:up]) ** 2)

    hist = np.full((pathlen, codes), np.inf)
    back = np.zeros((pathlen, codes), np.int32)
    for a in allowed_start:
        hist[0, a + 1] = bm_short(0, a + 1)
    for n in range(1, pathlen):
        for cp in range(codes):
            dnew = cp % base
            if dnew == 0:
                continue
            p = dnew - 1
            tailc = cp // base
            dq = tailc % base
            if dq == 0 or (dq - 1) not in pre[p]:
                continue
            best, barg = np.inf, 0
            for u in range(base):
                c = u * base ** (k - 1) + tailc
                if hist[n - 1, c] < best:
                    best, barg = hist[n - 1, c], c
            if best < np.inf:
                hist[n, cp] = best + bm_short(n, cp)
                back[n, cp] = barg
    # reduce per final alphabet state + backtrack state sequences
    metrics = np.full(A, np.inf)
    paths = np.zeros((A, pathlen), np.int32)
    for p in range(A):
        group = [v * base + (p + 1) for v in range(base ** (k - 1))]
        j = int(np.argmin(hist[-1, group]))
        metrics[p] = hist[-1, group[j]]
        c = group[j]
        for m in range(pathlen - 1, -1, -1):
            paths[p, m] = (c % base) - 1
            c = back[m, c]
    return paths, metrics


def test_path_acs_pulse_memory_matches_bruteforce_mlse(rng):
    """k_syms=2 min-plus associative-scan MLSE vs an independent
    brute-force window-state Viterbi: exact metric + path parity."""
    alphabet, pre, pulses, omegas, up = _make_cpm_setup()  # k_syms = 2
    pathlen = 14
    nsamps = pathlen * up + len(pulses[0])
    # walk FORWARD through transitions: state n must have state n-1 in its
    # pretransitions, so build by picking successors
    true_states = [0]
    for _ in range(pathlen - 1):
        prev = true_states[-1]
        succ = [p for p in range(len(alphabet)) if prev in pre[p]]
        true_states.append(int(succ[rng.integers(0, len(succ))]))
    y = _synthesize(alphabet[true_states], pulses, omegas, up, nsamps)
    y += 0.1 * (rng.standard_normal(nsamps) + 1j * rng.standard_normal(nsamps))
    y = y.astype(np.complex64)

    ref_paths, ref_metrics = _np_window_mlse(
        alphabet, pre, pulses, omegas, up, y, pathlen)

    vd = ViterbiDemodulator(alphabet, pre, pulses, omegas, up,
                            survivor_metric="path")
    from pydsproutines_tpu.ops.viterbi import _viterbi_acs_viable
    assert _viterbi_acs_viable(len(alphabet), 2, pathlen)
    best_vals, metrics, all_vals = vd.run(jnp.asarray(y), pathlen)

    finite = np.isfinite(ref_metrics)
    np.testing.assert_allclose(np.asarray(metrics)[finite],
                               ref_metrics[finite], rtol=2e-4)
    assert np.all(np.isinf(np.asarray(metrics)[~finite]))
    best = int(np.argmin(ref_metrics))
    np.testing.assert_allclose(
        np.asarray(best_vals), alphabet[ref_paths[best]].astype(np.complex64),
        rtol=1e-5)


def test_path_acs_pulse_memory_recovers_clean_path(rng):
    """High-SNR behavioral check: the k_syms=2 ACS decodes the transmitted
    sequence (and therefore agrees with the sequential scan demod)."""
    alphabet, pre, pulses, omegas, up = _make_cpm_setup()
    pathlen = 40
    true_states = [0]
    for _ in range(pathlen - 1):
        prev = true_states[-1]
        succ = [p for p in range(len(alphabet)) if prev in pre[p]]
        true_states.append(int(succ[rng.integers(0, len(succ))]))
    nsamps = pathlen * up + len(pulses[0])
    y = _synthesize(alphabet[true_states], pulses, omegas, up, nsamps)
    y += 0.02 * (rng.standard_normal(nsamps)
                 + 1j * rng.standard_normal(nsamps))
    y = y.astype(np.complex64)

    vd = ViterbiDemodulator(alphabet, pre, pulses, omegas, up,
                            survivor_metric="path")
    best_vals, metrics, _ = vd.run(jnp.asarray(y), pathlen)
    np.testing.assert_allclose(np.asarray(best_vals),
                               alphabet[true_states].astype(np.complex64),
                               atol=1e-4)


def test_path_acs_size_gate_falls_back_to_scan():
    """ADVICE round-4: the associative-scan routes must be size-gated."""
    from pydsproutines_tpu.ops.viterbi import (_ACS_MAX_ELEMS,
                                               _ACS_MAX_STATES,
                                               _viterbi_acs_viable)
    assert _viterbi_acs_viable(2, 2, 512)
    assert not _viterbi_acs_viable(2, 8, 512)       # 6561 states
    assert not _viterbi_acs_viable(127, 1, 10 ** 6)  # elems blow-up
    assert not _viterbi_acs_viable(200, 1, 4)       # state cap


def test_batched_acs_matches_per_burst(rng):
    """viterbi_path_acs_batch (bursts-minor min-plus chain, round 5) must
    equal the per-burst dispatcher exactly for k_syms = 1 and 2."""
    from pydsproutines_tpu.ops.viterbi import (_viterbi_run,
                                               viterbi_path_acs_batch)
    alphabet = np.array([1.0, -1.0], dtype=np.complex64)
    pret = np.array([[0, 1], [0, 1]], dtype=np.int32)
    up, nsyms, B = 8, 48, 4
    pulse2 = np.full((1, 2 * up), 0.5, dtype=np.complex64)
    omegas = np.array([0.05], dtype=np.float32)
    start = np.array([True, True])
    ps = tuple(map(tuple, pret.tolist()))
    ss = (True, True)
    ys = (rng.standard_normal((B, nsyms * up))
          + 1j * rng.standard_normal((B, nsyms * up))).astype(np.complex64)
    for k_syms, plen in ((2, 2 * up), (1, up)):
        pl_ = pulse2[:, :plen]
        bp, bm = viterbi_path_acs_batch(
            jnp.asarray(ys), jnp.asarray(alphabet), jnp.asarray(pret),
            jnp.asarray(pl_), jnp.asarray(omegas), jnp.asarray(start),
            up=up, pulselen=plen, k_syms=k_syms, pathlen=nsyms,
            pret_static=ps, start_static=ss)
        for b in range(B):
            paths, metrics = _viterbi_run(
                jnp.asarray(ys[b]), jnp.asarray(alphabet),
                jnp.asarray(pret), jnp.asarray(pl_), jnp.asarray(omegas),
                jnp.asarray(start), up=up, pulselen=plen, k_syms=k_syms,
                pathlen=nsyms, survivor_metric="path", pret_static=ps,
                start_static=ss)
            np.testing.assert_allclose(np.asarray(bm)[b],
                                       np.asarray(metrics), rtol=1e-4)
            assert np.array_equal(np.asarray(bp)[b], np.asarray(paths)), \
                (k_syms, b)
