"""Viterbi demodulation of multi-source CPM-like signals.

Reference semantics: /root/reference/viterbiDemodClasses.py (ViterbiDemodulator
:18 — run :53, calcAllBranchMetrics :143, calcPathMetrics :233,
genOmegaVectors :256) and its native C++ port
(cython_ext/PyViterbiDemodulator/viterbiDemodulator.cpp).

Model: states are the alphabet symbols; each state keeps one survivor path.
The branch metric from predecessor state q to state p at symbol step n is

    || y[n*up : n*up+pulselen] - sum_i pulse_i * upsampled(path) .
       exp(-j*omega_i*(n*up+k)) ||^2

where the synthesized segment only depends on the last pulselen/up symbols of
the survivor path. The path metric accumulates the *short* branch metric (the
first ``up`` samples only).

TPU-first design: the reference spawns per-symbol worker threads with condition
variables (viterbiDemodulator.h:57-61); that design does not transfer. Here
the trellis is a ``lax.scan`` over symbols whose step vmaps over (state x
pre-transition) pairs; each survivor carries a fixed-length window of its last
pulselen/up symbols (all the branch metric needs), so the step is static-shape
and fuses into a handful of batched convolution/matmul ops. Throughput comes
from vmapping whole bursts, not from parallelizing one trellis (SURVEY.md §7).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


class ViterbiDemodulator:
    """Trellis demodulator (reference ViterbiDemodulator,
    viterbiDemodClasses.py:18).

    Parameters
    ----------
    alphabet : (A,) complex — constellation symbol values.
    pretransitions : (A, T) int — allowed predecessor states per state.
    pulses : (L, pulselen) complex — per-source pulse shapes (constant
        amplitude/phase embedded).
    omegas : (L,) float — per-source angular frequency offsets (rad/sample).
    up : int — samples per symbol.
    allowed_start_idx : int array — states allowed at symbol 0.
    """

    def __init__(self, alphabet, pretransitions, pulses, omegas, up: int,
                 allowed_start_idx=np.array([0])):
        # trellis constants stay HOST numpy and are embedded as program
        # constants in the per-instance jitted closure (the axon transport
        # cannot transfer complex arrays host<->device)
        self.alphabet = np.asarray(alphabet, dtype=np.complex64)
        self.pretransitions = np.asarray(pretransitions, dtype=np.int32)
        if self.alphabet.shape[0] != self.pretransitions.shape[0]:
            raise ValueError("Number of transitions is inconsistent.")
        self.pulses = np.asarray(pulses, dtype=np.complex64)
        self.omegas = np.asarray(omegas, dtype=np.float32)
        self.up = int(up)
        if self.omegas.shape[0] != self.pulses.shape[0]:
            raise ValueError("Number of sources is inconsistent.")
        self.pulselen = int(self.pulses.shape[1])
        if self.pulselen % self.up != 0:
            raise ValueError("pulse length must be a multiple of up")
        self.pulse_len_in_syms = self.pulselen // self.up
        self.allowed_start_idx = np.asarray(allowed_start_idx)
        self._run_fns = {}

    def run(self, y: jnp.ndarray, pathlen: int):
        """Demodulate ``pathlen`` symbols from ``y``. Returns (best path
        symbol values, final path metrics, all survivor paths)."""
        pathlen = int(pathlen)
        fn = self._run_fns.get(pathlen)
        if fn is None:
            a_mask = np.zeros(self.alphabet.shape[0], dtype=bool)
            a_mask[self.allowed_start_idx] = True
            alphabet, pretransitions = self.alphabet, self.pretransitions
            pulses, omegas = self.pulses, self.omegas
            up, pulselen = self.up, self.pulselen
            k_syms = self.pulse_len_in_syms

            def _impl(y):
                paths, metrics = _viterbi_run(
                    y.astype(jnp.complex64), jnp.asarray(alphabet),
                    jnp.asarray(pretransitions), jnp.asarray(pulses),
                    jnp.asarray(omegas), jnp.asarray(a_mask), up=up,
                    pulselen=pulselen, k_syms=k_syms, pathlen=pathlen)
                best = jnp.argmin(metrics)
                vals = jnp.asarray(alphabet)[paths]
                return vals[best], metrics, vals

            fn = self._run_fns.setdefault(pathlen, jax.jit(_impl))
        return fn(y)


@functools.partial(jax.jit,
                   static_argnames=("up", "pulselen", "k_syms", "pathlen"))
def _viterbi_run(y, alphabet, pretransitions, pulses, omegas, start_mask, *,
                 up, pulselen, k_syms, pathlen):
    A = alphabet.shape[0]
    T = pretransitions.shape[1]
    L = pulses.shape[0]
    ylen = y.shape[0]
    inf = jnp.float32(jnp.inf)

    # pad y so the pulselen-long branch window never runs off the end; the
    # reference's clipped numpy slice is reproduced with a validity mask.
    ypad = jnp.concatenate([y, jnp.zeros(pulselen + up, dtype=y.dtype)])

    def synth(window, n):
        """Synthesize the model samples at absolute times n*up + [0, pulselen)
        from the last k_syms+? symbols ``window`` (window[-1] = symbol at n).

        window: (k_syms,) complex, symbols n-k_syms+1 .. n.
        """
        upw = jnp.zeros(k_syms * up, dtype=window.dtype).at[::up].set(window)
        # conv with each pulse; sample m of upw is absolute (n-k_syms+1)*up + m
        def one_src(pulse, omega):
            c = jnp.convolve(upw, pulse, mode="full")
            seg = jax.lax.dynamic_slice(c, ((k_syms - 1) * up,), (pulselen,))
            t = (n * up + jnp.arange(pulselen)).astype(jnp.float32)
            return seg * jnp.exp(-1j * omega * t)
        x = jax.vmap(one_src)(pulses, omegas)           # (L, pulselen)
        return jnp.sum(x, axis=0)

    def branch_metrics(windows, n):
        """windows: (A, k_syms) predecessor-extended windows per (p, t).
        Returns (branch (A,T), shortbranch (A,T)) given survivor windows."""
        yseg = jax.lax.dynamic_slice(ypad, (n * up,), (pulselen,))
        valid = (n * up + jnp.arange(pulselen)) < ylen

        def per_state(p):
            def per_trans(t):
                q = pretransitions[p, t]
                w = jnp.concatenate([windows[q, 1:], alphabet[p][None]])
                s = synth(w, n)
                d = jnp.where(valid, yseg - s, 0.0)
                full = jnp.sum(jnp.abs(d) ** 2)
                short = jnp.sum(jnp.abs(d[:up]) ** 2)
                return full, short
            return jax.vmap(per_trans)(jnp.arange(T))
        return jax.vmap(per_state)(jnp.arange(A))       # each (A, T)

    # ---- initial step (n = 0): reference run() init loop --------------------
    init_windows = jnp.zeros((A, k_syms), dtype=alphabet.dtype)
    init_windows = init_windows.at[:, -1].set(alphabet)
    y0 = ypad[:up]

    def init_metric(a):
        s = synth(init_windows[a], 0)
        return jnp.sum(jnp.abs(y0 - s[:up]) ** 2)
    metrics0 = jax.vmap(init_metric)(jnp.arange(A))
    metrics0 = jnp.where(start_mask, metrics0, inf)

    paths0 = jnp.zeros((A, pathlen), dtype=jnp.int32)
    paths0 = paths0.at[:, 0].set(jnp.arange(A, dtype=jnp.int32))
    windows0 = jnp.where(start_mask[:, None], init_windows, 0)

    # ---- scan over symbols 1..pathlen-1 -------------------------------------
    def step(carry, n):
        metrics, windows, paths = carry
        full, short = branch_metrics(windows, n)
        # add predecessor-inf masking (reference calcAllBranchMetrics)
        pre_inf = jnp.isinf(metrics)[pretransitions]    # (A, T)
        full = jnp.where(pre_inf, inf, full)
        short = jnp.where(pre_inf, inf, short)

        best_t = jnp.argmin(full, axis=1)               # (A,)
        best_q = jnp.take_along_axis(pretransitions, best_t[:, None], axis=1)[:, 0]
        all_inf = jnp.all(jnp.isinf(full), axis=1)
        new_metrics = jnp.where(
            all_inf, inf,
            metrics[best_q] + jnp.take_along_axis(short, best_t[:, None], axis=1)[:, 0])
        new_paths = paths[best_q].at[:, n].set(jnp.arange(A, dtype=jnp.int32))
        new_windows = jnp.concatenate(
            [windows[best_q, 1:], alphabet[:, None]], axis=1)
        return (new_metrics, new_windows, new_paths), None

    (metrics, windows, paths), _ = jax.lax.scan(
        step, (metrics0, windows0, paths0), jnp.arange(1, pathlen))
    return paths, metrics


class BurstyViterbiDemodulator(ViterbiDemodulator):
    """Trellis demod of periodic bursts with guard gaps (reference
    BurstyViterbiDemodulator, viterbiDemodClasses.py:263).

    Symbols are laid out as repeating periods of ``num_burst_syms`` active
    symbols followed by ``num_guard_syms`` silent ones. During guard periods
    all survivor paths freeze; at each new burst every surviving end-state is
    fully connected to the allowed start states, with the branch metric
    spanning the guard gap (the synthesized pulse tail + zeros must match the
    observation there too).

    Implemented as one ``lax.scan`` whose step switches between
    normal / guard-skip / new-burst behaviour on (n mod period); survivor
    windows carry ``pulselen/up + num_guard_syms`` symbols so the new-burst
    branch can synthesize across the gap without replaying the whole path.
    """

    def __init__(self, alphabet, pretransitions, pulses, omegas, up: int,
                 num_burst_syms: int, num_guard_syms: int,
                 allowed_start_idx=None):
        if allowed_start_idx is None:
            allowed_start_idx = np.arange(len(alphabet))
        super().__init__(alphabet, pretransitions, pulses, omegas, up,
                         allowed_start_idx)
        self.num_burst_syms = int(num_burst_syms)
        self.num_guard_syms = int(num_guard_syms)
        self.num_period_syms = self.num_burst_syms + self.num_guard_syms

    def run(self, y: jnp.ndarray, pathlen: int):
        pathlen = int(pathlen)
        fn = self._run_fns.get(("bursty", pathlen))
        if fn is None:
            a_mask = np.zeros(self.alphabet.shape[0], dtype=bool)
            a_mask[self.allowed_start_idx] = True
            alphabet, pretransitions = self.alphabet, self.pretransitions
            pulses, omegas = self.pulses, self.omegas
            up, pulselen = self.up, self.pulselen
            k_syms = self.pulse_len_in_syms
            burst, guard = self.num_burst_syms, self.num_guard_syms
            period = self.num_period_syms

            def _impl(y):
                paths, metrics = _bursty_viterbi_run(
                    y.astype(jnp.complex64), jnp.asarray(alphabet),
                    jnp.asarray(pretransitions), jnp.asarray(pulses),
                    jnp.asarray(omegas), jnp.asarray(a_mask), up=up,
                    pulselen=pulselen, k_syms=k_syms, pathlen=pathlen,
                    burst=burst, guard=guard)
                best = jnp.argmin(metrics)
                # guard-period symbols are never decided — they are silent
                # (0), as in the reference where paths[n] stays 0 through
                # guard periods
                phase = jnp.arange(pathlen) % period
                active = phase < burst
                symvals = jnp.where(active[None, :],
                                    jnp.asarray(alphabet)[paths], 0)
                return symvals[best], metrics, symvals

            fn = self._run_fns.setdefault(("bursty", pathlen), jax.jit(_impl))
        return fn(y)


@functools.partial(
    jax.jit,
    static_argnames=("up", "pulselen", "k_syms", "pathlen", "burst", "guard"))
def _bursty_viterbi_run(y, alphabet, pretransitions, pulses, omegas,
                        start_mask, *, up, pulselen, k_syms, pathlen, burst,
                        guard):
    A = alphabet.shape[0]
    T = pretransitions.shape[1]
    ylen = y.shape[0]
    period = burst + guard
    W = k_syms + guard                    # carry window length in symbols
    guardlen = guard * up
    extlen = guardlen + pulselen
    inf = jnp.float32(jnp.inf)
    ypad = jnp.concatenate([y, jnp.zeros(extlen + up, dtype=y.dtype)])

    def synth_span(window, t_abs_start, nsamps_pulse, lead_syms):
        """Synthesize model samples at absolute times t_abs_start +
        [0, nsamps_pulse) from the last (lead_syms) symbols of ``window``
        whose final symbol sits at absolute symbol position covering
        t_abs_start's span end. Uses the full W-length window; conv start
        offset selects the span."""
        upw = jnp.zeros(W * up, dtype=window.dtype).at[::up].set(window)

        def one_src(pulse, omega):
            c = jnp.convolve(upw, pulse, mode="full")
            seg = jax.lax.dynamic_slice(c, ((W - 1 - lead_syms) * up,),
                                        (nsamps_pulse,))
            t = (t_abs_start + jnp.arange(nsamps_pulse)).astype(jnp.float32)
            return seg * jnp.exp(-1j * omega * t)
        return jnp.sum(jax.vmap(one_src)(pulses, omegas), axis=0)

    def normal_step(n, metrics, windows, paths):
        yseg = jax.lax.dynamic_slice(ypad, (n * up,), (pulselen,))
        valid = (n * up + jnp.arange(pulselen)) < ylen

        def per_state(p):
            def per_trans(t):
                q = pretransitions[p, t]
                w = jnp.concatenate([windows[q, 1:], alphabet[p][None]])
                s = synth_span(w, n * up, pulselen, 0)
                d = jnp.where(valid, yseg - s, 0.0)
                return jnp.sum(jnp.abs(d) ** 2), jnp.sum(jnp.abs(d[:up]) ** 2)
            return jax.vmap(per_trans)(jnp.arange(T))
        full, short = jax.vmap(per_state)(jnp.arange(A))
        pre_inf = jnp.isinf(metrics)[pretransitions]
        full = jnp.where(pre_inf, inf, full)
        short = jnp.where(pre_inf, inf, short)
        best_t = jnp.argmin(full, axis=1)
        best_q = jnp.take_along_axis(pretransitions, best_t[:, None], axis=1)[:, 0]
        all_inf = jnp.all(jnp.isinf(full), axis=1)
        new_metrics = jnp.where(
            all_inf, inf,
            metrics[best_q] + jnp.take_along_axis(short, best_t[:, None],
                                                  axis=1)[:, 0])
        new_paths = paths[best_q].at[:, n].set(jnp.arange(A, dtype=jnp.int32))
        new_windows = jnp.concatenate(
            [windows[best_q, 1:], alphabet[:, None]], axis=1)
        return new_metrics, new_windows, new_paths

    def guard_step(n, metrics, windows, paths):
        # freeze paths/metrics; the window still slides (a zero symbol enters)
        new_windows = jnp.concatenate(
            [windows[:, 1:], jnp.zeros((A, 1), dtype=windows.dtype)], axis=1)
        return metrics, new_windows, paths

    def newburst_step(n, metrics, windows, paths):
        yseg = jax.lax.dynamic_slice(ypad, ((n - guard) * up,), (extlen,))
        valid = ((n - guard) * up + jnp.arange(extlen)) < ylen

        def per_state(p):
            def per_prev(q):
                w = jnp.concatenate([windows[q, 1:], alphabet[p][None]])
                s = synth_span(w, (n - guard) * up, extlen, guard)
                d = jnp.where(valid, yseg - s, 0.0)
                full = jnp.sum(jnp.abs(d) ** 2)
                short = jnp.sum(jnp.abs(d[: guardlen + up]) ** 2)
                return full, short
            return jax.vmap(per_prev)(jnp.arange(A))
        full, short = jax.vmap(per_state)(jnp.arange(A))   # (A_p, A_q)
        pre_inf = jnp.isinf(metrics)[None, :]
        full = jnp.where(pre_inf | ~start_mask[:, None], inf, full)
        short = jnp.where(pre_inf | ~start_mask[:, None], inf, short)
        best_q = jnp.argmin(full, axis=1)
        all_inf = jnp.all(jnp.isinf(full), axis=1)
        new_metrics = jnp.where(
            all_inf, inf,
            metrics[best_q] + jnp.take_along_axis(short, best_q[:, None],
                                                  axis=1)[:, 0])
        new_paths = jnp.where(all_inf[:, None], paths,
                              paths[best_q].at[:, n].set(
                                  jnp.arange(A, dtype=jnp.int32)))
        new_windows = jnp.where(
            all_inf[:, None],
            jnp.concatenate([windows[:, 1:],
                             jnp.zeros((A, 1), windows.dtype)], axis=1),
            jnp.concatenate([windows[best_q, 1:], alphabet[:, None]], axis=1))
        return new_metrics, new_windows, new_paths

    # initial step (n = 0) — same as the base demodulator
    init_windows = jnp.zeros((A, W), dtype=alphabet.dtype)
    init_windows = init_windows.at[:, -1].set(alphabet)

    def init_metric(a):
        s = synth_span(init_windows[a], 0, pulselen, 0)
        return jnp.sum(jnp.abs(ypad[:up] - s[:up]) ** 2)
    metrics0 = jnp.where(start_mask, jax.vmap(init_metric)(jnp.arange(A)), inf)
    paths0 = jnp.zeros((A, pathlen), dtype=jnp.int32)
    paths0 = paths0.at[:, 0].set(jnp.arange(A, dtype=jnp.int32))
    windows0 = jnp.where(start_mask[:, None], init_windows, 0)

    def step(carry, n):
        metrics, windows, paths = carry
        phase = n % period
        mode = jnp.where(phase == 0, 1, jnp.where(phase >= burst, 2, 0))
        out = jax.lax.switch(
            mode,
            [lambda args: normal_step(*args),
             lambda args: newburst_step(*args),
             lambda args: guard_step(*args)],
            (n, metrics, windows, paths))
        return out, None

    (metrics, windows, paths), _ = jax.lax.scan(
        step, (metrics0, windows0, paths0), jnp.arange(1, pathlen))
    return paths, metrics
