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
        self.alphabet = jnp.asarray(alphabet, dtype=jnp.complex64)
        self.pretransitions = jnp.asarray(pretransitions, dtype=jnp.int32)
        if self.alphabet.shape[0] != self.pretransitions.shape[0]:
            raise ValueError("Number of transitions is inconsistent.")
        self.pulses = jnp.asarray(pulses, dtype=jnp.complex64)
        self.omegas = jnp.asarray(omegas, dtype=jnp.float32)
        self.up = int(up)
        if self.omegas.shape[0] != self.pulses.shape[0]:
            raise ValueError("Number of sources is inconsistent.")
        self.pulselen = int(self.pulses.shape[1])
        if self.pulselen % self.up != 0:
            raise ValueError("pulse length must be a multiple of up")
        self.pulse_len_in_syms = self.pulselen // self.up
        self.allowed_start_idx = np.asarray(allowed_start_idx)

    def run(self, y: jnp.ndarray, pathlen: int):
        """Demodulate ``pathlen`` symbols from ``y``. Returns (best path
        symbol values, final path metrics, all survivor paths)."""
        y = jnp.asarray(y, dtype=jnp.complex64)
        a_mask = np.zeros(self.alphabet.shape[0], dtype=bool)
        a_mask[self.allowed_start_idx] = True
        paths, metrics = _viterbi_run(
            y, self.alphabet, self.pretransitions, self.pulses, self.omegas,
            jnp.asarray(a_mask), up=self.up, pulselen=self.pulselen,
            k_syms=self.pulse_len_in_syms, pathlen=int(pathlen))
        best = jnp.argmin(metrics)
        best_path = self.alphabet[paths[best]]
        return best_path, metrics, self.alphabet[paths]


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
