"""WOLA (weighted overlap-add) polyphase channelizer.

Reference semantics: /root/reference/filterRoutines.py:578 (``wola``) and the
threaded C DLLs (cpuWolaDll.c:107, multiChannelWola.c:112):

    out[nprime, :] = N * ifft( dft_in )        with
    dft_in[a] = sum_b x[nprime*Dec - (b*N + a)] * f_tap[b*N + a]

for nprime in [0, floor(len(x)/Dec)), with x implicitly zero before index 0,
and — when N == 2*Dec — a phase correction that negates the odd channels of
odd output rows (filterRoutines.py:627-629, cpuWolaDll.c:87-94).

TPU-first design: instead of striping ``nprime`` across CPU threads, all
output rows are computed at once — a windowed gather into a (nprimePts, L)
matrix, a polyphase fold reshape-sum to (nprimePts, N), and one batched IFFT.
XLA fuses the gather+multiply+fold; the IFFT batches across rows. The
streaming ``Channeliser`` keeps the reference's delay/warm-up-discard
semantics so block outputs concatenate seamlessly. Channel/time sharding over
a device mesh lives in pydsproutines_tpu.parallel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pydsproutines_tpu.utils.freq import make_freq


@functools.partial(jax.jit, static_argnames=("dec", "n"), inline=True)
def wola(f_tap: jnp.ndarray, x: jnp.ndarray, dec: int, n: int | None = None,
         row_offset=0) -> jnp.ndarray:
    """WOLA channelize ``x`` into ``n`` channels decimated by ``dec``.

    Matches the reference pure-python wola() (filterRoutines.py:578)
    including the odd-row phase flip for n == 2*dec. f_tap length must be an
    integer multiple of n; n must equal dec or 2*dec.

    ``row_offset`` shifts the parity of the odd-row phase flip: when
    processing a block whose first output row has global index r0, pass
    ``row_offset=r0`` so streamed/sharded blocks flip the same rows the
    whole-signal computation would. (The reference's streaming C path flips by
    local row index, which desynchronizes across blocks when the warm-up row
    count is odd — this is a deliberate correctness fix.)
    """
    if n is None:
        n = dec
    if n != dec and n != 2 * dec:
        raise ValueError("Only N == Dec or N == 2*Dec supported (as reference).")
    L = f_tap.shape[-1]
    if L % n != 0:
        raise ValueError("Filter tap length must be an integer multiple of N.")

    nprime_pts = x.shape[-1] // dec

    if n == dec and not jnp.issubdtype(jnp.asarray(f_tap).dtype,
                                       jnp.complexfloating):
        from pydsproutines_tpu.ops.pallas.wola_fused import (
            wola_fused, wola_fused_viable)
        if (jax.devices()[0].platform == "tpu"
                and wola_fused_viable(n, dec, L, nprime_pts, x.dtype)):
            # single-kernel fold+IDFT: one HBM read + one HBM write
            return wola_fused(f_tap, x, dec, n)

    if n == dec:
        # Polyphase fast path: dft_in[r, a] = sum_b x[r*N - b*N - a] * h[b*N+a]
        # computed directly on the natural xq = x.reshape(rows, N) layout:
        # x[(r-b)N - a] = xq[r-b-1, N-a] (a>=1) / xq[r-b, 0] (a==0), so the
        # fold is a per-channel banded matmul over row blocks with the
        # channel permutation a <-> (N-a)%N absorbed into the tap matrix and
        # the IDFT matrix rows. No phase matrix is ever built (the previous
        # grouped depthwise conv needed a lane-reversed phase matrix costing
        # a measured 0.7 ms/8M on v5e and ran the fold on the VPU; the
        # banded-matmul form rides the MXU — see
        # benchmarks/exp_wola_breakdown.py).
        g = _wola_fold_matmul(f_tap, x, n, nprime_pts)   # c-order columns
        dft_in = None
    else:
        taps = jnp.flip(f_tap.astype(x.dtype))  # index L-1-j <-> f_tap[j]
        # window for output row i covers x[i*dec - (L-1) .. i*dec]
        xp = jnp.concatenate([jnp.zeros(L - 1, dtype=x.dtype), x])

        def row(i):
            w = jax.lax.dynamic_slice(xp, (i * dec,), (L,))
            prod = w * taps
            folded = jnp.flip(prod).reshape(L // n, n).sum(axis=0)
            return folded

        dft_in = jax.vmap(row)(jnp.arange(nprime_pts))
    # The final per-row length-N inverse DFT: for the small N used by
    # channelizers this is an MXU matmul against the conjugate DFT matrix
    # (out = ifft(dft_in)*N = dft_in @ conj(W_N)), much faster than XLA's
    # batched small FFT on TPU. The matmul-fold path hands back columns in
    # c = (N-a) % N order, absorbed by permuting the IDFT matrix ROWS.
    import numpy as _np
    k = _np.arange(n, dtype=_np.float64)
    wconj = _np.exp(2j * _np.pi * _np.mod(_np.outer(k, k), n) / n)
    if dft_in is None:
        if n <= 2048:
            perm = (-_np.arange(n)) % n        # row c holds phase a=(N-c)%N
            out = g @ jnp.asarray(wconj[perm].astype(x.dtype))
        else:
            out = jnp.fft.ifft(g[:, (-_np.arange(n)) % n], axis=-1) * n
    elif n <= 2048:
        out = dft_in @ jnp.asarray(wconj.astype(x.dtype))
    else:
        out = jnp.fft.ifft(dft_in, axis=-1) * n

    if n == 2 * dec:
        # negate odd channels on (globally) odd rows
        row_sign = jnp.where((jnp.arange(nprime_pts) + row_offset) % 2 == 1,
                             -1.0, 1.0)
        chan_odd = (jnp.arange(n) % 2 == 1)
        flip = jnp.where(chan_odd[None, :], row_sign[:, None], 1.0)
        out = out * flip.astype(out.dtype)
    return out.astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("dec", "n"), inline=True)
def wola_planes(f_tap: jnp.ndarray, re: jnp.ndarray, im: jnp.ndarray,
                dec: int, n: int | None = None, row_offset=0):
    """Quadrature-plane WOLA channelize: float32 planes in, planes out.

    Identical numbers to ``wola(f_tap, re + 1j*im, ...)`` but the complex
    array never materializes: the fused Pallas kernel consumes and produces
    (rows, n) float32 planes directly (pure reshape views), so the
    plane<->complex interleave relayouts — a measured ~0.4 ms/8M on v5e,
    ~40%% of the whole channelize — disappear. This is the TPU-native I/O
    layout (the axon transport cannot transfer complex arrays at all);
    ``wola`` remains the drop-in complex-API surface
    (reference filterRoutines.py:578).

    Returns ``(out_re, out_im)``, each (len(re)//dec, n) float32.
    """
    if n is None:
        n = dec
    rows = re.shape[-1] // dec
    if n == dec:
        from pydsproutines_tpu.ops.pallas.wola_fused import (
            wola_fused_planes2, wola_fused_viable)
        if (jax.devices()[0].platform == "tpu"
                and wola_fused_viable(n, dec, f_tap.shape[-1], rows,
                                      jnp.complex64)):
            xr = re[: rows * n].reshape(rows, n).astype(jnp.float32)
            xi = im[: rows * n].reshape(rows, n).astype(jnp.float32)
            return wola_fused_planes2(f_tap, xr, xi, dec, n)
    out = wola(f_tap, jax.lax.complex(re.astype(jnp.float32),
                                      im.astype(jnp.float32)),
               dec, n, row_offset=row_offset)
    return jnp.real(out), jnp.imag(out)


@functools.partial(jax.jit, static_argnames=("dec", "n"), inline=True)
def wola_planes_flat(f_tap: jnp.ndarray, re: jnp.ndarray, im: jnp.ndarray,
                     dec: int, n: int | None = None, row_offset=0):
    """Flat-plane WOLA channelize: the zero-relayout TPU hot path.

    ``re``/``im`` are 1-D float32 quadrature planes of the input samples;
    returns 1-D planes holding the row-major (rows, n) channel matrix —
    bit-identical bytes to ``wola_planes``'s 2-D outputs, and exactly what
    a host consumer sees after ``np.asarray(...).reshape(rows, n)``.

    Why flat: a flat f32 array IS the kernel's (len/128, 128) pair-row
    tiling physically, while a (rows, 64) plane is lane-padded to 128 on
    TPU and costs a relayout in each direction (measured ~0.4 ms/8M on
    v5e — half the kernel's own runtime). See
    ops/pallas/wola_fused.wola_fused_planes_flat.
    """
    if n is None:
        n = dec
    rows = re.shape[-1] // dec
    if n == dec:
        from pydsproutines_tpu.ops.pallas.wola_fused import (
            wola_fused_planes_flat, wola_fused_viable)
        if (jax.devices()[0].platform == "tpu"
                and wola_fused_viable(n, dec, f_tap.shape[-1], rows,
                                      jnp.complex64)):
            return wola_fused_planes_flat(f_tap, re, im, dec, n)
    o_re, o_im = wola_planes(f_tap, re, im, dec, n, row_offset=row_offset)
    return o_re.reshape(-1), o_im.reshape(-1)


def _wola_fold_matmul(f_tap, x, n, nprime_pts, kblk: int = 128):
    """Polyphase WOLA fold (N == Dec) as a per-channel banded matmul on the
    natural xq = x.reshape(rows, N) layout.

    dft_in[k, a] = sum_b h[bN + a] * x[(k-b)N - a] with
      x[(k-b)N - a] = xq[k-b-1, N-a]  (a >= 1)
      x[(k-b)N]     = xq[k-b,   0  ]  (a == 0),
    so column c of xq feeds phase a = (N-c) % N through a banded tap matrix
    whose row alignment differs by one for c == 0. Output g[k, c] =
    dft_in[k, (N-c)%N]; the caller permutes the IDFT matrix rows, so no data
    permutation ever happens. Blocks of ``kblk`` output rows contract one
    (kblk+B)-row window against a (N, kblk, kblk+B) banded tap tensor — a
    batched MXU dot_general (the depthwise-conv formulation ran on the VPU
    and needed a lane-reversed phase-matrix build; measured 2.7 -> ~2.0
    ms/8M on v5e).
    """
    L = f_tap.shape[-1]
    B = L // n
    rows = nprime_pts
    nblk = -(-rows // kblk)
    w = kblk + B
    rdt = f_tap.dtype if not jnp.issubdtype(f_tap.dtype, jnp.complexfloating) \
        else jnp.float32

    # static (n, kblk, w) index/valid maps, traced tap VALUES gathered in one
    # shot: K = where(valid, f_tap[tap_idx], 0). A scatter (.at[].set) here
    # measured ~1 ms/call when wola runs nested inside another jit (the tap
    # constants stop const-folding across the call boundary); the gather
    # form is a single cheap pass either way.
    c_g = np.arange(n)[:, None, None]
    t_g = np.arange(kblk)[None, :, None]
    tau_g = np.arange(w)[None, None, :]
    # c == 0: tau = t + B - b, tap = b*n;  c >= 1: tau = t + B - 1 - b,
    # tap = b*n + (n - c)
    b_g = np.where(c_g == 0, t_g + B - tau_g, t_g + B - 1 - tau_g)
    valid = (b_g >= 0) & (b_g < B)
    tap_idx = np.clip(b_g, 0, B - 1) * n + np.where(c_g == 0, 0, n - c_g)
    K = jnp.where(jnp.asarray(valid),
                  jnp.real(f_tap).astype(rdt)[jnp.asarray(tap_idx)], 0)

    xq = x[: rows * n].reshape(rows, n)
    rr = -(-w // kblk)
    pp = jnp.concatenate([
        jnp.zeros((B, n), x.dtype), xq,
        jnp.zeros((nblk * kblk - rows + rr * kblk, n), x.dtype)])
    parts = [jax.lax.slice(pp, (i * kblk, 0),
                           (i * kblk + nblk * kblk, n)).reshape(nblk, kblk, n)
             for i in range(rr)]
    win = jnp.concatenate(parts, axis=1)[:, :w]      # (nblk, w, n)
    win_c = jnp.moveaxis(win, -1, 0)                 # (n, nblk, w)
    ein = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        gr = ein("cnw,ctw->cnt", win_c.real.astype(rdt), K)
        gi = ein("cnw,ctw->cnt", win_c.imag.astype(rdt), K)
        g = jax.lax.complex(gr, gi)
    else:
        g = ein("cnw,ctw->cnt", win_c.astype(rdt), K)
    g = jnp.moveaxis(g, 0, -1).reshape(nblk * kblk, n)[:rows]
    return g.astype(x.dtype)


class Channeliser:
    """Streaming WOLA channelizer (reference Channeliser,
    filterRoutines.py:638): keeps a filter-length delay line, prepends it each
    call, and discards the first len(f_tap)/Dec warm-up rows so consecutive
    blocks concatenate exactly.
    """

    def __init__(self, num_taps: int | None = None, num_channels: int = 64,
                 dec: int | None = None, f_tap=None, dtype=jnp.complex64):
        if dec is None:
            dec = num_channels
        self.dec = int(dec)
        self.num_channels = int(num_channels)
        if f_tap is None:
            from scipy import signal as sps
            f_tap = sps.firwin(num_taps, 1.0 / dec)
        self.f_tap = jnp.asarray(f_tap, dtype=jnp.float32)
        self.dtype = jnp.dtype(dtype)
        if self.f_tap.shape[-1] % self.num_channels != 0:
            raise ValueError("numTaps must be a multiple of numChannels.")
        self.jump = int(self.f_tap.shape[-1] // self.dec)
        self.reset()

    def reset(self):
        self.delay = jnp.zeros(self.f_tap.shape[-1], dtype=self.dtype)
        self._samples_consumed = 0

    def channelise(self, x: jnp.ndarray) -> jnp.ndarray:
        """Channelize one block; returns (floor(len(x)/dec), num_channels).

        Requires len(x) to be a multiple of dec for seamless streaming (the
        reference C path requires the same of its input length).
        """
        x = jnp.asarray(x, dtype=self.dtype)
        y = jnp.concatenate([self.delay, x])
        # local row i <-> global output row (consumed/dec) - jump + i, so the
        # N == 2*Dec phase flip stays aligned with the whole-signal result.
        row_offset = self._samples_consumed // self.dec - self.jump
        channels = wola(self.f_tap, y, self.dec, self.num_channels,
                        row_offset=row_offset)
        self.delay = x[-self.f_tap.shape[-1]:]
        self._samples_consumed += int(x.shape[-1])
        return channels[self.jump:, :]

    def channel_freqs(self, fs: float = 1.0):
        """Centre frequency of each channel (reference channelFreqs)."""
        return make_freq(self.num_channels, fs)

    def channel_fs(self, fs: float = 1.0) -> float:
        """Per-channel output sampling rate (reference channelFs)."""
        return fs / self.dec
