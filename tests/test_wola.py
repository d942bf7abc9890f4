import jax.numpy as jnp
import numpy as np
import scipy.signal as sps

from pydsproutines_tpu.ops.wola import wola, Channeliser


def _np_wola_reference(f_tap, x, Dec, N):
    """Direct re-derivation of the reference wola() loop
    (filterRoutines.py:578)."""
    L = len(f_tap)
    nprimePts = len(x) // Dec
    out = np.zeros((nprimePts, N), dtype=np.complex128)
    for nprime in range(nprimePts):
        n = nprime * Dec
        dft_in = np.zeros(N, dtype=np.complex128)
        for a in range(N):
            for b in range(L // N):
                if n - (b * N + a) >= 0:
                    dft_in[a] += x[n - (b * N + a)] * f_tap[b * N + a]
        out[nprime] = np.fft.ifft(dft_in) * N
        if Dec * 2 == N and nprime % 2 != 0:
            out[nprime][1::2] = -out[nprime][1::2]
    return out


def test_wola_matches_reference_n_eq_dec(rng):
    N = Dec = 8
    f_tap = sps.firwin(8 * N, 1.0 / Dec)
    x = (rng.standard_normal(256) + 1j * rng.standard_normal(256))
    ours = np.asarray(wola(jnp.asarray(f_tap), jnp.asarray(x), Dec, N))
    ref = _np_wola_reference(f_tap, x, Dec, N)
    assert ours.shape == ref.shape
    assert np.max(np.abs(ours - ref)) < 1e-9


def test_wola_matches_reference_n_eq_2dec(rng):
    Dec, N = 4, 8
    f_tap = sps.firwin(4 * N, 1.0 / Dec)
    x = (rng.standard_normal(200) + 1j * rng.standard_normal(200))
    ours = np.asarray(wola(jnp.asarray(f_tap), jnp.asarray(x), Dec, N))
    ref = _np_wola_reference(f_tap, x, Dec, N)
    assert np.max(np.abs(ours - ref)) < 1e-9


def test_wola_channel_extraction(rng):
    """A tone centred on channel k should appear with dominant energy in
    channel k of the WOLA output."""
    N = Dec = 16
    fs = 1.0
    f_tap = sps.firwin(8 * N, 1.0 / Dec)
    k = 3
    f0 = k / N * fs
    nsamps = 4096
    t = np.arange(nsamps)
    x = np.exp(1j * 2 * np.pi * f0 * t / fs)
    out = np.asarray(wola(jnp.asarray(f_tap), jnp.asarray(x), Dec, N))
    energy = np.mean(np.abs(out[8:]) ** 2, axis=0)  # skip warm-up
    assert np.argmax(energy) == k
    assert energy[k] > 100 * np.sort(energy)[-2]


def test_channeliser_streaming_continuity(rng):
    """Two sequential channelise() calls must equal one call on the
    concatenated input (reference Channeliser delay + warm-up discard)."""
    Dec = N = 8
    numtaps = 4 * N
    x = (rng.standard_normal(512) + 1j * rng.standard_normal(512)).astype(np.complex64)

    c1 = Channeliser(num_taps=numtaps, num_channels=N, dec=Dec)
    out_a = np.asarray(c1.channelise(jnp.asarray(x[:256])))
    out_b = np.asarray(c1.channelise(jnp.asarray(x[256:])))
    seq = np.vstack([out_a, out_b])

    c2 = Channeliser(num_taps=numtaps, num_channels=N, dec=Dec)
    full = np.asarray(c2.channelise(jnp.asarray(x)))

    assert seq.shape == full.shape
    assert np.max(np.abs(seq - full)) < 1e-5


def test_channeliser_freqs():
    c = Channeliser(num_taps=32, num_channels=8, dec=8)
    f = np.asarray(c.channel_freqs(8000.0))
    assert f[0] == 0
    assert f.min() < 0  # wrapped axis
    assert c.channel_fs(8000.0) == 1000.0


def test_wola_fused_kernel_parity(rng):
    """Fused fold+IDFT Pallas kernel (interpret mode) matches wola() across
    tail shapes, including the single-grid-step edge (nsteps == 1)."""
    from pydsproutines_tpu.ops.pallas.wola_fused import (wola_fused,
                                                         wola_fused_viable)

    nch = 64
    h = rng.standard_normal(2048).astype(np.float32)
    for rows in (600, 2048, 4099):
        n = nch * rows
        x = (rng.standard_normal(n)
             + 1j * rng.standard_normal(n)).astype(np.complex64)
        ref = np.asarray(wola(jnp.asarray(h), jnp.asarray(x), nch, nch))
        got = np.asarray(wola_fused(jnp.asarray(h), jnp.asarray(x), nch, nch,
                                    interpret=True))
        err = np.max(np.abs(ref - got)) / np.max(np.abs(ref))
        assert got.shape == ref.shape
        assert err < 1e-5, (rows, err)


def test_wola_fused_viability_gate():
    from pydsproutines_tpu.ops.pallas.wola_fused import wola_fused_viable

    assert wola_fused_viable(64, 64, 2048, 131072, np.complex64)
    assert not wola_fused_viable(64, 32, 2048, 131072, np.complex64)  # 2*dec
    assert not wola_fused_viable(48, 48, 1536, 131072, np.complex64)  # lanes
    assert not wola_fused_viable(64, 64, 2048, 131072, np.complex128)
    assert not wola_fused_viable(64, 64, 64 * 4, 131072, np.complex64)  # B%8
    assert not wola_fused_viable(64, 64, 2048, 100, np.complex64)  # tiny


def test_wola_planes_matches_complex_api(rng):
    """wola_planes (quadrature-plane I/O) must equal wola on the complex
    array, on both supported geometries (fallback route on CPU; the fused
    route's parity is covered by test_wola_fused_kernel_parity)."""
    from pydsproutines_tpu.ops.wola import wola, wola_planes

    h = rng.standard_normal(512).astype(np.float32)
    x = (rng.standard_normal(64 * 300)
         + 1j * rng.standard_normal(64 * 300)).astype(np.complex64)
    for dec, n in ((64, 64), (32, 64)):
        ref = np.asarray(wola(jnp.asarray(h), jnp.asarray(x), dec, n))
        o_re, o_im = wola_planes(jnp.asarray(h),
                                 jnp.asarray(x.real.astype(np.float32)),
                                 jnp.asarray(x.imag.astype(np.float32)),
                                 dec, n)
        got = np.asarray(o_re) + 1j * np.asarray(o_im)
        assert got.shape == ref.shape
        assert np.max(np.abs(got - ref)) < 1e-9


def test_wola_planes_flat_matches(rng):
    """Flat-plane surface returns the row-major channel matrix bytes:
    CPU fallback here; the fused flat kernel in interpret mode below."""
    from pydsproutines_tpu.ops.wola import wola, wola_planes_flat

    h = rng.standard_normal(512).astype(np.float32)
    x = (rng.standard_normal(64 * 300)
         + 1j * rng.standard_normal(64 * 300)).astype(np.complex64)
    ref = np.asarray(wola(jnp.asarray(h), jnp.asarray(x), 64, 64))
    f_re, f_im = wola_planes_flat(jnp.asarray(h),
                                  jnp.asarray(x.real.astype(np.float32)),
                                  jnp.asarray(x.imag.astype(np.float32)),
                                  64, 64)
    got = (np.asarray(f_re) + 1j * np.asarray(f_im)).reshape(ref.shape)
    assert np.max(np.abs(got - ref)) < 1e-9


def test_wola_fused_flat_kernel_parity(rng):
    """Fused flat-plane kernel (interpret mode) == 2-D plane kernel bytes,
    across tail shapes incl. odd rows (pair padding) and nsteps == 1."""
    from pydsproutines_tpu.ops.pallas.wola_fused import (
        wola_fused_planes2, wola_fused_planes_flat)

    nch = 64
    h = rng.standard_normal(2048).astype(np.float32)
    for rows in (600, 2048, 4099):
        n = nch * rows
        re = rng.standard_normal(n).astype(np.float32)
        im = rng.standard_normal(n).astype(np.float32)
        o2_re, o2_im = wola_fused_planes2(
            jnp.asarray(h), jnp.asarray(re.reshape(rows, nch)),
            jnp.asarray(im.reshape(rows, nch)), nch, nch, interpret=True)
        f_re, f_im = wola_fused_planes_flat(
            jnp.asarray(h), jnp.asarray(re), jnp.asarray(im), nch, nch,
            interpret=True)
        assert np.array_equal(np.asarray(f_re),
                              np.asarray(o2_re).reshape(-1)), rows
        assert np.array_equal(np.asarray(f_im),
                              np.asarray(o2_im).reshape(-1)), rows


def test_wola_fused_direct_kernel_parity(rng):
    """Round-5 plane-direct fused kernel (n in {128, 256}, interpret mode)
    matches wola() across tail shapes, incl. flat-plane I/O byte parity."""
    from pydsproutines_tpu.ops.pallas.wola_fused import (
        wola_fused, wola_fused_planes_flat, wola_fused_viable)

    for nch, B in ((128, 16), (256, 8)):
        h = np.hanning(nch * B).astype(np.float32)
        assert wola_fused_viable(nch, nch, nch * B, 4096, np.complex64)
        for rows in (301, 2100):
            x = (rng.standard_normal(rows * nch)
                 + 1j * rng.standard_normal(rows * nch)).astype(np.complex64)
            ref = np.asarray(wola(jnp.asarray(h), jnp.asarray(x), nch, nch))
            got = np.asarray(wola_fused(jnp.asarray(h), jnp.asarray(x),
                                        nch, nch, interpret=True))
            err = np.max(np.abs(ref - got)) / np.max(np.abs(ref))
            assert got.shape == ref.shape
            assert err < 1e-5, (nch, rows, err)
        # flat-plane surface: same bytes as the complex API
        fr, fi = wola_fused_planes_flat(
            jnp.asarray(h), jnp.real(jnp.asarray(x)).astype(jnp.float32),
            jnp.imag(jnp.asarray(x)).astype(jnp.float32), nch, nch,
            interpret=True)
        flat = np.asarray(fr) + 1j * np.asarray(fi)
        assert np.array_equal(flat.reshape(ref.shape), got)
