"""Real-chip parity: the fused Pallas CAF kernel and planes paths vs numpy
truth (all interpret-mode tests aside, this drives the ACTUAL Mosaic kernels
on hardware; measured round 2: peak index + bin exact at n=4k/8k/64k, QF^2
rel err ~1e-4, off-peak bin agreement >=94% — bf16 noise-floor tie jitter)."""
import sys, functools
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

rng = np.random.default_rng(7)
def truth(cut, rx, shifts):
    cc = np.conj(cut); cns = np.sum(np.abs(cc)**2)
    qf2 = np.zeros(len(shifts)); bins = np.zeros(len(shifts), np.int64)
    for i, s in enumerate(shifts):
        w = rx[s:s+len(cut)]
        spec = np.abs(np.fft.fft(w*cc))**2
        bins[i] = np.argmax(spec)
        qf2[i] = spec[bins[i]]/cns/np.sum(np.abs(w)**2)
    return qf2, bins

results = []
for n, nsh, batch, step in [(4096, 32, 8, 1), (8192, 16, 4, 3), (65536, 16, 16, 1)]:
    cut = (rng.standard_normal(n) + 1j*rng.standard_normal(n)).astype(np.complex64)
    rxlen = n + step*(nsh+batch) + 300
    rx = (0.1*(rng.standard_normal(rxlen) + 1j*rng.standard_normal(rxlen))).astype(np.complex64)
    plant = step * 3
    rx[plant:plant+n] += cut
    cut_ri = np.stack([cut.real, cut.imag])
    rx_ri = np.stack([rx.real, rx.imag])

    from pydsproutines_tpu.ops.xcorr import _fast_xcorr_impl, select_xcorr_path
    path, _ = select_xcorr_path(n, rxlen, np.complex64, True, False, True, batch, step)
    @jax.jit
    def run(cri, rri):
        c = jax.lax.complex(cri[0], cri[1])
        r = jax.lax.complex(rri[0], rri[1])
        qf2, bins = _fast_xcorr_impl(c, r, jnp.arange(nsh)*step, n=n,
                                     freqsearch=True, output_caf=False,
                                     abs_result=True, batch_size=batch, step=step)
        return qf2, bins.astype(jnp.int32)
    q, b = run(jax.device_put(jnp.asarray(cut_ri)), jax.device_put(jnp.asarray(rx_ri)))
    q = np.asarray(q); b = np.asarray(b)
    shifts = np.arange(nsh)*step
    tq, tb = truth(cut, rx, shifts)
    istar = int(np.argmax(tq))
    ok_peak = int(np.argmax(q)) == istar
    ok_bin = b[istar] == tb[istar]
    relerr = abs(q[istar]-tq[istar])/tq[istar]
    bins_match = float(np.mean(b == tb))
    print(f"n={n} path={path}: peak_idx {'OK' if ok_peak else 'BAD'}, "
          f"peak_bin {'OK' if ok_bin else 'BAD'}, qf2 relerr {relerr:.2e}, "
          f"bins match {bins_match:.2%}")
    results.append(ok_peak and ok_bin and relerr < 2e-2)
    sys.stdout.flush()
print("HW PARITY:", "PASS" if all(results) else "FAIL")
