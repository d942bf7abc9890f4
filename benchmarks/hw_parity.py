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
# ---- round-4 kernels on real hardware -------------------------------------
# fused WOLA (34-slot fold, flat-plane surface) vs the XLA banded-matmul path
from pydsproutines_tpu.ops.wola import wola, wola_planes_flat
nw = 64 * 4096
xw = (rng.standard_normal(nw) + 1j * rng.standard_normal(nw)).astype(np.complex64)
hw = rng.standard_normal(2048).astype(np.float32)
# f64 numpy truth (vectorized reference wola fold + IFFT)
nprime = nw // 64
idxw = np.arange(nprime)[:, None] * 64 - np.arange(2048)[None, :]
validw = idxw >= 0
winw = np.where(validw, xw.astype(np.complex128)[np.clip(idxw, 0, nw - 1)], 0)
folded = (winw * hw.astype(np.float64)).reshape(nprime, 32, 64).sum(axis=1)
ref = np.fft.ifft(folded, axis=-1) * 64
f_re, f_im = jax.jit(functools.partial(wola_planes_flat, dec=64, n=64))(
    jax.device_put(jnp.asarray(hw)),
    jax.device_put(jnp.asarray(xw.real)), jax.device_put(jnp.asarray(xw.imag)))
got = (np.asarray(f_re) + 1j * np.asarray(f_im)).reshape(ref.shape)
relw = np.abs(got - ref).max() / np.abs(ref).max()
ok_w = relw < 1e-5
print(f"wola fused flat (34-slot fold): rel {relw:.2e} "
      f"{'OK' if ok_w else 'BAD'}")
results.append(ok_w)

# bf16x3 upfirdn chain kernel vs scipy f64
import scipy.signal as sps
from pydsproutines_tpu.ops.filters import fir_upfirdn_planes_flat
nf = 1 << 20
xf = (rng.standard_normal(nf) + 1j * rng.standard_normal(nf)).astype(np.complex64)
h1 = rng.standard_normal(128).astype(np.float32) / 11.0
h2 = rng.standard_normal(95).astype(np.float32) / 10.0
o_re, o_im = jax.jit(functools.partial(fir_upfirdn_planes_flat, up=5, down=4))(
    jax.device_put(jnp.asarray(h1)), jax.device_put(jnp.asarray(h2)),
    jax.device_put(jnp.asarray(xf.real)), jax.device_put(jnp.asarray(xf.imag)))
h_up = np.zeros(128 * 5 - 4); h_up[::5] = h1
h_c = np.convolve(h_up, h2.astype(np.float64))
reff = np.stack([sps.upfirdn(h_c, xf.real.astype(np.float64), 5, 4),
                 sps.upfirdn(h_c, xf.imag.astype(np.float64), 5, 4)])
gotf = np.stack([np.asarray(o_re), np.asarray(o_im)])
reff = reff[:, :gotf.shape[1]]
relf = np.abs(gotf - reff).max() / np.abs(reff).max()
ok_f = relf < 2e-6
print(f"fir_upfirdn chain (HIGHEST kernel): rel {relf:.2e} "
      f"{'OK' if ok_f else 'BAD'}")
results.append(ok_f)

# medfilt MXU-count kernel: bit-exact vs scipy on real hardware
from pydsproutines_tpu.ops.filters import medfilt as _mf
nm = 1 << 19
xm = (rng.standard_normal(nm).astype(np.float32)) ** 2
gm = np.asarray(jax.jit(functools.partial(_mf, kernel_size=129))(
    jax.device_put(jnp.asarray(xm))))
rm = sps.medfilt(xm, 129)
ok_m = np.array_equal(gm, rm.astype(np.float32))
print(f"medfilt MXU-count kernel: {'bit-exact OK' if ok_m else 'BAD'}")
results.append(ok_m)

# ---- round-5 kernels on real hardware -------------------------------------
# three-stage fused CAF chain (fused3) at a 2M lane-exact triple
from pydsproutines_tpu.ops.pallas.fused_caf3 import get_caf3_plan, caf3_sweep
n3 = 1 << 21
cut3 = (rng.standard_normal(n3) + 1j * rng.standard_normal(n3)).astype(np.complex64)
rx3 = (0.1 * (rng.standard_normal(n3 + 2200)
              + 1j * rng.standard_normal(n3 + 2200))).astype(np.complex64)
rx3[7:7 + n3] += cut3
plan3 = get_caf3_plan(n3, "bf16")
cc3 = np.conj(cut3)


@jax.jit
def run3(rri, cri):
    rxr = rri[0].astype(jnp.bfloat16)
    rxi = rri[1].astype(jnp.bfloat16)
    return caf3_sweep(rxr, rxi, cri[0], cri[1], jnp.int32(2), 8, 1, plan3)


pk3, b3 = run3(jax.device_put(jnp.asarray(np.stack([rx3.real, rx3.imag]))),
               jax.device_put(jnp.asarray(np.stack([cc3.real, cc3.imag]))))
pk3 = np.asarray(pk3); b3 = np.asarray(b3)
tq3, tb3 = truth(cut3, rx3, np.arange(2, 10))
ok3_peak = int(np.argmax(pk3)) == int(np.argmax(tq3)) == 5
ok3_bin = b3[5] == tb3[5]
# raw |peak|^2 vs truth spectrum peak (bf16 sweep grade)
spec5 = np.abs(np.fft.fft(rx3[7:7+n3] * cc3)) ** 2
rel3 = abs(pk3[5] - spec5.max()) / spec5.max()
print(f"caf3 fused chain (n=2^21): peak_idx {'OK' if ok3_peak else 'BAD'}, "
      f"bin {'OK' if ok3_bin else 'BAD'}, mag rel {rel3:.2e}")
results.append(ok3_peak and ok3_bin and rel3 < 5e-2)

# plane-direct fused WOLA (n = 128) vs f64 numpy truth
nw2 = 128 * 2560
xw2 = (rng.standard_normal(nw2) + 1j * rng.standard_normal(nw2)).astype(np.complex64)
hw2 = np.hanning(128 * 16).astype(np.float32)
rows2 = nw2 // 128
idx2 = np.arange(rows2)[:, None] * 128 - np.arange(128 * 16)[None, :]
valid2 = idx2 >= 0
win2 = np.where(valid2, xw2.astype(np.complex128)[np.clip(idx2, 0, nw2 - 1)], 0)
fold2 = (win2 * hw2.astype(np.float64)).reshape(rows2, 16, 128).sum(axis=1)
ref2 = np.fft.ifft(fold2, axis=-1) * 128
f2r, f2i = jax.jit(functools.partial(wola_planes_flat, dec=128, n=128))(
    jax.device_put(jnp.asarray(hw2)),
    jax.device_put(jnp.asarray(xw2.real)), jax.device_put(jnp.asarray(xw2.imag)))
got2 = (np.asarray(f2r) + 1j * np.asarray(f2i)).reshape(ref2.shape)
rel2 = np.abs(got2 - ref2).max() / np.abs(ref2).max()
ok_w2 = rel2 < 1e-5
print(f"wola plane-direct fused (n=128): rel {rel2:.2e} "
      f"{'OK' if ok_w2 else 'BAD'}")
results.append(ok_w2)

# group-xcorr tone-dot formulation vs the XLA parity tier
from pydsproutines_tpu.ops.groupxcorr import GroupXcorrCZT
glen, ng = 256, 4
gst = np.arange(ng) * 640
gln = np.full(ng, glen)
spang = int(gst[-1] + glen)
yg = (rng.standard_normal(spang) + 1j * rng.standard_normal(spang)).astype(np.complex64)
rxg = (0.05 * (rng.standard_normal(spang + 400)
               + 1j * rng.standard_normal(spang + 400))).astype(np.complex64)
rxg[133:133 + spang] += yg
bwg = 1e6 / glen / 2
gx = GroupXcorrCZT(yg, gst, gln, -8 * bwg, 7 * bwg, bwg, 1e6)
sh = np.arange(100, 164)
# the axon transport cannot move complex arrays: form rx on device
rxg_dev = jax.jit(lambda p: jax.lax.complex(p[0], p[1]))(
    jax.device_put(jnp.asarray(np.stack([rxg.real, rxg.imag]))))
refg, _ = gx.xcorr(rxg_dev, jnp.asarray(sh), fused=False)
cg = gx._fused_consts(batch=64, step=1)
gotg = np.asarray(gx._xcorr_fused(rxg_dev, jnp.asarray(sh), cg))
refg = np.asarray(refg)
okg = (np.unravel_index(np.argmax(refg), refg.shape)
       == np.unravel_index(np.argmax(gotg), gotg.shape))
relg = abs(gotg.max() - refg.max()) / refg.max()
print(f"group-xcorr tone-dot: peak {'OK' if okg else 'BAD'}, "
      f"qf2 rel {relg:.2e}")
results.append(okg and relg < 5e-2)

print("HW PARITY:", "PASS" if all(results) else "FAIL")
