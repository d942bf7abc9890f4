"""Multi-host layer tests: a real 2-process CPU cluster (gloo collectives)
exercising the WOLA halo exchange and CAF peak reduction ACROSS process
boundaries, plus heartbeat failure detection and elastic resume.

The 2-process tests spawn subprocesses (jax.distributed cannot re-initialize
inside the running test process) — each worker gets 2 virtual CPU devices, so
the 4-device mesh spans a process boundary between devices 1 and 2; the
ppermute halo crossing that edge rides the cross-process path the driver's
virtual single-process mesh never covers.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import json, os, sys
proc = int(sys.argv[1]); port = sys.argv[2]; outdir = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.pop("JAX_PLATFORMS", None)
import jax
jax.config.update("jax_platforms", "cpu")
# the distributed runtime must come up before anything touches the backend
# (importing the package compiles nothing but may query devices)
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=2, process_id=proc)
sys.path.insert(0, "@REPO@")
from pydsproutines_tpu.parallel.multihost import (
    init_distributed, flat_mesh, shard_local_blocks, process_shard_bounds)
from pydsproutines_tpu.parallel import sharded_wola, sharded_lfilter
from pydsproutines_tpu.parallel.xcorr import sharded_caf_peak
import jax.numpy as jnp
import numpy as np

assert init_distributed()   # idempotent: already inside the cluster
assert jax.process_count() == 2 and len(jax.devices()) == 4
mesh = flat_mesh("dsp")

# deterministic full scene in every process; each process owns half
rng = np.random.default_rng(7)
total = 4096
x_full = (rng.standard_normal(total) + 1j * rng.standard_normal(total)
          ).astype(np.complex64)
lo, hi = process_shard_bounds(total, 2, proc)
x_local = x_full[lo:hi]
gx = shard_local_blocks(x_local, mesh, "dsp")

# 1) time-sharded FIR across the process boundary == local reference
taps = np.hanning(33).astype(np.float32)
from pydsproutines_tpu.ops.filters import lfilter_fir
y = sharded_lfilter(jnp.asarray(taps), gx, mesh, "dsp")
y_ref = np.asarray(lfilter_fir(jnp.asarray(taps), jnp.asarray(x_full)))
err_fir = 0.0
for shard in y.addressable_shards:
    sl = shard.index[0]
    err_fir = max(err_fir, float(np.max(np.abs(
        np.asarray(shard.data) - y_ref[sl]))))

# 2) time-sharded WOLA across the process boundary == local reference
from pydsproutines_tpu.ops.wola import wola
dec, nch = 8, 8
f_tap = np.hanning(64).astype(np.float32)
ch = sharded_wola(jnp.asarray(f_tap), gx, dec, nch, mesh, "dsp")
ch_ref = np.asarray(wola(jnp.asarray(f_tap), jnp.asarray(x_full), dec, nch))
err_wola = 0.0
for shard in ch.addressable_shards:
    sl = shard.index[0]
    err_wola = max(err_wola, float(np.max(np.abs(
        np.asarray(shard.data) - ch_ref[sl]))))

# 3) shift-sharded CAF peak reduced across processes == local argmax
cut = x_full[1000:1512].copy()
shifts = np.arange(512, 1536, dtype=np.int32)
gshifts = shard_local_blocks(shifts[proc * 512: (proc + 1) * 512],
                             mesh, "dsp")
peak, sbest, fbest = sharded_caf_peak(
    jnp.asarray(cut), jnp.asarray(x_full), gshifts, mesh, "dsp",
    batch_size=64)
res = dict(proc=proc, err_fir=err_fir, err_wola=err_wola,
           peak=float(np.asarray(peak)), sbest=int(np.asarray(sbest)),
           fbest=int(np.asarray(fbest)))
with open(os.path.join(outdir, f"res_{proc}.json"), "w") as f:
    json.dump(res, f)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_cluster(tmp_path):
    """FIR + WOLA halo exchange and CAF peak reduction across a REAL process
    boundary match the single-process references exactly."""
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER.replace("@REPO@", str(REPO)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PYTHONPATH")}
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), str(port), str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    outs = [p.communicate(timeout=420)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    results = [json.loads((tmp_path / f"res_{i}.json").read_text())
               for i in range(2)]
    for r in results:
        assert r["err_fir"] < 1e-5
        assert r["err_wola"] < 1e-4
    # replicated scalar peak identical on both processes, at the planted
    # template location (shift 1000 lies inside the scanned range)
    assert results[0]["sbest"] == results[1]["sbest"] == 1000
    assert results[0]["fbest"] == results[1]["fbest"] == 0
    assert abs(results[0]["peak"] - results[1]["peak"]) < 1e-9
    assert results[0]["peak"] > 0.99


def test_process_shard_bounds():
    from pydsproutines_tpu.parallel.multihost import process_shard_bounds
    assert process_shard_bounds(100, 4, 0) == (0, 25)
    assert process_shard_bounds(100, 4, 3) == (75, 100)
    assert process_shard_bounds(100, 4, 2, halo=10) == (40, 75)
    assert process_shard_bounds(100, 4, 0, halo=10) == (0, 25)
    with pytest.raises(ValueError):
        process_shard_bounds(101, 4, 0)


def test_read_local_capture(tmp_path):
    """Per-host seek-based reads tile the capture exactly (with halo)."""
    from pydsproutines_tpu.parallel.multihost import read_local_capture
    from pydsproutines_tpu.io.binfiles import simple_bin_read
    rng = np.random.default_rng(3)
    raw = rng.integers(-1000, 1000, 2 * 64, dtype=np.int16)
    path = tmp_path / "cap.bin"
    raw.tofile(path)
    full = simple_bin_read(path)
    parts = [read_local_capture(path, 64, 4, i) for i in range(4)]
    np.testing.assert_array_equal(np.concatenate(parts), full)
    withhalo = read_local_capture(path, 64, 4, 2, halo=5)
    np.testing.assert_array_equal(withhalo, full[32 - 5: 48])


def test_heartbeat_stale_detection(tmp_path):
    from pydsproutines_tpu.parallel.multihost import Heartbeat
    hb0 = Heartbeat(tmp_path, 0, interval=0.0)
    hb1 = Heartbeat(tmp_path, 1, interval=0.0)
    hb0.beat({"block": 3}, force=True)
    hb1.beat({"block": 5}, force=True)
    assert hb0.stale_processes(timeout=60.0, expected=2) == []
    # process 2 never started
    assert hb0.stale_processes(timeout=60.0, expected=3) == [2]
    # age out process 1's beacon
    d = json.loads(hb1.path.read_text())
    d["time"] = time.time() - 120.0
    hb1.path.write_text(json.dumps(d))
    assert hb0.stale_processes(timeout=60.0, expected=2) == [1]
    # progress payload readable by the supervisor
    assert hb0.read_all()[0]["progress"]["block"] == 3


def test_run_elastic_resumes_from_checkpoint(tmp_path):
    """A mid-run crash resumes from the DB checkpoint: completed blocks are
    never recomputed, and the final table equals the no-crash run."""
    import jax.numpy as jnp
    from pydsproutines_tpu.io.xcorrdb import XcorrDB
    from pydsproutines_tpu.models.pipeline import CheckpointedXcorrPipeline
    from pydsproutines_tpu.parallel.multihost import Heartbeat, run_elastic

    rng = np.random.default_rng(11)
    template = (rng.standard_normal(128) + 1j * rng.standard_normal(128)
                ).astype(np.complex64)
    rx = (0.01 * (rng.standard_normal(1152) + 1j * rng.standard_normal(1152))
          ).astype(np.complex64)
    rx[300:428] += template

    db = XcorrDB(str(tmp_path / "x.db"))
    pipe = CheckpointedXcorrPipeline(db, "xc", template, fs=1e6,
                                     block_shifts=256)

    calls = {"n": 0}
    orig_run = pipe.run

    def flaky_run(rx_, progress=False):
        calls["n"] += 1
        if calls["n"] == 1:
            # first attempt completes only block 0 (a truncated capture has
            # exactly one block of shifts), then dies
            orig_run(rx_[: template.shape[-1] + pipe.block_shifts - 1])
            raise RuntimeError("injected failure")
        return orig_run(rx_, progress=progress)

    pipe.run = flaky_run
    hb = Heartbeat(tmp_path / "hb", 0, interval=0.0)
    total = run_elastic(pipe, jnp.asarray(rx), heartbeat=hb, max_restarts=2)
    nblocks = pipe.num_blocks(len(rx))
    assert nblocks > 1
    # the retry recomputed only the blocks the crash left missing
    assert total == nblocks - 1
    assert pipe.completed_blocks() == set(range(nblocks))
    # second elastic run: everything checkpointed, zero blocks recomputed
    pipe.run = orig_run
    assert run_elastic(pipe, jnp.asarray(rx), heartbeat=hb) == 0
    assert hb.read_all()[0]["progress"] == {"done": True}
