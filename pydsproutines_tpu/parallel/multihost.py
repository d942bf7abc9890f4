"""Multi-host distribution: process-sharded input, host x chip meshes,
heartbeat failure detection, and elastic restart-from-checkpoint.

The reference has no distributed layer at all (SURVEY.md §2.6/§5: thread
striping and single-GPU batches only) — this module is the greenfield part of
the TPU build. The design follows the standard JAX multi-controller recipe:

  * every host runs the same program; ``init_distributed`` wires them into
    one runtime (``jax.distributed.initialize`` — ICI collectives within a
    slice, DCN across hosts),
  * each host loads only its own time range of the capture
    (``process_shard_bounds`` + ``read_local_capture``: interleaved-int16
    bin files are seekable, so a host reads exactly its slice plus the
    filter-halo overlap from disk — the DCN never carries bulk samples),
  * process-local blocks become one global sharded array via
    ``shard_local_blocks`` (``jax.make_array_from_process_local_data``), on
    which the single-host parallel ops (sharded_wola / sharded_lfilter /
    sharded_caf_peak) work unchanged — a shard_map collective does not care
    whether the mesh axis spans chips or hosts,
  * failure handling is heartbeat files + results-level checkpointing: the
    reference's own recovery model (XcorrDB UNIQUE-keyed rows,
    /root/reference/xcorrDatabase/_core.py:47-69) extended with liveness
    detection so a coordinator can restart a wedged job, resuming at the
    first missing block (models/pipeline.CheckpointedXcorrPipeline).

Everything here is testable without TPU pods: a 2-process CPU cluster with
``--xla_force_host_platform_device_count`` exercises the same code paths
(gloo collectives across processes) — see tests/test_multihost.py.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

import numpy as np


# ---------------------------------------------------------------------------
# Runtime initialization
# ---------------------------------------------------------------------------

_initialized = False


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None,
                     local_device_ids=None) -> bool:
    """Join the multi-host JAX runtime. Idempotent; returns True when running
    multi-process after the call.

    With no arguments, initialization is attempted from the environment (TPU
    pod metadata or JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID)
    and silently skipped when nothing indicates a multi-process launch —
    single-host use never needs to call this.
    """
    global _initialized
    import jax

    if _initialized or jax.process_count() > 1:
        _initialized = True
        return jax.process_count() > 1
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        env = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("JAX_PROCESS_ID")
        process_id = int(env) if env else None
    if coordinator_address is None and num_processes is None:
        # no explicit cluster spec: let jax autodetect (TPU pods), but don't
        # fail single-host runs
        try:
            jax.distributed.initialize()
        except Exception:
            return False
        _initialized = True
        return jax.process_count() > 1
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id,
        local_device_ids=local_device_ids)
    _initialized = True
    return jax.process_count() > 1


def host_chip_mesh(axis_names: tuple[str, str] = ("host", "chip")):
    """(num_hosts, chips_per_host) mesh: the ``host`` axis crosses DCN, the
    ``chip`` axis stays on ICI. Shard bulk time-blocks over ``host`` and
    latency-sensitive axes (shifts, channels) over ``chip``."""
    import jax
    devs = np.asarray(jax.devices())
    nproc = jax.process_count()
    per = len(devs) // nproc
    # jax.devices() orders by process index
    return jax.sharding.Mesh(devs.reshape(nproc, per), axis_names)


def flat_mesh(axis_name: str = "dsp"):
    """One mesh axis over every device of every process — the layout the
    single-host parallel ops (sharded_wola/sharded_lfilter/sharded_caf_peak)
    use, now spanning hosts."""
    import jax
    return jax.sharding.Mesh(np.asarray(jax.devices()), (axis_name,))


# ---------------------------------------------------------------------------
# Process-sharded input pipeline
# ---------------------------------------------------------------------------

def process_shard_bounds(total_samples: int, num_processes: int,
                         process_id: int, halo: int = 0) -> tuple[int, int]:
    """[start, stop) sample range process ``process_id`` must LOAD so that
    contiguous equal blocks of ``total_samples // num_processes`` samples are
    locally available, plus ``halo`` extra samples of left overlap (the
    filter warm-up / overlap-save halo; process 0 has none).

    total_samples must divide evenly (static shapes everywhere)."""
    if total_samples % num_processes != 0:
        raise ValueError(f"total {total_samples} does not divide over "
                         f"{num_processes} processes")
    block = total_samples // num_processes
    start = process_id * block
    return max(0, start - halo), start + block


def read_local_capture(filename, total_samples: int, num_processes: int,
                       process_id: int, halo: int = 0, in_dtype=np.int16,
                       out_dtype=np.complex64) -> np.ndarray:
    """Read only this process's time range (plus halo) of an interleaved-I/Q
    bin capture — seek-based, so N hosts read the file (or its N shards) in
    parallel without moving bulk data over the network.

    Reference analogue: simpleBinRead (/root/reference/usrpRoutines.py:51),
    here with a byte-offset window per host."""
    from pydsproutines_tpu.io.binfiles import simple_bin_read
    start, stop = process_shard_bounds(total_samples, num_processes,
                                       process_id, halo)
    itemsize = np.dtype(in_dtype).itemsize * 2   # interleaved I/Q
    return simple_bin_read(filename, num_samps=stop - start,
                           in_dtype=in_dtype, out_dtype=out_dtype,
                           offset=start * itemsize)


def shard_local_blocks(local_block: np.ndarray, mesh, axis: str = "dsp"):
    """Assemble one global sharded array from each process's local time block
    (``jax.make_array_from_process_local_data``): the global shape multiplies
    the sharded axis by the process count; no bulk data crosses hosts.

    ``local_block`` is this process's contiguous block (no halo — halos are
    exchanged on-fabric by the parallel ops' ppermute)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))
    return jax.make_array_from_process_local_data(sharding, local_block)


# ---------------------------------------------------------------------------
# Failure detection: heartbeat files + liveness checks
# ---------------------------------------------------------------------------

class Heartbeat:
    """Per-process liveness beacon on a shared filesystem.

    Each process periodically writes ``{dir}/hb_{pid}.json`` with a wall-time
    stamp and a progress payload (e.g. last completed block). Any process —
    or an external supervisor — can call ``stale_processes`` to find workers
    whose beacons have gone quiet and trigger a restart; restarted workers
    resume from the results-level checkpoint (CheckpointedXcorrPipeline
    skips completed blocks). SURVEY.md §5 lists this as greenfield work the
    reference never needed (single process)."""

    def __init__(self, directory, process_id: int, interval: float = 5.0):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.process_id = int(process_id)
        self.interval = float(interval)
        self._last = 0.0
        self.path = self.dir / f"hb_{self.process_id}.json"

    def beat(self, progress: dict | None = None, force: bool = False) -> None:
        """Write a beacon if ``interval`` elapsed (cheap to call per block)."""
        now = time.time()
        if not force and now - self._last < self.interval:
            return
        payload = {"process_id": self.process_id, "time": now,
                   "progress": progress or {}}
        tmp = self.path.with_suffix(".tmp")
        tmp.write_text(json.dumps(payload))
        os.replace(tmp, self.path)   # atomic on POSIX
        self._last = now

    def read_all(self) -> dict[int, dict]:
        out = {}
        for p in self.dir.glob("hb_*.json"):
            try:
                d = json.loads(p.read_text())
                out[int(d["process_id"])] = d
            except (ValueError, KeyError, OSError):
                continue   # torn write from a dying process: treat as absent
        return out

    def stale_processes(self, timeout: float, expected: int | None = None
                        ) -> list[int]:
        """Process ids whose beacon is older than ``timeout`` seconds (or
        missing entirely, when ``expected`` gives the full process count)."""
        now = time.time()
        seen = self.read_all()
        stale = [pid for pid, d in seen.items()
                 if now - float(d["time"]) > timeout]
        if expected is not None:
            stale += [pid for pid in range(expected) if pid not in seen]
        return sorted(set(stale))


def cluster_progress(hb_dir, timeout: float = 30.0,
                     expected: int | None = None) -> dict:
    """One queryable snapshot of cluster state from the heartbeat beacons:
    per-process progress payloads + who is stale. This is the supervisor
    surface consuming Heartbeat.beat(progress=...) (round-2 review: the
    beacons existed but nothing read them)."""
    hb = Heartbeat(hb_dir, process_id=-1)
    now = time.time()
    beacons = hb.read_all()
    procs = {
        pid: {"age_s": round(now - float(d["time"]), 3),
              "progress": d.get("progress", {})}
        for pid, d in beacons.items() if pid >= 0}
    stale = [pid for pid, d in procs.items() if d["age_s"] > timeout]
    if expected is not None:
        stale += [pid for pid in range(expected) if pid not in procs]
    return {"processes": procs, "stale": sorted(set(stale)),
            "alive": sorted(pid for pid in procs if pid not in stale)}


def run_elastic(pipeline, rx, heartbeat: Heartbeat | None = None,
                max_restarts: int = 2, progress: bool = False) -> int:
    """Drive a CheckpointedXcorrPipeline to completion with liveness beacons
    and bounded in-process retry.

    Each completed block beats the heartbeat with the block index; a
    transient failure (device error, preempted slice) retries from the DB
    checkpoint — completed blocks are never recomputed. Returns the total
    number of blocks computed across attempts."""
    total = 0
    attempts = 0
    while True:
        try:
            if heartbeat is not None:
                done = pipeline.completed_blocks()
                heartbeat.beat({"completed_blocks": len(done)}, force=True)
            total += pipeline.run(rx, progress=progress)
            if heartbeat is not None:
                heartbeat.beat({"done": True}, force=True)
            return total
        except KeyboardInterrupt:
            raise
        except Exception as e:
            attempts += 1
            metrics = getattr(pipeline, "metrics", None)
            if metrics is not None:
                metrics.emit("elastic.restart", attempts,
                             error=type(e).__name__)
            if attempts > max_restarts:
                raise
