#!/usr/bin/env python
"""Multi-host capture processing walkthrough.

Run the SAME script on every host of a pod slice (or locally as a
single-process degenerate case — it works unchanged):

    JAX_COORDINATOR_ADDRESS=host0:1234 JAX_NUM_PROCESSES=4 \
    JAX_PROCESS_ID=$RANK python examples/multihost_pipeline.py capture.bin

Per host: seek-read only this host's time range of the capture, assemble the
global sharded array, run the time-sharded FIR + WOLA (ppermute halos cross
hosts over DCN transparently) and the shift-sharded CAF peak (only scalars on
the wire), checkpointing results to XcorrDB so a preempted host resumes at
the first missing block. Heartbeats let a supervisor spot wedged workers.

The 2-process CPU integration test (tests/test_multihost.py) drives exactly
this flow with gloo collectives; see parallel/multihost.py for the pieces.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import tempfile

import numpy as np


def main():
    from pydsproutines_tpu.parallel.multihost import (
        init_distributed, flat_mesh, read_local_capture, shard_local_blocks,
        Heartbeat, run_elastic)

    multi = init_distributed()         # no-op single-host; env-driven on pods
    import jax
    import jax.numpy as jnp
    from pydsproutines_tpu.parallel import sharded_lfilter, sharded_caf_peak
    import scipy.signal as sps

    nproc = jax.process_count()
    pid = jax.process_index()
    mesh = flat_mesh("dsp")
    print(f"[{pid}] processes={nproc} devices={len(jax.devices())} "
          f"(multi={multi})")

    # --- input: per-host seek-based read of one interleaved-int16 capture
    total = 1 << 16
    if len(sys.argv) > 1:
        path = sys.argv[1]
    else:  # synthesize a demo capture (every host writes the same bytes)
        rng = np.random.default_rng(0)
        raw = rng.integers(-2000, 2000, 2 * total, dtype=np.int16)
        tmp = tempfile.NamedTemporaryFile(suffix=".bin", delete=False)
        raw.tofile(tmp.name)
        path = tmp.name
    local = read_local_capture(path, total, nproc, pid)
    gx = shard_local_blocks(local, mesh, "dsp")

    # --- time-sharded FIR over the global array (halos cross hosts)
    taps = sps.firwin(129, 0.25).astype(np.float32)
    y = sharded_lfilter(jnp.asarray(taps), gx, mesh, "dsp")

    # --- shift-sharded CAF peak (replicated scalars back)
    cut = np.asarray(local[: 512]) if pid == 0 else None
    # every host needs the same template: in production it is a known
    # waveform; here host 0's slice start is the planted location
    rng = np.random.default_rng(1)
    template = (rng.standard_normal(512)
                + 1j * rng.standard_normal(512)).astype(np.complex64)
    rx_full = jnp.asarray(
        np.concatenate([np.asarray(template),
                        0.01 * (rng.standard_normal(4096)
                                + 1j * rng.standard_normal(4096))
                        .astype(np.complex64)]))
    shards = 256 * len(jax.devices())
    shifts = shard_local_blocks(
        np.arange(pid * shards // nproc, (pid + 1) * shards // nproc,
                  dtype=np.int32), mesh, "dsp")
    peak, sbest, fbest = sharded_caf_peak(jnp.asarray(template), rx_full,
                                          shifts, mesh, "dsp")
    print(f"[{pid}] CAF peak QF2={float(peak):.3f} at shift {int(sbest)} "
          f"bin {int(fbest)} (expect 0)")

    # --- checkpointed, heartbeat-monitored block job (host-local DB)
    from pydsproutines_tpu.io.xcorrdb import XcorrDB
    from pydsproutines_tpu.models.pipeline import CheckpointedXcorrPipeline
    with tempfile.TemporaryDirectory() as d:
        db = XcorrDB(f"{d}/xc_{pid}.db")
        pipe = CheckpointedXcorrPipeline(db, "xc", np.asarray(template),
                                         fs=1e6, block_shifts=512)
        hb = Heartbeat(f"{d}/hb", pid, interval=0.0)
        nblocks = run_elastic(pipe, rx_full, heartbeat=hb)
        print(f"[{pid}] checkpointed {nblocks} blocks; "
              f"stale={hb.stale_processes(timeout=60.0, expected=nproc)}")


if __name__ == "__main__":
    main()
