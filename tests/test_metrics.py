"""Structured observability: MetricsSink JSONL emit/read/summarize, pipeline
per-block timings, elastic restart events, and the cluster_progress
supervisor snapshot (round-2 review gap: beacons existed, nothing read them).
"""

from __future__ import annotations

import json

import numpy as np
import pytest

from pydsproutines_tpu.utils.metrics import (MetricsSink, read_metrics,
                                             summarize, tail_progress)


def test_emit_read_summarize(tmp_path):
    p = tmp_path / "m.jsonl"
    with MetricsSink(p, process_id=3) as sink:
        for i in range(10):
            sink.emit("blk.seconds", 0.1 * (i + 1), unit="s", block=i)
        sink.emit("job.state", "running")
    recs = read_metrics(p)
    assert len(recs) == 11
    assert recs[0]["proc"] == 3 and recs[0]["unit"] == "s"
    assert recs[0]["block"] == 0

    s = summarize(recs)
    blk = s["blk.seconds"]
    assert blk["count"] == 10
    assert blk["min"] == pytest.approx(0.1)
    assert blk["max"] == pytest.approx(1.0)
    assert blk["mean"] == pytest.approx(0.55)
    assert blk["p50"] == pytest.approx(0.55)
    assert blk["p95"] == pytest.approx(0.955)
    assert s["job.state"] == {"count": 1, "last": "running"}


def test_timer_and_failure_tagging(tmp_path):
    p = tmp_path / "m.jsonl"
    sink = MetricsSink(p)
    with sink.timer("step.seconds", stage="warmup"):
        pass
    with pytest.raises(RuntimeError):
        with sink.timer("step.seconds", stage="fail"):
            raise RuntimeError("boom")
    recs = read_metrics(p)
    assert len(recs) == 2
    assert recs[0]["ok"] is True and recs[0]["stage"] == "warmup"
    assert recs[1]["ok"] is False and recs[1]["stage"] == "fail"
    assert all(r["value"] >= 0 for r in recs)


def test_torn_line_and_directory_read(tmp_path):
    a = MetricsSink(tmp_path / "p0.jsonl", 0)
    b = MetricsSink(tmp_path / "p1.jsonl", 1)
    a.emit("x", 1)
    b.emit("x", 2)
    a.close(); b.close()
    # simulate a torn write from a dying process
    with open(tmp_path / "p0.jsonl", "a") as fh:
        fh.write('{"ts": 99, "name": "x", "val')
    recs = read_metrics(tmp_path)
    assert [r["proc"] for r in recs] == [0, 1]
    latest = tail_progress(tmp_path)
    assert latest["x"]["value"] == 2


def test_pipeline_emits_block_metrics(tmp_path):
    import jax.numpy as jnp
    from pydsproutines_tpu.io.xcorrdb import XcorrDB
    from pydsproutines_tpu.models.pipeline import CheckpointedXcorrPipeline

    rng = np.random.default_rng(5)
    template = (rng.standard_normal(64) + 1j * rng.standard_normal(64)
                ).astype(np.complex64)
    rx = (0.01 * (rng.standard_normal(64 + 256) +
                  1j * rng.standard_normal(64 + 256))).astype(np.complex64)
    rx[100:164] += template

    sink = MetricsSink(tmp_path / "m.jsonl")
    db = XcorrDB(str(tmp_path / "x.db"))
    pipe = CheckpointedXcorrPipeline(db, "xc", template, fs=1e6,
                                     block_shifts=128, metrics=sink)
    pipe.run(jnp.asarray(rx))
    recs = read_metrics(tmp_path / "m.jsonl")
    blocks = [r for r in recs if r["name"] == "xcorr.block_seconds"]
    assert len(blocks) == pipe.num_blocks(len(rx)) == 2
    assert {b["block"] for b in blocks} == {0, 1}
    assert all(b["value"] > 0 for b in blocks)
    # the planted template shows up in the per-block quality tag
    assert max(b["peak_qf2"] for b in blocks) > 0.9
    done = [r for r in recs if r["name"] == "xcorr.blocks_completed"]
    assert done and done[-1]["value"] == 2
    # resumed run computes nothing and emits no block records
    n0 = len(recs)
    pipe.run(jnp.asarray(rx))
    assert len(read_metrics(tmp_path / "m.jsonl")) == n0


def test_elastic_restart_event(tmp_path):
    import jax.numpy as jnp
    from pydsproutines_tpu.io.xcorrdb import XcorrDB
    from pydsproutines_tpu.models.pipeline import CheckpointedXcorrPipeline
    from pydsproutines_tpu.parallel.multihost import run_elastic

    rng = np.random.default_rng(6)
    template = (rng.standard_normal(32) + 1j * rng.standard_normal(32)
                ).astype(np.complex64)
    rx = (rng.standard_normal(160) + 1j * rng.standard_normal(160)
          ).astype(np.complex64)
    sink = MetricsSink(tmp_path / "m.jsonl")
    db = XcorrDB(str(tmp_path / "x.db"))
    pipe = CheckpointedXcorrPipeline(db, "xc", template, fs=1e6,
                                     block_shifts=64, metrics=sink)
    orig = pipe.run
    calls = {"n": 0}

    def flaky(rx_, progress=False):
        calls["n"] += 1
        if calls["n"] == 1:
            raise OSError("transient")
        return orig(rx_, progress=progress)

    pipe.run = flaky
    run_elastic(pipe, jnp.asarray(rx), max_restarts=2)
    recs = read_metrics(tmp_path / "m.jsonl")
    restarts = [r for r in recs if r["name"] == "elastic.restart"]
    assert len(restarts) == 1 and restarts[0]["error"] == "OSError"


def test_cluster_progress_snapshot(tmp_path):
    import time
    from pydsproutines_tpu.parallel.multihost import (Heartbeat,
                                                      cluster_progress)
    hb0 = Heartbeat(tmp_path, 0, interval=0.0)
    hb1 = Heartbeat(tmp_path, 1, interval=0.0)
    hb0.beat({"completed_blocks": 7}, force=True)
    hb1.beat({"completed_blocks": 4}, force=True)
    snap = cluster_progress(tmp_path, timeout=60.0, expected=3)
    assert snap["alive"] == [0, 1]
    assert snap["stale"] == [2]            # expected but never beat
    assert snap["processes"][0]["progress"]["completed_blocks"] == 7
    # age out process 1
    d = json.loads(hb1.path.read_text())
    d["time"] = time.time() - 120
    hb1.path.write_text(json.dumps(d))
    snap = cluster_progress(tmp_path, timeout=60.0, expected=2)
    assert snap["stale"] == [1] and snap["alive"] == [0]
