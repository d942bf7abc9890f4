"""Headless tests for the browser-served XcorrDB viewer: spin the stdlib
HTTP server on an ephemeral port and drive the JSON API end to end
(reference interactive tier: /root/reference/xcorrDatabase/viewer.py)."""

from __future__ import annotations

import json
import urllib.request

import numpy as np
import pytest

from pydsproutines_tpu.io.xcorrdb import XcorrDB
from pydsproutines_tpu.viz.webviewer import XcorrWebViewer


@pytest.fixture()
def served_db(tmp_path):
    db = XcorrDB(str(tmp_path / "x.db"))
    base = dict(time_sec=100, tidx=0, cutoutlen=64,
                td_scan_start=-8.0, td_scan_numsteps=16, td_scan_step=1.0)

    db.create_xcorr_results_table("peaks", 1.5e9, 1_000_000, "sA", "sB", 0)
    db.insert_peak_result("peaks", dict(base), qf2=0.91, td=3.0,
                          td_sigma=0.1, fd=12.0, fd_sigma=0.5)
    db.insert_peak_result("peaks", dict(base, time_sec=101), qf2=0.85,
                          td=4.0, td_sigma=0.1)

    qf2 = np.linspace(0.1, 0.9, 16)
    qf2[11] = 0.99
    fi = np.arange(16, dtype=np.uint32)
    db.create_xcorr_results_table("sweep", 1.5e9, 1_000_000, "sA", "sB", 1,
                                  desc=b"demo")
    db.insert_1d_result("sweep", dict(base), qf2, fi)

    caf = np.outer(np.hanning(16), np.hanning(8))
    db.create_xcorr_results_table("caf2d", 1.5e9, 1_000_000, "sA", "sB", 2)
    db.insert_2d_result("caf2d", dict(
        base, fd_scan_start=-4.0, fd_scan_numsteps=8, fd_scan_step=1.0), caf)
    db.close()

    viewer = XcorrWebViewer(str(tmp_path / "x.db"))
    srv, port = viewer.serve_background()
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


def _get(url):
    import urllib.error
    try:
        with urllib.request.urlopen(url, timeout=10) as r:
            return r.status, r.headers.get("Content-Type", ""), r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.headers.get("Content-Type", ""), e.read()


def _get_json(url):
    status, ctype, body = _get(url)
    assert status == 200, body
    assert ctype.startswith("application/json")
    return json.loads(body)


def test_page_serves(served_db):
    status, ctype, body = _get(served_db + "/")
    assert status == 200 and ctype.startswith("text/html")
    assert b"XcorrDB Viewer" in body


def test_api_dbs_lists_metadata(served_db):
    dbs = _get_json(served_db + "/api/dbs")
    assert len(dbs) == 1
    tables = {t["name"]: t for t in dbs[0]["tables"]}
    assert set(tables) == {"peaks", "sweep", "caf2d"}
    assert tables["peaks"]["xctype"] == 0
    assert tables["sweep"]["xctype"] == 1
    assert tables["sweep"]["desc"] == "demo"
    assert tables["caf2d"]["fc"] == 1.5e9


def test_api_rows_blob_markers(served_db):
    d = _get_json(served_db + "/api/rows?db=0&table=sweep")
    assert d["xctype"] == 1
    assert d["rows"], "expected one row"
    cols = d["cols"]
    row = dict(zip(cols, d["rows"][0]))
    assert row["qf2"] == {"_blob": 16 * 8}         # float64 blob marker
    assert row["freqIdx"] == {"_blob": 16 * 4}     # uint32 blob marker
    assert row["td_scan_numsteps"] == 16
    assert isinstance(row["_rowid"], int)


def test_api_result_type1_decodes_and_peaks(served_db):
    rows = _get_json(served_db + "/api/rows?db=0&table=sweep")
    rid = dict(zip(rows["cols"], rows["rows"][0]))["_rowid"]
    d = _get_json(f"{served_db}/api/result?db=0&table=sweep&rowid={rid}")
    assert d["xctype"] == 1
    assert len(d["td"]) == len(d["qf2"]) == len(d["freq_idx"]) == 16
    # td axis regenerated from scan params: -8 + arange(16)*1
    assert d["td"][0] == -8.0 and d["td"][-1] == 7.0
    assert d["peak"]["qf2"] == pytest.approx(0.99)
    assert d["peak"]["td"] == pytest.approx(-8.0 + 11)
    assert d["peak"]["freq_idx"] == 11


def test_api_result_type2_heatmap(served_db):
    rows = _get_json(served_db + "/api/rows?db=0&table=caf2d")
    rid = dict(zip(rows["cols"], rows["rows"][0]))["_rowid"]
    d = _get_json(f"{served_db}/api/result?db=0&table=caf2d&rowid={rid}")
    assert d["xctype"] == 2
    caf = np.asarray(d["caf"])
    assert caf.shape == (16, 8)
    truth = np.outer(np.hanning(16), np.hanning(8))
    np.testing.assert_allclose(caf, truth, atol=1e-12)
    # hanning(16) peaks equally at rows 7/8; argmax takes the first
    assert d["peak"]["td"] == pytest.approx(-8.0 + 7)
    assert len(d["fd"]) == 8 and d["fd"][0] == -4.0


def test_api_result_type0_row(served_db):
    rows = _get_json(served_db + "/api/rows?db=0&table=peaks")
    assert rows["xctype"] == 0 and len(rows["rows"]) == 2
    rid = dict(zip(rows["cols"], rows["rows"][0]))["_rowid"]
    d = _get_json(f"{served_db}/api/result?db=0&table=peaks&rowid={rid}")
    assert d["row"]["qf2"] == pytest.approx(0.91)
    assert d["row"]["fd"] == pytest.approx(12.0)


def test_api_blob_hex_uint8(served_db):
    rows = _get_json(served_db + "/api/rows?db=0&table=sweep")
    rid = dict(zip(rows["cols"], rows["rows"][0]))["_rowid"]
    d = _get_json(
        f"{served_db}/api/blob?db=0&table=sweep&rowid={rid}&col=freqIdx")
    assert d["nbytes"] == 64 and not d["truncated"]
    u8 = np.asarray(d["uint8"], dtype=np.uint8)
    np.testing.assert_array_equal(
        u8, np.frombuffer(np.arange(16, dtype=np.uint32).tobytes(),
                          dtype=np.uint8))
    # hex view round-trips to the same bytes (reference hex/uint8 toggle)
    assert bytes.fromhex(d["hex"].replace(" ", "")) == u8.tobytes()


def test_api_errors_are_json(served_db):
    status, ctype, body = _get(served_db + "/api/rows?db=0&table=nope")
    assert status == 400 and ctype.startswith("application/json")
    assert "error" in json.loads(body)
    status, _, _ = _get(served_db + "/nothing")
    assert status == 404


def test_sql_injection_guard(served_db):
    # table names are checked against sqlite_master before interpolation
    evil = urllib.request.quote('x"; DROP TABLE peaks; --')
    status, _, body = _get(f"{served_db}/api/rows?db=0&table={evil}")
    assert status == 400
    d = _get_json(served_db + "/api/dbs")
    assert {t["name"] for t in d[0]["tables"]} == {"peaks", "sweep", "caf2d"}
