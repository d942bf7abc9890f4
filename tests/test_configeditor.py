"""Headless tests for the web config editor: spin the stdlib HTTP server on
an ephemeral port and drive the JSON API end to end (reference interactive
tier: /root/reference/configRoutines/ui/, the PySide6 editor)."""

from __future__ import annotations

import json
import threading
import urllib.request

import pytest

from pydsproutines_tpu.io.config import DSPConfig
from pydsproutines_tpu.viz.configeditor import ConfigWebEditor

INI = """\
[src_usrpA]
srcdir = /captures/a
fs = 1000000.0
fc = 1500000000.0
conjSamples = false
headerBytes = 0

[sig_pager]
baud = 512.0
numBurstBits = 640

[pro_main]
src = usrpA
sig = pager
numTaps = 128

[ws_daily]
pro_main
"""


@pytest.fixture()
def served(tmp_path):
    path = tmp_path / "dsp.ini"
    path.write_text(INI)
    editor = ConfigWebEditor(str(path))
    srv, port = editor.serve_background()
    yield str(path), f"http://127.0.0.1:{port}"
    srv.shutdown()


def _get(base, path):
    with urllib.request.urlopen(base + path) as r:
        return json.load(r)


def _post(base, path, body):
    req = urllib.request.Request(
        base + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        with urllib.request.urlopen(req) as r:
            return json.load(r), r.status
    except urllib.error.HTTPError as e:
        return json.load(e), e.code


def test_page_and_schema(served):
    _, base = served
    with urllib.request.urlopen(base + "/") as r:
        assert r.status == 200
        assert b"DSP Config Editor" in r.read()
    schema = _get(base, "/api/schema")
    assert schema["schemas"]["source"]["fs"] == "float"
    assert schema["schemas"]["processing"]["src"] == "str"


def test_lists_typed_sections(served):
    _, base = served
    conf = _get(base, "/api/config?file=0")
    kinds = {s["name"]: s["kind"] for s in conf["sections"]}
    assert kinds == {"src_usrpA": "source", "sig_pager": "signal",
                     "pro_main": "processing", "ws_daily": "workspace"}
    src = next(s for s in conf["sections"] if s["name"] == "src_usrpA")
    assert src["keys"]["fs"] == "1000000.0"


def test_set_key_persists_and_typechecks(served):
    path, base = served
    obj, code = _post(base, "/api/set", {"file": 0, "section": "src_usrpA",
                                         "key": "fs", "value": "2000000.0"})
    assert code == 200 and obj["ok"]
    # persisted: a fresh DSPConfig sees the new value through the typed api
    assert DSPConfig(path).get_src("usrpA").fs == 2000000.0

    # typed rejection: fs must parse as float; the file must NOT change
    obj, code = _post(base, "/api/set", {"file": 0, "section": "src_usrpA",
                                         "key": "fs", "value": "fast"})
    assert code == 400 and "float" in obj["error"]
    assert DSPConfig(path).get_src("usrpA").fs == 2000000.0

    # unknown keys are allowed free-form
    obj, code = _post(base, "/api/set", {"file": 0, "section": "src_usrpA",
                                         "key": "notes", "value": "roof"})
    assert code == 200
    assert DSPConfig(path).get_src("usrpA").get("notes") == "roof"


def test_add_and_delete_sections(served):
    path, base = served
    obj, code = _post(base, "/api/addsection",
                      {"file": 0, "kind": "signal", "name": "beacon"})
    assert code == 200 and obj["section"] == "sig_beacon"
    obj, code = _post(base, "/api/set", {"file": 0, "section": "sig_beacon",
                                         "key": "baud", "value": "1200"})
    assert code == 200
    cfg = DSPConfig(path)
    assert cfg.get_sig("beacon").baud == 1200.0

    # duplicate rejected
    obj, code = _post(base, "/api/addsection",
                      {"file": 0, "kind": "signal", "name": "beacon"})
    assert code == 409

    # workspace names must stay unprefixed
    obj, code = _post(base, "/api/addsection",
                      {"file": 0, "kind": "workspace", "name": "src_bad"})
    assert code == 400

    obj, code = _post(base, "/api/delsection",
                      {"file": 0, "section": "sig_beacon"})
    assert code == 200
    assert "sig_beacon" not in DSPConfig(path).sections()


def test_delkey_and_errors(served):
    path, base = served
    obj, code = _post(base, "/api/delkey",
                      {"file": 0, "section": "pro_main", "key": "numTaps"})
    assert code == 200
    assert DSPConfig(path).get_process("main").get("numTaps") is None
    obj, code = _post(base, "/api/delkey",
                      {"file": 0, "section": "pro_main", "key": "numTaps"})
    assert code == 404
    obj, code = _post(base, "/api/delsection",
                      {"file": 0, "section": "nope"})
    assert code == 404
    # malformed section name on create
    obj, code = _post(base, "/api/addsection",
                      {"file": 0, "kind": "source", "name": "a b; rm"})
    assert code == 400


def test_atomic_save_leaves_no_temp_files(served, tmp_path):
    path, base = served
    for i in range(5):
        _post(base, "/api/set", {"file": 0, "section": "sig_pager",
                                 "key": "baud", "value": str(100 + i)})
    leftovers = [p for p in tmp_path.iterdir()
                 if p.name.startswith(".cfg_")]
    assert leftovers == []
    assert DSPConfig(path).get_sig("pager").baud == 104.0


def test_concurrent_sets_all_land(served):
    """The editor lock must serialize read-modify-write cycles: N parallel
    setters on distinct keys may not drop each other's writes."""
    path, base = served
    n = 8
    errs = []

    def worker(i):
        obj, code = _post(base, "/api/set",
                          {"file": 0, "section": "src_usrpA",
                           "key": f"tag{i}", "value": str(i)})
        if code != 200:
            errs.append(obj)

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(n)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs
    cfg = DSPConfig(path)
    for i in range(n):
        assert cfg.get_src("usrpA").get(f"tag{i}") == str(i)


def test_hostile_names_rejected_on_load(served, tmp_path):
    """ADVICE round-4: section/key names from an existing INI must be
    validated on load — markup fragments never reach the page payload."""
    path, base = served
    with open(path, "a") as f:
        f.write("\n[src_evil<script>alert(1)</script>]\nok = 1\n"
                "\n[src_good]\nbad<img> = 2\nfine = 3\n")
    cfg = _get(base, "/api/config?file=0")
    names = [s["name"] for s in cfg["sections"]]
    assert all("<" not in n for n in names)
    good = next(s for s in cfg["sections"] if s["name"] == "src_good")
    assert "fine" in good["keys"] and not any("<" in k for k in good["keys"])
    assert any("script" in r for r in cfg["rejected_names"])


def test_cross_origin_post_rejected(served):
    """ADVICE round-4: a cross-origin page must not be able to rewrite
    configs via a forged POST; non-JSON content types are refused too."""
    _, base = served
    body = {"file": 0, "section": "src_usrpA", "key": "fs", "value": "1"}
    req = urllib.request.Request(
        base + "/api/set", data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json",
                 "Origin": "http://evil.example"}, method="POST")
    try:
        with urllib.request.urlopen(req) as r:
            code = r.status
    except urllib.error.HTTPError as e:
        code = e.code
    assert code == 403

    req = urllib.request.Request(
        base + "/api/set", data=json.dumps(body).encode(),
        headers={"Content-Type": "text/plain"}, method="POST")
    try:
        with urllib.request.urlopen(req) as r:
            code = r.status
    except urllib.error.HTTPError as e:
        code = e.code
    assert code == 415

    # same-origin JSON posts still work
    obj, code = _post(base, "/api/set", body)
    assert code == 200 and obj.get("ok")
