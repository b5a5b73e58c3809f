"""Profiling utilities + web UI route tests."""

import time

import jax.numpy as jnp
import numpy as np

from audiolab_tpu.utils.profiling import EpochRecorder, StageTimer, timed


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("b", sync=jnp.ones(4) * 2):
        pass
    assert t.seconds["a"] >= 0.01
    assert t.counts["a"] == 1 and t.counts["b"] == 1
    assert "a:" in t.report()
    assert set(t.as_dict()) == {"a", "b"}


def test_epoch_recorder():
    r = EpochRecorder()
    msg = r.record()
    assert "elapsed" in msg and "epoch time" in msg


def test_timed_decorator():
    @timed("unit_test_fn")
    def fn(x):
        return jnp.asarray(x) + 1

    out = fn(1)
    assert int(out) == 2
    from audiolab_tpu.utils import profiling

    assert profiling._GLOBAL.counts["unit_test_fn"] == 1


def test_ui_route(tmp_path):
    from audiolab_tpu.serve.api import create_app
    from audiolab_tpu.serve.http import RawResponse

    router = create_app(str(tmp_path / "process"))
    code, resp = router.dispatch("GET", "/", {})
    assert code == 200 and isinstance(resp, RawResponse)
    assert b"AudioLab" in resp.body and b"/api/v1/process/chain" in resp.body


def test_ui_arg_form_and_hints(tmp_path):
    """The SPA embeds the ArgHandler equivalent: schema-driven form
    (renderProcForm), per-field hint toggles, and live localStorage
    mirroring keyed {Processor}{field} (reference handlers/args.py:7-176);
    the schema endpoint supplies the hint text."""
    import json
    import urllib.request

    from audiolab_tpu.serve.api import create_app
    from audiolab_tpu.serve.http import serve_background

    server, port = serve_background(create_app(str(tmp_path)))
    try:
        html = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=30).read().decode()
        for marker in ("renderProcForm", "localStorage", "hintb",
                       "/api/v1/process/processors", "proc-on"):
            assert marker in html, marker
        # cross-tab "send to Process" wiring (reference main.py:187-194):
        # generation results stage themselves into the chain's input list
        for marker in ("sendToProcess", "resultAudio", "p_staged",
                       "STAGED.concat"):
            assert marker in html, marker
        r = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/v1/process/processors",
            timeout=30).read())
        procs = {p["title"]: p for p in r["processors"]}
        assert "Separate" in procs
        # every field ships a description for the hint system
        for p in r["processors"]:
            for name, spec in p.get("properties", {}).items():
                assert spec.get("description"), (p["title"], name)
    finally:
        server.shutdown()
