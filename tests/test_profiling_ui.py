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
