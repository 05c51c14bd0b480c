import json
import time

from audio_style_transfer_tpu.utils.profiling import MetricsLogger, PhaseTimer


def test_phase_timer_nesting():
    t = PhaseTimer()
    with t.phase("outer"):
        with t.phase("inner"):
            time.sleep(0.01)
    assert "outer" in t.totals
    assert "outer/inner" in t.totals
    assert t.totals["outer"] >= t.totals["outer/inner"]
    assert "outer/inner" in t.report()


def test_metrics_logger(tmp_path):
    with MetricsLogger(str(tmp_path)) as m:
        m.log(0, loss=1.5, style_loss=0.2)
        m.log(1, loss=1.2)
    lines = [json.loads(l) for l in open(m.path)]
    assert lines[0] == {"step": 0, "loss": 1.5, "style_loss": 0.2}
    assert lines[1]["step"] == 1


def test_summarize_xplane_on_cpu_trace(tmp_path):
    """device_trace + summarize_xplane round trip on the CPU backend."""
    import jax
    import jax.numpy as jnp

    from audio_style_transfer_tpu.utils.profiling import (
        device_trace,
        summarize_xplane,
    )

    f = jax.jit(lambda x: jnp.tanh(x @ x.T).sum())
    x = jnp.ones((256, 256), jnp.float32)
    f(x).block_until_ready()
    with device_trace(str(tmp_path)):
        f(x).block_until_ready()
    summary = summarize_xplane(str(tmp_path))
    # CPU traces expose a host/device plane set that varies by jax version;
    # the parser must at minimum run cleanly and, when a device plane with
    # XLA ops exists, report positive leaf time.
    assert isinstance(summary, dict)
    for plane in summary.values():
        assert plane["total_leaf_ms"] >= 0
        assert isinstance(plane["by_kind_ms"], dict)
