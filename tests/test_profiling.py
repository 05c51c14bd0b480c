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
