"""On-device L-BFGS vs SciPy L-BFGS-B on the *actual transfer loss*.

The north star requires style/content losses within 1% of the TF reference,
whose optimizer is SciPy's Fortran L-BFGS-B (reference methods.py:133-137).
Both optimizers minimize the identical transfer loss; final losses must
agree TWO-SIDED within 1% — no "ours is lower" escape — on a supermajority
of seeds. The only excluded seeds are those where SciPy itself stalls on an
f32 plateau (its factr test compares f32-rounded losses, so it can declare
CONVERGENCE with a fraction of our achieved reduction); on those, ours must
be at least as good.

Full-size evidence (T=16384, real 30-layer geometry, maxiter=100) runs via
the `scipy_parity` harness in a TPU subprocess below (the in-process suite
is pinned to CPU where one evaluation costs ~15 s). Measured on v5e:
rel -0.024% / +0.018% (seeds 0/1); see BENCH_NOTES.md.
"""

import json
import os
import subprocess
import sys

import pytest

from audio_style_transfer_tpu.transfer.scipy_parity import run_parity

N_SEEDS = 5


@pytest.mark.parametrize("line_search", ["mt", "zoom"])
def test_final_loss_two_sided_one_percent_of_scipy(line_search):
    """Both line searches must hold the bound: "mt" is the LBFGSOptions
    default (a port of SciPy's own dcsrch), "zoom" is the faster c2=0.5
    strong-Wolfe search the per-epoch transfer engine runs."""
    records = run_parity(t=2048, maxiter=100, seeds=N_SEEDS, toy=True,
                         line_search=line_search)
    comparable = [r for r in records if not r["scipy_stalled"]]
    report = "\n".join(
        f"seed {r['seed']}: ours {r['ours']:.6f} ({r['ours_evals']} evals) "
        f"scipy {r['scipy']:.6f} ({r['scipy_evals']} evals) "
        f"rel {r['rel']:+.4%} stalled={r['scipy_stalled']}"
        for r in records
    )
    # Supermajority of seeds must be a clean two-sided comparison.
    assert len(comparable) >= N_SEEDS - 1, f"too many SciPy stalls:\n{report}"
    for r in comparable:
        assert r["reduction_ours"] > 0.5, report
        assert abs(r["rel"]) < 0.01, f"two-sided 1% violated:\n{report}"
    for r in records:
        if r["scipy_stalled"]:
            # SciPy quit on an f32 plateau; we must never be *worse*.
            assert r["ours"] <= r["scipy"] * 1.01, report


@pytest.mark.slow
def test_full_size_parity_on_accelerator():
    """Full geometry, T=16384, maxiter=100, two-sided 1% — VERDICT r1 item 8.

    Runs the scipy_parity harness in a fresh subprocess WITHOUT the CPU pin
    so it uses the real TPU (one evaluation is ~5 ms there vs ~15 s on CPU).
    Skipped when no accelerator is reachable — the recorded numbers in
    BENCH_NOTES.md and the toy two-sided test above stand in.
    """
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/ast_tpu_xla_cache"
    probe = subprocess.run(
        [sys.executable, "-m", "audio_style_transfer_tpu.transfer.scipy_parity",
         "--device_check"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    platform = ""
    if probe.returncode == 0 and probe.stdout.strip():
        platform = json.loads(probe.stdout.strip().splitlines()[-1])["platform"]
    if platform in ("", "cpu"):
        pytest.skip(f"no accelerator for full-size parity (platform={platform!r})")

    proc = subprocess.run(
        [sys.executable, "-m", "audio_style_transfer_tpu.transfer.scipy_parity",
         "--t", "16384", "--maxiter", "100", "--seeds", "2", "--tol", "0.01"],
        capture_output=True, text=True, env=env, timeout=1800,
    )
    assert proc.returncode == 0, (
        f"full-size parity failed:\nstdout:{proc.stdout}\nstderr:{proc.stderr[-2000:]}"
    )
    records = [json.loads(l) for l in proc.stdout.strip().splitlines()
               if l.startswith("{")]
    assert len(records) == 2
    for r in records:
        # unconditional two-sided 1% at full size (measured: ~0.02%)
        assert abs(r["rel"]) < 0.01, records
