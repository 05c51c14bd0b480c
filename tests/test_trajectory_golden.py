"""North-star trajectory pinned against stored goldens (VERDICT r4 #3a).

Round 4 defended a kernel change ("merged forward contraction") on the
grounds that it preserves the f32 accumulation order and therefore the
L-BFGS trajectory bit-identically.  Nothing asserted that: the next
accumulation-order change would shift the trajectory silently.  This test
pins it — the exact north-star program (full 30-layer width-128 geometry,
T=16384, stack-0 channel grams, the same synthetic clips and target
construction bench.py uses) runs 3 epochs on CPU f32 and the per-epoch
losses must match the stored goldens.

Scope: the CPU f32 XLA path pins the shared engine/loss/L-BFGS code; the
chained Pallas kernels are pinned transitively through their equality
tests against this path (tests/test_pallas_chain.py — epsilon on the CPU
conv oracle, bit-exact on TPU).  The TPU bf16 trajectory additionally
carries documented precision drift (+0.3% of f32, BENCH_NOTES) and is
re-recorded per round in BENCH_r*.json, not pinned here.

If this test fails after an INTENTIONAL numerics change: re-derive the
goldens (the command is in the docstring below), record the change and the
new final loss in BENCH_NOTES, and confirm the composed-parity suite still
holds before updating the constants.
"""

import numpy as np
import pytest

# Goldens captured 2026-08-19 (round 5) on CPU f32, jax as pinned in this
# image, under the conftest environment (the 8-virtual-device XLA flag
# changes Eigen reduction partitioning, so goldens are env-specific).
# Regenerate from the repo root with:
#   XLA_FLAGS=--xla_force_host_platform_device_count=8 \
#     python -c "import tests.test_trajectory_golden as t; t.main()"
GOLDEN_LOSSES = (1702.880126953125, 1645.2437744140625, 1007.1897583007812)
GOLDEN_EVALS = (26, 17, 26)
EPOCHS, MAXITER = 3, 10


def _run():
    import jax
    import jax.numpy as jnp

    from audio_style_transfer_tpu.models import WaveNetAEConfig, init_params
    from audio_style_transfer_tpu.transfer import StyleTransfer, TransferSpec
    from audio_style_transfer_tpu.transfer.grams import l2_normalize
    from bench import synth_audio

    params = init_params(jax.random.PRNGKey(0), WaveNetAEConfig())
    spec = TransferSpec(
        stack=0, batch_size=16384, epochs=EPOCHS, maxiter=MAXITER,
        early_stop_evals=0, compute_dtype="float32",
        fused_encoder=False, write_artifacts=False,
    )
    engine = StyleTransfer(spec, params)
    content = synth_audio(2.0, kind="content")
    style = synth_audio(2.0, kind="style")
    phi_c = engine.get_embeds(content[:16384])
    phi_t = engine.get_style_phi(style)
    phi_s = engine.get_style_phi(content)
    phi = engine.get_embeds(content[:16384], is_content=False)
    phi = np.asarray(
        l2_normalize(jnp.asarray(phi + phi_t - phi_s), axes=(1, 2))
    )
    return engine.optimize(phi_c, phi, epochs=EPOCHS)


@pytest.mark.slow
def test_north_star_trajectory_matches_goldens():
    res = _run()
    losses = np.asarray(res["metrics"][:, 0], np.float64)
    # 5e-4 relative: far below any real accumulation-order change (the
    # bf16 switch moved the final loss 0.3%; a same-order rewrite must
    # land inside f32 scheduling noise on this pinned platform).
    np.testing.assert_allclose(losses, GOLDEN_LOSSES, rtol=5e-4)
    # Eval counts are integers: any line-search behaviour change shows
    # here first.
    assert tuple(int(e) for e in res["evals"]) == GOLDEN_EVALS, res["evals"]


def main():  # golden regeneration helper
    res = _run()
    print("GOLDEN_LOSSES =", tuple(float(v) for v in res["metrics"][:, 0]))
    print("GOLDEN_EVALS =", tuple(int(v) for v in res["evals"]))


if __name__ == "__main__":
    main()
