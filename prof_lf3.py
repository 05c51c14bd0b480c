import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/ast_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
from audio_style_transfer_tpu.models import WaveNetAEConfig, init_params
from audio_style_transfer_tpu.transfer.engine import StyleTransfer, TransferSpec
import audio_style_transfer_tpu.transfer.longform as LF
from audio_style_transfer_tpu.signal.mu_law import mu_law_numpy
from audio_style_transfer_tpu.transfer.losses import transfer_embeds
from audio_style_transfer_tpu.transfer.grams import l2_normalize
import bench as B

params = init_params(jax.random.PRNGKey(0), WaveNetAEConfig())
content = B.synth_audio(60.0, kind="content")
style = B.synth_audio(12.0, kind="style")
spec = TransferSpec(stack=0, epochs=20, maxiter=100, lambd=100.0, gamma=0.0,
                    compute_dtype="bfloat16", fused_encoder=True,
                    early_stop_evals=50, write_artifacts=False)
eng = StyleTransfer(spec, params)
phi_t = eng.get_style_phi(style, max_examples=5)
phi_s = eng.get_style_phi(content, max_examples=5)
windows = LF.chunk_audio(content, 16384)
def _wt(params, wins_q, pt, ps):
    def one(xq):
        c, s = transfer_embeds(params, xq[None], eng.cfg, eng.loss_spec)
        return c, l2_normalize(s + pt - ps, axes=(1, 2))
    return jax.lax.map(one, wins_q)
phi_cs, phis = jax.jit(_wt)(eng.params, jnp.asarray(mu_law_numpy(windows), jnp.float32),
                            jnp.asarray(phi_t), jnp.asarray(phi_s))
jax.block_until_ready((phi_cs, phis))

ident_c = jnp.broadcast_to(phi_cs[0], (8,) + phi_cs.shape[1:])
ident_s = jnp.broadcast_to(phis[0], (8,) + phis.shape[1:])
for label, pc, ps in [("identical x8", ident_c, ident_s),
                      ("diverse x8", phi_cs[:8], phis[:8])]:
    eng.optimize_batch(pc, ps, epochs=20)  # warm
    t0 = time.time()
    r = eng.optimize_batch(pc, ps, epochs=20)
    dt = time.time() - t0
    ev = int(np.sum(r["evals"]))
    print(f"{label}: {dt:.1f}s, {ev} evals, {ev/dt:.0f} evals/s, "
          f"per-window evals {np.sum(r['evals'],1).tolist()}")

eng.optimize_batch(phi_cs, phis, epochs=20)  # warm
t0 = time.time()
r = eng.optimize_batch(phi_cs, phis, epochs=20)
dt = time.time() - t0
ev = int(np.sum(r["evals"]))
print(f"K=58 warm: {dt:.1f}s, {ev} evals, {ev/dt:.0f} evals/s")
