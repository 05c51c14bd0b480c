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
k = phi_cs.shape[0]
x0 = jnp.full((1, 16384), 1e-6, jnp.float32)

# host async-dispatch loop of the single-clip program
r0 = eng._epochs_fn(eng.params, x0, phi_cs[0], phis[0], epochs=20)
jax.block_until_ready(r0)
t0 = time.time()
outs = [eng._epochs_fn(eng.params, x0, phi_cs[i], phis[i], epochs=20)
        for i in range(k)]
jax.block_until_ready(outs)
dt = time.time() - t0
ev = int(sum(np.sum(np.asarray(o[2])) for o in outs))
print(f"host-loop K={k}: {dt:.1f}s, {ev} evals, {ev/dt:.0f} evals/s")

# lax.map for comparison (warm: compiled earlier in bench processes? compile here once)
eng.optimize_batch(phi_cs, phis, epochs=20)
t0 = time.time()
r = eng.optimize_batch(phi_cs, phis, epochs=20)
dt = time.time() - t0
ev = int(np.sum(r["evals"]))
print(f"lax.map  K={k}: {dt:.1f}s, {ev} evals, {ev/dt:.0f} evals/s")
