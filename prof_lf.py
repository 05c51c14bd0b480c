import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/ast_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
from audio_style_transfer_tpu.models import WaveNetAEConfig, init_params
from audio_style_transfer_tpu.transfer.engine import StyleTransfer, TransferSpec
import audio_style_transfer_tpu.transfer.longform as LF
import bench as B

params = init_params(jax.random.PRNGKey(0), WaveNetAEConfig())
content = B.synth_audio(60.0, kind="content")
style = B.synth_audio(12.0, kind="style")
spec = TransferSpec(stack=0, epochs=20, maxiter=100, lambd=100.0, gamma=0.0,
                    compute_dtype="bfloat16", fused_encoder=True,
                    early_stop_evals=50, write_artifacts=False)
eng = StyleTransfer(spec, params)

# phase instrumentation by monkeypatching
t0 = time.time()
phi_t = eng.get_style_phi(style, max_examples=5)
phi_s = eng.get_style_phi(content, max_examples=5)
print(f"style phi: {time.time()-t0:.1f}s")
t0 = time.time()
phi_t2 = LF._ot_transform_gram(eng, style, content, phi_t, 8)
print(f"OT transform: {time.time()-t0:.1f}s")
from audio_style_transfer_tpu.signal.mu_law import mu_law_numpy
from audio_style_transfer_tpu.transfer.losses import transfer_embeds
from audio_style_transfer_tpu.transfer.grams import l2_normalize
windows = LF.chunk_audio(content, 16384)
t0 = time.time()
def _window_targets(params, wins_q, pt, ps):
    def one(xq):
        c, s = transfer_embeds(params, xq[None], eng.cfg, eng.loss_spec)
        return c, l2_normalize(s + pt - ps, axes=(1, 2))
    return jax.lax.map(one, wins_q)
phi_cs, phis = jax.jit(_window_targets)(
    eng.params, jnp.asarray(mu_law_numpy(windows), jnp.float32),
    jnp.asarray(phi_t2), jnp.asarray(phi_s))
jax.block_until_ready((phi_cs, phis))
print(f"window targets: {time.time()-t0:.1f}s ({windows.shape[0]} windows)")
t0 = time.time()
result = eng.optimize_batch(phi_cs, phis, epochs=20)
print(f"optimize: {time.time()-t0:.1f}s, {int(np.sum(result['evals']))} evals")
