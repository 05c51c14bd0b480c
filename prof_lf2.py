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
def _window_targets(params, wins_q, pt, ps):
    def one(xq):
        c, s = transfer_embeds(params, xq[None], eng.cfg, eng.loss_spec)
        return c, l2_normalize(s + pt - ps, axes=(1, 2))
    return jax.lax.map(one, wins_q)
phi_cs, phis = jax.jit(_window_targets)(
    eng.params, jnp.asarray(mu_law_numpy(windows), jnp.float32),
    jnp.asarray(phi_t), jnp.asarray(phi_s))
jax.block_until_ready((phi_cs, phis))

for k in (1, 8):
    t0 = time.time()
    r = eng.optimize_batch(np.asarray(phi_cs[:k]), np.asarray(phis[:k]), epochs=20)
    dt = time.time() - t0
    ev = int(np.sum(r["evals"]))
    print(f"K={k}: {dt:.1f}s, {ev} evals, {ev/dt:.0f} evals/s")
t0 = time.time()
r = eng.optimize_batch(phi_cs, phis, epochs=20)
dt = time.time() - t0
ev = int(np.sum(r["evals"]))
print(f"K=58: {dt:.1f}s, {ev} evals, {ev/dt:.0f} evals/s, "
      f"evals/window min/med/max {np.min(np.sum(r['evals'],1))}/{int(np.median(np.sum(r['evals'],1)))}/{np.max(np.sum(r['evals'],1))}")

from audio_style_transfer_tpu.utils.profiling import device_trace, summarize_xplane
with device_trace("/tmp/xtlf"):
    r = eng.optimize_batch(np.asarray(phi_cs[:58]), np.asarray(phis[:58]), epochs=20)
ev = int(np.sum(r["evals"]))
s = summarize_xplane("/tmp/xtlf", top=10)
for dev, info in s.items():
    if "TPU" not in dev: continue
    print(f"device leaf total {info['total_leaf_ms']/1000:.1f}s over {ev} evals = {info['total_leaf_ms']/ev*1000:.0f} us/eval")
    for kk, v in sorted(info["by_kind_ms"].items(), key=lambda kv: -kv[1])[:8]:
        print(f"  {kk:36s} {v/ev*1000:8.1f} us/eval")
