import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/ast_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
from audio_style_transfer_tpu.models import WaveNetAEConfig, init_params
from audio_style_transfer_tpu.transfer.engine import StyleTransfer, TransferSpec
import audio_style_transfer_tpu.transfer.longform as LF
import bench as B

params = init_params(jax.random.PRNGKey(0), WaveNetAEConfig())
spec = TransferSpec(stack=0, batch_size=16384, epochs=20, maxiter=100,
                    early_stop_evals=0, compute_dtype="bfloat16",
                    fused_encoder=True, write_artifacts=False)
eng = StyleTransfer(spec, params)
content = B.synth_audio(60.0, kind="content")
style = B.synth_audio(4.0, kind="style")

# wrap phases
orig_ob = eng.optimize_batch
def timed_ob(*a, **kw):
    t0 = time.time(); r = orig_ob(*a, **kw)
    print(f"  optimize_batch: {time.time()-t0:.1f}s, {int(np.sum(r['evals']))} evals")
    return r
eng.optimize_batch = timed_ob
orig_ot = LF._ot_transform_gram
def timed_ot(*a, **kw):
    t0 = time.time(); r = orig_ot(*a, **kw)
    print(f"  ot_transform: {time.time()-t0:.1f}s")
    return r
LF._ot_transform_gram = timed_ot
orig_phi = eng.get_style_phi
def timed_phi(*a, **kw):
    t0 = time.time(); r = orig_phi(*a, **kw)
    print(f"  get_style_phi: {time.time()-t0:.1f}s")
    return r
eng.get_style_phi = timed_phi

t0 = time.time()
res = LF.transfer_longform(eng, content, style, epochs=20, ot_components=8)
print(f"total: {time.time()-t0:.1f}s, evals {int(np.sum(res.per_window['evals']))}")
