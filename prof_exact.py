import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/ast_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
from jax.sharding import Mesh
from audio_style_transfer_tpu.models import WaveNetAEConfig, init_params
from audio_style_transfer_tpu.transfer.engine import StyleTransfer, TransferSpec
from audio_style_transfer_tpu.transfer.longform import transfer_exact
import bench as B

params = init_params(jax.random.PRNGKey(0), WaveNetAEConfig())
content = B.synth_audio(60.0, kind="content")
style = B.synth_audio(12.0, kind="style")
spec = TransferSpec(stack=0, epochs=20, maxiter=100, lambd=100.0, gamma=0.0,
                    compute_dtype="bfloat16", fused_encoder=True,
                    early_stop_evals=50, write_artifacts=False)
eng = StyleTransfer(spec, params)
mesh = Mesh(np.array(jax.devices()[:1]), ("time",))
t0 = time.time()
res = transfer_exact(eng, content, style, mesh, epochs=20)
dt = time.time() - t0
m = res.per_window
print(f"exact mode: {dt:.1f}s wall ({m['epochs_done']} epochs, "
      f"{int(m['evals'].sum())} evals, final loss {m['metrics'][-1]:.4f}, "
      f"T={res.audio.shape[0]} samples = {res.audio.shape[0]/16000:.1f}s audio)")
# warm second run (compile cached)
t0 = time.time()
res2 = transfer_exact(eng, content, style, mesh, epochs=20)
print(f"exact mode warm: {time.time()-t0:.1f}s wall, "
      f"{int(res2.per_window['evals'].sum())} evals")
