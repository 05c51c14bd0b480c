import time, sys
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/ast_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import audio_style_transfer_tpu.ops.pallas_chain as pc
pc._HBM_ROW = float(sys.argv[1])
pc.plan_groups.cache_clear()
from audio_style_transfer_tpu.models import WaveNetAEConfig, init_params
from audio_style_transfer_tpu.transfer.engine import StyleTransfer, TransferSpec
from audio_style_transfer_tpu.transfer.losses import transfer_loss

params = init_params(jax.random.PRNGKey(0), WaveNetAEConfig())
x = jnp.asarray(np.random.RandomState(0).randn(1, 16384), jnp.float32)
spec = TransferSpec(stack=0, epochs=1, write_artifacts=False,
                    compute_dtype="bfloat16", fused_encoder=True)
eng = StyleTransfer(spec, params)
phi_c, phi_s = eng._embeds_fn(eng.params, x)
vg = jax.jit(jax.value_and_grad(
    lambda x: transfer_loss(eng.params, x, phi_c, phi_s, eng.cfg, eng.loss_spec)[0]))
r = vg(x); jax.block_until_ready(r)
t0 = time.perf_counter()
for _ in range(300): r = vg(x)
jax.block_until_ready(r)
print(f"HBM_ROW={sys.argv[1]}: {(time.perf_counter()-t0)/300*1e3:.3f} ms/eval")
