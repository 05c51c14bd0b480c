import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/ast_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
from audio_style_transfer_tpu.models import WaveNetAEConfig, init_params
from audio_style_transfer_tpu.transfer.engine import StyleTransfer, TransferSpec
from audio_style_transfer_tpu.transfer.losses import transfer_loss

params = init_params(jax.random.PRNGKey(0), WaveNetAEConfig())
x = jnp.asarray(np.random.RandomState(0).randn(1, 16384), jnp.float32)

def run(fused_gram):
    spec = TransferSpec(stack=0, epochs=1, write_artifacts=False,
                        compute_dtype="bfloat16", fused_encoder=True,
                        fused_gram=fused_gram)
    eng = StyleTransfer(spec, params)
    phi_c, phi_s = eng._embeds_fn(eng.params, x)
    vg = jax.jit(jax.value_and_grad(
        lambda x: transfer_loss(eng.params, x, phi_c, phi_s, eng.cfg, eng.loss_spec)[0]))
    r = vg(x); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(300): r = vg(x)
    jax.block_until_ready(r)
    print(f"fused_gram={fused_gram}: {(time.perf_counter()-t0)/300*1e3:.3f} ms/eval, loss {float(r[0]):.6f}")

run(False)
run(True)
