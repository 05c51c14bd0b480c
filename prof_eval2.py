import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/ast_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
from audio_style_transfer_tpu.models import WaveNetAEConfig, init_params
from audio_style_transfer_tpu.transfer.engine import StyleTransfer, TransferSpec
from audio_style_transfer_tpu.transfer.losses import transfer_loss

params = init_params(jax.random.PRNGKey(0), WaveNetAEConfig())
x = jnp.asarray(np.random.RandomState(0).randn(1, 16384), jnp.float32)

def build(**kw):
    spec = TransferSpec(stack=0, epochs=1, write_artifacts=False, **kw)
    eng = StyleTransfer(spec, params)
    phi_c, phi_s = eng._embeds_fn(eng.params, x)
    vg = jax.jit(jax.value_and_grad(
        lambda x: transfer_loss(eng.params, x, phi_c, phi_s, eng.cfg, eng.loss_spec)[0]))
    return vg

def bench(f, n=300):
    r = f(x); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n): r = f(x)
    jax.block_until_ready(r)
    return (time.perf_counter()-t0)/n*1e3, r

# f32 exactness: chain vs XLA
vg_xla32 = build(compute_dtype="float32", fused_encoder=False)
vg_ch32  = build(compute_dtype="float32", fused_encoder=True)
bench(vg_xla32, n=5)
l_x, g_x = vg_xla32(x); l_c, g_c = vg_ch32(x)
print("f32 loss xla vs chain:", float(l_x), float(l_c),
      "gmaxdiff", float(jnp.max(jnp.abs(g_x - g_c))))

t, _ = bench(build(compute_dtype="bfloat16", fused_encoder=True))
print(f"bf16 chained eval: {t:.3f} ms")
