import time, json
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/ast_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
from audio_style_transfer_tpu.models import WaveNetAEConfig, init_params
from audio_style_transfer_tpu.transfer.engine import StyleTransfer, TransferSpec
from audio_style_transfer_tpu.transfer.losses import transfer_loss
from audio_style_transfer_tpu.utils.profiling import device_trace, summarize_xplane

params = init_params(jax.random.PRNGKey(0), WaveNetAEConfig())
spec = TransferSpec(stack=None, cont_lyr_ids=(25,), epochs=1,
                    compute_dtype="bfloat16", fused_encoder=True,
                    write_artifacts=False)
eng = StyleTransfer(spec, params)
x = jnp.asarray(np.random.RandomState(0).randn(1, 16384), jnp.float32)
phi_c, phi_s = eng._embeds_fn(eng.params, x)
vg = jax.jit(jax.value_and_grad(
    lambda x: transfer_loss(eng.params, x, phi_c, phi_s, eng.cfg, eng.loss_spec)[0]))
r = vg(x); jax.block_until_ready(r)
t0 = time.perf_counter()
for _ in range(200): r = vg(x)
jax.block_until_ready(r)
print(f"cfg3 eval wall: {(time.perf_counter()-t0)/200*1e3:.3f} ms")
with device_trace("/tmp/xt3"):
    for _ in range(50): r = vg(x)
    jax.block_until_ready(r)
s = summarize_xplane("/tmp/xt3", top=8)
for dev, info in s.items():
    if "TPU" not in dev: continue
    print(f"device leaf: {info['total_leaf_ms']/50:.3f} ms/eval")
    for k, v in sorted(info["by_kind_ms"].items(), key=lambda kv: -kv[1])[:6]:
        print(f"  {k:30s} {v/50*1000:8.1f} us/eval")
    for op in info["top_ops"][:6]:
        print(f"  {op['each_us']:8.1f} us  {op['name'][:70]}")
