import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/ast_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
from audio_style_transfer_tpu.models import WaveNetAEConfig, init_params
from audio_style_transfer_tpu.transfer.engine import StyleTransfer, TransferSpec
from audio_style_transfer_tpu.transfer.grams import l2_normalize
import bench as B

params = init_params(jax.random.PRNGKey(0), WaveNetAEConfig())
content = B.synth_audio(2.0, kind="content")
style = B.synth_audio(2.0, kind="style")
spec = TransferSpec(stack=0, epochs=20, maxiter=100, early_stop_evals=0,
                    compute_dtype="bfloat16", fused_encoder=True,
                    write_artifacts=False)
eng = StyleTransfer(spec, params)
phi_c = eng.get_embeds(content[:16384])
phi_t = eng.get_style_phi(style)
phi_s = eng.get_style_phi(content)
phi = eng.get_embeds(content[:16384], is_content=False)
phi = np.asarray(l2_normalize(jnp.asarray(phi + phi_t - phi_s), axes=(1, 2)))

seq_fn = jax.jit(
    lambda params, x0, pc, ps, epochs: jax.lax.map(
        lambda args: eng._run_epochs(params, *args, epochs=epochs), (x0, pc, ps)),
    static_argnums=(4,))

for k in (8, 58):
    pc = jnp.asarray(np.stack([phi_c]*k)); ps = jnp.asarray(np.stack([phi]*k))
    x0 = jnp.full((k, 1, 16384), 1e-6, jnp.float32)
    # async loop
    for rep in range(2):
        t0 = time.time()
        outs = [eng._epochs_fn(eng.params, x0[i], pc[i], ps[i], epochs=20) for i in range(k)]
        jax.block_until_ready(outs)
        dt = time.time()-t0
    ev = int(sum(np.sum(np.asarray(o[2])) for o in outs))
    print(f"K={k} async: {dt:.2f}s {ev} evals {ev/dt:.0f}/s")
    # lax.map
    for rep in range(2):
        t0 = time.time()
        r = seq_fn(eng.params, x0, pc, ps, 20)
        jax.block_until_ready(r)
        dt = time.time()-t0
    ev = int(np.sum(np.asarray(r[2])))
    print(f"K={k} laxmap: {dt:.2f}s {ev} evals {ev/dt:.0f}/s")
