import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/ast_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
from audio_style_transfer_tpu.ops.pallas_gram import pair_gram, pair_gram_reference
from audio_style_transfer_tpu.transfer.grams import style_gram

L, T, C = 10, 16384, 128
rng = np.random.RandomState(0)
taps = [jnp.asarray(rng.randn(1, T, C), jnp.bfloat16) for i in range(L)]
phi = jnp.asarray(rng.randn(C, L, L), jnp.float32)

def make(fused):
    def loss(*taps):
        ex = {i: t for i, t in enumerate(taps)}
        g = style_gram(ex, list(range(L)), fused=fused)
        return jnp.mean(jnp.square(g.astype(jnp.float32) - phi))
    return loss

def bench(f, args, n=300):
    r = f(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n): r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter()-t0)/n*1e3

# correctness first
g_pal = pair_gram(*taps)
g_ref = pair_gram_reference(*taps)
print("fwd maxdiff:", float(jnp.max(jnp.abs(g_pal - g_ref))))
for name, fused in [("xla", False), ("pallas", True)]:
    fn = make(fused)
    fwd = jax.jit(fn)
    vg = jax.jit(jax.value_and_grad(fn, argnums=tuple(range(L))))
    print(f"{name}: fwd {bench(fwd, taps):.3f} ms, fwd+bwd {bench(vg, taps):.3f} ms")
# grad parity
vx = jax.jit(jax.value_and_grad(make(False), argnums=tuple(range(L))))
vp = jax.jit(jax.value_and_grad(make(True), argnums=tuple(range(L))))
lx, gx = vx(*taps); lp, gp = vp(*taps)
md = max(float(jnp.max(jnp.abs(a.astype(jnp.float32)-b.astype(jnp.float32)))) for a,b in zip(gx,gp))
print("loss diff:", abs(float(lx-lp)), "grad maxdiff:", md)
