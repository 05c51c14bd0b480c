import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/ast_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
from audio_style_transfer_tpu.transfer.grams import style_gram

L, T, C = 30, 16384, 128
rng = np.random.RandomState(0)
taps = [jnp.asarray(rng.randn(1, T, C), jnp.bfloat16) for _ in range(L)]
phi = jnp.asarray(rng.randn(C, L, L), jnp.float32)

def loss_pairwise(*tp):
    ex = {i: t for i, t in enumerate(tp)}
    g = style_gram(ex, list(range(L)), fused=False)
    return jnp.mean(jnp.square(g.astype(jnp.float32) - phi))

def loss_fusedgram(*tp):
    ex = {i: t for i, t in enumerate(tp)}
    g = style_gram(ex, list(range(L)), fused=True)
    return jnp.mean(jnp.square(g.astype(jnp.float32) - phi))

def _norm(g):
    sq = jnp.sum(jnp.square(g), axis=(1, 2), keepdims=True)
    return g * jax.lax.rsqrt(jnp.maximum(sq, 1e-12))

def loss_einsum_tlc(*tp):
    s = jnp.stack([t[0] for t in tp], axis=1)  # [T, L, C]
    g = jnp.einsum("tac,tbc->cab", s, s, preferred_element_type=jnp.float32)
    g = _norm(g)
    return jnp.mean(jnp.square(g - phi))

def loss_einsum_clt(*tp):
    s = jnp.transpose(jnp.stack([t[0] for t in tp], axis=0), (2, 0, 1))  # [C, L, T]
    g = jnp.matmul(s, jnp.transpose(s, (0, 2, 1)),
                   preferred_element_type=jnp.float32)
    g = _norm(g)
    return jnp.mean(jnp.square(g - phi))

def bench(f, n=100):
    vg = jax.jit(jax.value_and_grad(f, argnums=tuple(range(L))))
    r = vg(*taps); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n): r = vg(*taps)
    jax.block_until_ready(r)
    return (time.perf_counter()-t0)/n*1e3

for name, f in [("pairwise-xla", loss_pairwise), ("pallas-kernel", loss_fusedgram),
                ("einsum[T,L,C]", loss_einsum_tlc), ("matmul[C,L,T]", loss_einsum_clt)]:
    try:
        print(f"{name}: {bench(f):.3f} ms fwd+bwd")
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:120]}")
