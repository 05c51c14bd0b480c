import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/ast_tpu_xla_cache")
from audio_style_transfer_tpu.analysis.nmf import nmf, nmf_transform
from audio_style_transfer_tpu.analysis.ot import compute_permutation, ot_admm

rng = np.random.RandomState(0)
f = np.abs(rng.randn(16384, 128)).astype(np.float32)
g = np.abs(rng.randn(16384, 128)).astype(np.float32)

t0=time.time(); _, wc = nmf(f, 8); jax.block_until_ready(wc); print(f"nmf cold: {time.time()-t0:.2f}s")
t0=time.time(); _, ws = nmf(g, 8); jax.block_until_ready(ws); print(f"nmf warm: {time.time()-t0:.2f}s")
wc, ws = np.asarray(wc), np.asarray(ws)
t0=time.time(); wm = compute_permutation(wc, ws); print(f"compute_permutation cold: {time.time()-t0:.2f}s")
t0=time.time(); wm = compute_permutation(wc, ws); print(f"compute_permutation warm: {time.time()-t0:.2f}s")
t0=time.time(); h = nmf_transform(f, wc); jax.block_until_ready(h); print(f"nmf_transform cold: {time.time()-t0:.2f}s")
t0=time.time(); h = nmf_transform(f, wc); jax.block_until_ready(h); print(f"nmf_transform warm: {time.time()-t0:.2f}s")
