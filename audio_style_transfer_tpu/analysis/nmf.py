"""Non-negative matrix factorization with multiplicative updates, in JAX.

Replaces the sklearn Cython NMF the reference calls inside its feature
transform (reference utils.py:132-145: ``non_negative_factorization(
enc, H=ws.T, update_H=False, solver='mu', max_iter=400)``).  Only the
Frobenius / fixed-H variant the reference uses is needed, but a full
alternating-update path is provided for completeness.  The update loop is a
``lax.fori_loop`` of matmuls — MXU work, no host iteration.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_EPS = jnp.finfo(jnp.float32).eps


def _mu_update_w(x, w, h):
    """One Frobenius multiplicative update of W in X ~ W @ H."""
    numer = x @ h.T
    denom = w @ (h @ h.T)
    return w * numer / jnp.maximum(denom, _EPS)


def _mu_update_h(x, w, h):
    numer = w.T @ x
    denom = (w.T @ w) @ h
    return h * numer / jnp.maximum(denom, _EPS)


@functools.partial(jax.jit, static_argnames=("max_iter",))
def nmf_transform(x, h, max_iter: int = 400):
    """Solve min_W ||X - W H||_F with W >= 0 and H fixed (solver='mu').

    Mirrors sklearn's transform-only call used at reference utils.py:134-135.
    jit-wrapped: an eager ``fori_loop`` recompiles per process (it misses
    the persistent compilation cache) and pays per-op dispatch on remote
    runtimes.

    Args:
      x: [n_samples, n_features] non-negative data.
      h: [n_components, n_features] fixed dictionary.
    Returns:
      w: [n_samples, n_components].
    """
    x = jnp.asarray(x, jnp.float32)
    h = jnp.asarray(h, jnp.float32)
    # sklearn initializes W for custom-H transform with sqrt(mean/ncomp)
    avg = jnp.sqrt(jnp.mean(x) / h.shape[0])
    w0 = jnp.full((x.shape[0], h.shape[0]), avg, jnp.float32)

    def body(_, w):
        return _mu_update_w(x, w, h)

    return jax.lax.fori_loop(0, max_iter, body, w0)


@functools.partial(jax.jit, static_argnames=("n_components", "max_iter", "seed"))
def nmf(x, n_components: int, max_iter: int = 200, seed: int = 0):
    """Full alternating multiplicative-update NMF: X ~ W @ H.

    Returns (w [n, k], h [k, f]).
    """
    x = jnp.asarray(x, jnp.float32)
    n, f = x.shape
    key_w, key_h = jax.random.split(jax.random.PRNGKey(seed))
    avg = jnp.sqrt(jnp.mean(x) / n_components)
    w0 = avg * jnp.abs(jax.random.normal(key_w, (n, n_components)))
    h0 = avg * jnp.abs(jax.random.normal(key_h, (n_components, f)))

    def body(_, carry):
        w, h = carry
        w = _mu_update_w(x, w, h)
        h = _mu_update_h(x, w, h)
        return w, h

    return jax.lax.fori_loop(0, max_iter, body, (w0, h0))


def transform(enc, ws, wt, n_components: int, figdir: str | None = None):
    """The reference's NMF + optimal-transport feature transform
    (reference utils.py:132-145): project ``enc`` onto the source palette
    ``ws``, permute the palette toward ``wt`` with OT, and reconstruct.

    Args:
      enc: [1, T, C] encoder features (non-negative after the NMF framing).
      ws/wt: [k, C] source / target NMF palettes.
    Returns:
      [1, T, C] transformed features.
    """
    from audio_style_transfer_tpu.analysis.ot import compute_permutation

    enc2d = np.asarray(enc)[0]
    h_t = np.asarray(nmf_transform(enc2d, np.asarray(ws)))  # [T, k]
    wt_matched = compute_permutation(np.asarray(ws), np.asarray(wt))

    if figdir is not None:
        from audio_style_transfer_tpu.analysis.viz import compare_2_matrix

        compare_2_matrix(np.asarray(ws), wt_matched, figdir)

    u = h_t @ np.asarray(ws)
    err = np.linalg.norm(enc2d - u) / np.linalg.norm(enc2d)
    diff = np.linalg.norm(np.asarray(ws) - wt_matched) / np.linalg.norm(np.asarray(ws))
    print(f" Error for ws * h_ = enc: {err}")
    print(f" difference between two matrices {diff}")

    return (h_t @ np.asarray(ws))[None, ...]
