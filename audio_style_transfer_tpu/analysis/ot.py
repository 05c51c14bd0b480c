"""Optimal transport between NMF palettes via ADMM.

Re-implements the reference's OT module (reference optimal_transport.py:
22-162: cost matrix, the three projections, the rho=1e2 ADMM loop, palette
transform) as jit-compiled JAX.  The fixed-point iteration runs as one
``lax.while_loop`` on device; convergence thresholds and iteration caps
match the reference defaults (eps=1e-4, miter=1e5).

Palette convention follows the reference's demo (optimal_transport.py:
165-189): palettes are [n_components, n_features], rows are transported.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def build_moving_cost_matrix(palette1, palette2):
    """Pairwise Euclidean cost (reference optimal_transport.py:22-37)."""
    p1 = jnp.asarray(palette1, jnp.float32)
    p2 = jnp.asarray(palette2, jnp.float32)
    sq = jnp.sum((p1[:, None, :] - p2[None, :, :]) ** 2, axis=-1)
    return jnp.sqrt(sq)


def projection_sum_equal(x0, target_value):
    """min ||X - X0|| s.t. sum(X) = target (reference :40-47)."""
    corr = (target_value - jnp.sum(x0)) / x0.size
    return x0 + corr


def projection_column_sum_in_range(x0, lo, hi):
    """min ||X - X0|| s.t. lo_i <= sum(X, 1)_i <= hi_i (reference :50-74)."""
    ref = jnp.sum(x0, axis=1)
    below = ref < lo
    above = ref > hi
    corr = jnp.where(below, (lo - ref), 0.0) + jnp.where(above, (hi - ref), 0.0)
    return x0 + (corr / x0.shape[1])[:, None]


@functools.partial(jax.jit, static_argnames=("eps", "miter"))
def ot_admm(palette2mod, palette_ref, eps: float = 1e-4, miter: int = 100000):
    """ADMM optimal transport (reference optimal_transport.py:77-137).

    Returns the transport plan [n1, n2].
    """
    c = build_moving_cost_matrix(palette2mod, palette_ref)
    c = c / jnp.max(c)
    n1, n2 = c.shape

    # row/col sum bounds: each mass in [0, 1]/size (reference :86-89)
    lo1 = jnp.zeros((n1,))
    hi1 = jnp.full((n1,), 1.0 / n1)
    lo2 = jnp.zeros((n2,))
    hi2 = jnp.full((n2,), 1.0 / n2)

    rho = 1e2

    state = dict(
        sol=jnp.zeros_like(c),
        old=jnp.zeros_like(c),
        aux=jnp.zeros((3,) + c.shape),
        lam=jnp.zeros((3,) + c.shape),
        it=jnp.array(0, jnp.int32),
        done=jnp.array(False),
    )

    def cond(st):
        return (~st["done"]) & (st["it"] <= miter)

    def body(st):
        aux, lam = st["aux"], st["lam"]
        sol = (-c + rho * jnp.sum(aux, 0) + jnp.sum(lam, 0)) / (3.0 * rho)
        sol = jnp.maximum(sol, 0.0)

        aux = sol[None] - lam / rho
        a0 = projection_column_sum_in_range(aux[0], lo1, hi1)
        a1 = projection_column_sum_in_range(aux[1].T, lo2, hi2).T
        a2 = projection_sum_equal(aux[2], 1.0)
        aux = jnp.stack([a0, a1, a2])

        lam = lam + rho * (aux - sol[None])

        norm_sol = jnp.linalg.norm(sol)
        tol = eps * norm_sol
        converged = (
            (jnp.linalg.norm(sol - st["old"]) < tol)
            & (jnp.linalg.norm(sol - aux[0]) < tol)
            & (jnp.linalg.norm(sol - aux[1]) < tol)
            & (jnp.linalg.norm(sol - aux[2]) < tol)
        )
        return dict(
            sol=sol, old=sol, aux=aux, lam=lam,
            it=st["it"] + 1, done=converged,
        )

    st = jax.lax.while_loop(cond, body, state)
    return st["sol"]


# Alias matching the reference's public name.
OT_ADMM = ot_admm


def transform_palette(palette_orig, palette_target, transport):
    """Barycentric projection (reference optimal_transport.py:140-148)."""
    transport = jnp.asarray(transport, jnp.float32)
    sum_gamma = jnp.sum(transport, axis=1)
    palette_new = transport @ jnp.asarray(palette_target, jnp.float32)
    return palette_new / (sum_gamma + 1e-10)[:, None]


def compute_permutation(w1, w2):
    """Transform W2 to match W1 via OT (reference optimal_transport.py:151-162).

    Returns an array with W1's row count and W2's feature space.
    """
    plan = ot_admm(jnp.asarray(w1, jnp.float32), jnp.asarray(w2, jnp.float32))
    return np.asarray(transform_palette(w1, w2, plan))
