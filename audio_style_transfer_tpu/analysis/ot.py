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


@functools.partial(
    jax.jit, static_argnames=("eps", "miter", "verbose", "return_info")
)
def ot_admm(
    palette2mod,
    palette_ref,
    eps: float = 1e-4,
    miter: int = 100000,
    verbose: bool = False,
    return_info: bool = False,
):
    """ADMM optimal transport (reference optimal_transport.py:77-137).

    Returns the transport plan [n1, n2]; with ``return_info`` also a dict of
    convergence diagnostics (iterations run, final residual norms) — the
    equivalent of the reference's inline convergence printout
    (optimal_transport.py:119-125).  ``verbose`` additionally prints the
    residuals every 100 iterations from inside the device loop.
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
        res=jnp.zeros((4,)),  # [d_change, d_aux0, d_aux1, d_aux2]
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
        res = jnp.stack([
            jnp.linalg.norm(sol - st["old"]),
            jnp.linalg.norm(sol - aux[0]),
            jnp.linalg.norm(sol - aux[1]),
            jnp.linalg.norm(sol - aux[2]),
        ])
        converged = jnp.all(res < tol)
        if verbose:
            jax.lax.cond(
                st["it"] % 100 == 0,
                lambda: jax.debug.print(
                    "OT ADMM it {it}: d_change {a:.3e} d_aux "
                    "{b:.3e}/{c:.3e}/{d:.3e} (tol {t:.3e})",
                    it=st["it"], a=res[0], b=res[1], c=res[2], d=res[3], t=tol,
                ),
                lambda: None,
            )
        return dict(
            sol=sol, old=sol, aux=aux, lam=lam,
            it=st["it"] + 1, done=converged,
            res=res,
        )

    st = jax.lax.while_loop(cond, body, state)
    if return_info:
        info = dict(
            iterations=st["it"],
            converged=st["done"],
            d_change=st["res"][0],
            d_aux=st["res"][1:],
        )
        return st["sol"], info
    return st["sol"]


# Alias matching the reference's public name.
OT_ADMM = ot_admm


def transform_palette(palette_orig, palette_target, transport):
    """Barycentric projection (reference optimal_transport.py:140-148)."""
    transport = jnp.asarray(transport, jnp.float32)
    sum_gamma = jnp.sum(transport, axis=1)
    palette_new = transport @ jnp.asarray(palette_target, jnp.float32)
    return palette_new / (sum_gamma + 1e-10)[:, None]


def compute_permutation(w1, w2, verbose: bool = False):
    """Transform W2 to match W1 via OT (reference optimal_transport.py:151-162).

    Returns an array with W1's row count and W2's feature space.  With
    ``verbose`` the solver's convergence diagnostics are printed (reference
    optimal_transport.py:119-125 equivalent) AFTER the solve — the in-loop
    ``ot_admm(verbose=True)`` streaming uses jax.debug.print, which some
    hosted runtimes (axon) reject; pass it explicitly when on CPU/TPU-vm.
    """
    plan, info = ot_admm(
        jnp.asarray(w1, jnp.float32), jnp.asarray(w2, jnp.float32),
        return_info=True,
    )
    if verbose:
        print(
            f"OT ADMM: {int(info['iterations'])} iterations, "
            f"converged={bool(info['converged'])}, "
            f"d_change={float(info['d_change']):.3e}, "
            f"d_aux={[f'{float(v):.3e}' for v in info['d_aux']]}"
        )
    return np.asarray(transform_palette(w1, w2, plan))


if __name__ == "__main__":
    # Runnable smoke demo matching the reference's __main__ block
    # (reference optimal_transport.py:165-189): OT-match a random 5-atom
    # "bass" palette to a 10-atom "flute" palette over 128 features.
    w_bass = np.random.rand(5, 128)
    w_flute = np.random.rand(10, 128)
    w_bass2flute = compute_permutation(w_bass, w_flute, verbose=True)
    print("bass palette", w_bass.shape, "-> flute-matched", w_bass2flute.shape)
    print(
        "mean |w_bass2flute - w_bass| =",
        float(np.mean(np.abs(w_bass2flute - w_bass))),
    )
