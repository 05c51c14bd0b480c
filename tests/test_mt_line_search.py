"""Moré-Thuente line search vs SciPy's DCSRCH (the dcsrch.f port SciPy
itself uses) on scalar objectives.

The reference's optimizer is SciPy L-BFGS-B (reference methods.py:133-137),
whose inner line search is MINPACK dcsrch. `transfer/lbfgs._mt_line_search`
is our `lax.while_loop` port of the same routine; here each trial-step
sequence is compared against `scipy.optimize._dcsrch.DCSRCH` eval-for-eval
on 1-D objectives (the L-BFGS-B line-search constants: ftol=1e-3, gtol=0.9,
xtol=0.1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize._dcsrch import DCSRCH

from audio_style_transfer_tpu.transfer.lbfgs import (
    LBFGSOptions,
    _mt_line_search,
)

OPTS = LBFGSOptions(maxls=30)
C1, C2 = OPTS.resolved_c1c2()


def _run_ours(phi, dphi, a0):
    """Run our MT search on a scalar objective, recording each trial step."""
    trials = []

    def vg1d(a):
        a = float(a)
        trials.append(a)
        f, d = phi(a), dphi(a)
        return (
            jnp.asarray(f, jnp.float64),
            jnp.asarray(d, jnp.float64),
            jnp.asarray([d], jnp.float64),
        )

    # x64 so the comparison against SciPy's double-precision dcsrch is
    # exact; disable_jit so the recording callback above runs per trial.
    with jax.enable_x64(True), jax.disable_jit():
        f0 = jnp.asarray(phi(0.0), jnp.float64)
        g0 = jnp.asarray([dphi(0.0)], jnp.float64)
        d0 = jnp.asarray(dphi(0.0), jnp.float64)
        a, f, g, n_evals, ok = _mt_line_search(vg1d, f0, g0, d0, a0, OPTS)
        return float(a), float(f), int(n_evals), bool(ok), trials


def _run_scipy(phi, dphi, a0):
    trials = []

    def phi_rec(a):
        trials.append(float(a))
        return phi(a)

    d = DCSRCH(phi_rec, dphi, C1, C2, OPTS.xtol, 1e-20, 1e20)
    stp, f, _, task = d(a0, phi0=phi(0.0), derphi0=dphi(0.0), maxiter=30)
    ok = stp is not None and b"CONV" in task
    return (0.0 if stp is None else float(stp)), f, trials, ok


CASES = [
    # (phi, dphi, a0, name)
    (lambda a: (a - 2.0) ** 2, lambda a: 2.0 * (a - 2.0), 1.0, "quadratic"),
    (lambda a: (a - 2.0) ** 2, lambda a: 2.0 * (a - 2.0), 37.0, "quad-overshoot"),
    (lambda a: -a * np.exp(-a), lambda a: (a - 1.0) * np.exp(-a), 0.1, "exp-valley"),
    (lambda a: np.cos(0.5 + a), lambda a: -np.sin(0.5 + a), 0.5, "cosine"),
    (
        lambda a: (a**2 - 1.5 * a) / (a**2 + 1.0),
        lambda a: ((2 * a - 1.5) * (a**2 + 1) - (a**2 - 1.5 * a) * 2 * a)
        / (a**2 + 1) ** 2,
        0.05,
        "rational-plateau",
    ),
    # Moré-Thuente 1994 test function 1 (beta=2): long shallow tail past
    # the minimum — exercises the extrapolation stage at several scales.
    (
        lambda a, b=2.0: -a / (a**2 + b),
        lambda a, b=2.0: (a**2 - b) / (a**2 + b) ** 2,
        0.001,
        "mt1-tiny-start",
    ),
    (
        lambda a, b=2.0: -a / (a**2 + b),
        lambda a, b=2.0: (a**2 - b) / (a**2 + b) ** 2,
        1000.0,
        "mt1-huge-start",
    ),
]


@pytest.mark.parametrize("phi,dphi,a0,name", CASES, ids=[c[3] for c in CASES])
def test_trial_sequence_matches_scipy_dcsrch(phi, dphi, a0, name):
    a_ours, f_ours, n_ours, ok_ours, trials_ours = _run_ours(phi, dphi, a0)
    a_sp, f_sp, trials_sp, ok_sp = _run_scipy(phi, dphi, a0)

    assert ok_ours == ok_sp, (name, trials_ours, trials_sp)
    # identical evaluation count and identical trial steps (tiny float
    # slack: ours evaluates theta/gamma in a different association order)
    assert len(trials_ours) == len(trials_sp), (trials_ours, trials_sp)
    np.testing.assert_allclose(trials_ours, trials_sp, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(a_ours, a_sp, rtol=1e-10, atol=1e-12)


def test_wolfe_conditions_hold_on_accept():
    for phi, dphi, a0, name in CASES:
        a, f, n, ok, _ = _run_ours(phi, dphi, a0)
        if not ok:
            continue
        f0, d0 = phi(0.0), dphi(0.0)
        assert f <= f0 + C1 * a * d0 + 1e-12, name
        assert abs(dphi(a)) <= C2 * abs(d0) + 1e-12, name


def test_restart_recovers_from_line_search_failure():
    """A failed line search with history present must trigger an L-BFGS-B
    style memory restart, not termination (mainlb.f semantics); see the
    seed-0 plateau of tests/test_lbfgs_scipy_parity.py."""
    from audio_style_transfer_tpu.transfer.lbfgs import lbfgs_minimize

    # Rosenbrock in f32: curved valley produces occasional failed searches
    # at loose (mt) constants without preventing eventual convergence.
    def loss(x):
        return jnp.sum(
            100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1.0 - x[:-1]) ** 2
        )

    vg = jax.jit(jax.value_and_grad(loss))
    x0 = jnp.asarray(np.r_[-1.2, 1.0, -1.2, 1.0, 0.5, 0.5], jnp.float32)
    res = lbfgs_minimize(vg, x0, LBFGSOptions(maxiter=400))
    assert float(res.f) < 1e-6, (float(res.f), int(res.status))


# Review regression: extrapolate-then-bracket transition. dcstep must not
# clamp the first in-bracket interpolation to the (stale) trust interval —
# a global clamp parks the search at stx while SciPy interpolates onward.
CASES_KINK = [
    (
        lambda a: -a + 0.5 * max(0.0, a - 1.0) ** 4,
        lambda a: -1.0 + 2.0 * max(0.0, a - 1.0) ** 3,
        0.01,
        "kink",
    ),
]


@pytest.mark.parametrize("phi,dphi,a0,name", CASES_KINK,
                         ids=[c[3] for c in CASES_KINK])
def test_kink_bracket_transition_matches_scipy(phi, dphi, a0, name):
    a_ours, f_ours, n_ours, ok_ours, trials_ours = _run_ours(phi, dphi, a0)
    a_sp, f_sp, trials_sp, ok_sp = _run_scipy(phi, dphi, a0)
    assert ok_ours and ok_sp
    assert len(trials_ours) == len(trials_sp), (trials_ours, trials_sp)
    np.testing.assert_allclose(trials_ours, trials_sp, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(a_ours, a_sp, rtol=1e-10, atol=1e-12)


def test_maxls_exhaustion_returns_evaluated_point():
    """On maxls exhaustion the returned (a, f, g) must come from the SAME
    evaluation — not the next never-evaluated trial paired with stale f/g
    (review finding: the stale triple corrupted the (s, y) curvature
    pair in lbfgs_minimize)."""
    phi = lambda a: -a + 0.5 * max(0.0, a - 1.0) ** 4
    dphi = lambda a: -1.0 + 2.0 * max(0.0, a - 1.0) ** 3
    opts = LBFGSOptions(maxls=3)

    evaluated = []

    def vg1d(a):
        a = float(a)
        evaluated.append(a)
        return (
            jnp.asarray(phi(a), jnp.float64),
            jnp.asarray(dphi(a), jnp.float64),
            jnp.asarray([dphi(a)], jnp.float64),
        )

    with jax.enable_x64(True), jax.disable_jit():
        f0 = jnp.asarray(phi(0.0), jnp.float64)
        g0 = jnp.asarray([dphi(0.0)], jnp.float64)
        from audio_style_transfer_tpu.transfer.lbfgs import _mt_line_search
        a, f, g, n, ok = _mt_line_search(vg1d, f0, g0,
                                         jnp.asarray(dphi(0.0), jnp.float64),
                                         0.01, opts)
        a, f = float(a), float(f)
    if ok:
        assert any(abs(a - e) < 1e-12 for e in [0.0] + evaluated), (a, evaluated)
        assert abs(f - phi(a)) < 1e-9, (a, f, phi(a))
