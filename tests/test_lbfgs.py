import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.optimize

from audio_style_transfer_tpu.transfer import LBFGSOptions, lbfgs_minimize


def _run(fun, x0, **kw):
    vg = jax.value_and_grad(fun)
    opts = LBFGSOptions(**kw)
    return jax.jit(lambda x: lbfgs_minimize(vg, x, opts))(jnp.asarray(x0))


def test_quadratic_exact():
    A = np.diag([1.0, 10.0, 100.0]).astype(np.float32)
    b = np.array([1.0, -2.0, 3.0], np.float32)

    def fun(x):
        return 0.5 * x @ jnp.asarray(A) @ x - jnp.asarray(b) @ x

    res = _run(fun, np.zeros(3, np.float32))
    expected = np.linalg.solve(A, b)
    np.testing.assert_allclose(np.asarray(res.x), expected, rtol=1e-3, atol=5e-4)
    assert int(res.status) in (0, 1)


def test_rosenbrock_matches_scipy():
    def fun(x):
        return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1.0 - x[:-1]) ** 2)

    x0 = np.array([-1.2, 1.0, -0.5, 0.8], np.float32)
    res = _run(fun, x0, maxiter=200)

    sp = scipy.optimize.minimize(
        lambda x: float(fun(jnp.asarray(x, jnp.float32))),
        x0.astype(np.float64),
        jac=lambda x: np.asarray(
            jax.grad(fun)(jnp.asarray(x, jnp.float32)), np.float64
        ),
        method="L-BFGS-B",
        options={"maxiter": 200},
    )
    assert float(res.f) < 1e-5 or float(res.f) <= sp.fun * 1.5 + 1e-6
    np.testing.assert_allclose(np.asarray(res.x), np.ones(4), atol=2e-2)


def test_eval_count_reasonable():
    def fun(x):
        return jnp.sum((x - 3.0) ** 2)

    res = _run(fun, np.zeros(10, np.float32))
    # a strictly convex quadratic converges in a couple of iterations
    assert int(res.n_iters) <= 5
    assert int(res.n_evals) <= 15


def test_maxiter_respected():
    def fun(x):
        return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1.0 - x[:-1]) ** 2)

    res = _run(fun, np.full(8, -1.5, np.float32), maxiter=3)
    assert int(res.n_iters) <= 3
    assert int(res.status) == 2 or int(res.n_iters) == 3


def test_nonsmooth_l1_like_objective():
    # similar character to the STFT L1 regularizer: kinks handled by the
    # gradient-safe abs
    def fun(x):
        return jnp.sum(jnp.sqrt(x**2 + 1e-8)) + 0.5 * jnp.sum(x**2)

    res = _run(fun, np.array([2.0, -1.0, 0.5], np.float32), maxiter=100)
    assert float(jnp.max(jnp.abs(res.x))) < 0.05


def test_2d_shape_preserved():
    def fun(x):
        return jnp.mean((x - 1.0) ** 2)

    res = _run(fun, np.zeros((2, 5), np.float32))
    assert res.x.shape == (2, 5)
    np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-3)


def test_matches_scipy_on_random_quadratics():
    rng = np.random.RandomState(0)
    for trial in range(3):
        Q = rng.randn(6, 6).astype(np.float32)
        A = Q @ Q.T + 0.1 * np.eye(6, dtype=np.float32)
        b = rng.randn(6).astype(np.float32)

        def fun(x):
            return 0.5 * x @ jnp.asarray(A) @ x + jnp.asarray(b) @ x

        res = _run(fun, np.zeros(6, np.float32))
        expected = np.linalg.solve(A.astype(np.float64), -b.astype(np.float64))
        f_star = 0.5 * expected @ A @ expected + b @ expected
        assert float(res.f) <= f_star + 1e-4 * max(1.0, abs(f_star))
