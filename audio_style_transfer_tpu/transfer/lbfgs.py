"""On-device L-BFGS with a strong-Wolfe zoom line search.

This replaces the reference's SciPy round trip: reference methods.py:133-137
wraps ``tf.contrib.opt.ScipyOptimizerInterface(method='L-BFGS-B')`` so each
of the ~100 iterations/epoch ships loss+gradient device->host, runs Fortran
L-BFGS-B, and ships the iterate host->device (~10,000 crossings per run —
the dominant cost, see SURVEY.md §3.1).  Here the *entire* minimization is
one XLA program: two-loop recursion over a fixed circular history inside a
``lax.while_loop``, line search as a nested while loop, zero host syncs.

The optimized variable is unbounded in the reference (no box constraints),
so plain L-BFGS is exactly equivalent to L-BFGS-B.  Default tolerances
mirror SciPy's (`factr=1e7 -> ftol ~ 2.22e-9`, `pgtol=1e-5`, `m=10`,
`maxls=20`), and the result reports the *function-evaluation* count, which
is what the reference's epoch early-stop compares against 50
(methods.py:180-181 counts loss_callback invocations).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LBFGSOptions:
    maxiter: int = 100
    memory: int = 10
    # SciPy L-BFGS-B defaults: factr=1e7 => ftol = 1e7 * eps(float64).
    ftol: float = 2.220446049250313e-09
    gtol: float = 1e-05
    maxls: int = 20
    # Number of consecutive zero-progress (f32-tie) iterations required
    # before declaring ftol convergence. 1 reproduces SciPy's literal
    # test; raise it for extra plateau robustness with f32 losses, where
    # at ftol=2.2e-9 the test can only fire on an *exact* f32 tie. (The
    # ftol test only counts iterations whose line search succeeded; a
    # failed search triggers an L-BFGS-B-style memory restart instead of
    # masquerading as convergence.)
    ftol_patience: int = 1
    # On a failed line search with non-empty history, discard the memory
    # and retry from the same point with steepest descent (lbfgsb.f mainlb
    # semantics) instead of terminating. Needed for single-shot maxiter=100
    # SciPy parity on f32 plateaus; the per-epoch transfer engine turns it
    # off (an aborted epoch just hands off to the next epoch's fresh
    # history — same final loss, ~15% fewer evaluations).
    restart_on_ls_fail: bool = True
    # Line search: "mt" is a port of MINPACK's dcsrch/dcstep — the exact
    # Moré-Thuente search SciPy's L-BFGS-B runs (validated step-for-step and
    # eval-for-eval against scipy's wrapped Fortran on scalar objectives) —
    # with L-BFGS-B's own constants (lnsrlb: ftol=1e-3, gtol=0.9, xtol=0.1).
    # "zoom" is a plainer strong-Wolfe bracketing zoom; it needs a tighter
    # curvature constant (c2=0.5) to match SciPy's convergence rate on the
    # transfer objective and costs ~40% more evaluations.
    line_search: str = "mt"
    # None = per-line-search default: mt -> (1e-3, 0.9), zoom -> (1e-4, 0.5).
    c1: float | None = None
    c2: float | None = None
    # dcsrch interval tolerance (mt only).
    xtol: float = 0.1

    def resolved_c1c2(self) -> tuple[float, float]:
        if self.line_search == "mt":
            c1d, c2d = 1e-3, 0.9
        else:
            c1d, c2d = 1e-4, 0.5
        return (self.c1 if self.c1 is not None else c1d,
                self.c2 if self.c2 is not None else c2d)


class LBFGSResult(NamedTuple):
    x: jax.Array
    f: jax.Array
    g: jax.Array
    n_iters: jax.Array  # outer iterations completed
    n_evals: jax.Array  # value_and_grad evaluations (incl. the initial one)
    status: jax.Array  # 0 converged(gtol) 1 converged(ftol) 2 maxiter 3 ls_fail
    aux: object = None  # has_aux=True: the objective's aux AT x0 (see below)


def _ip(a, b):
    """Flat inner product without reshapes: elementwise multiply + full
    reduce, which XLA fuses in the operands' native layout (jnp.vdot
    ravels its inputs, which costs a physical retiling copy for 2-D
    iterates)."""
    return jnp.sum(a * b)


def _two_loop(g, s_hist, y_hist, rho, head, count, gamma):
    """H·g via the L-BFGS two-loop recursion on a circular history.

    Invalid slots carry rho=0, which zeroes their contribution, so no
    branching is needed.  Both loops are UNROLLED (m is static, 10 by
    default): as `lax.fori_loop`s the 2m data-dependent vdot/axpy steps
    each paid while-loop sequencing overhead per L-BFGS iteration — a
    measurable slice of the ~190 us/eval loop overhead in the fused
    transfer program — while straight-line code lets XLA fuse each
    (vdot, axpy) pair and schedule the chain without loop bookkeeping.
    Same ops in the same order: bit-identical results.
    """
    m = rho.shape[0]
    q = g
    alpha = []
    for i in range(m):
        idx = (head - 1 - i) % m
        a = rho[idx] * _ip(s_hist[idx], q)
        q = q - a * y_hist[idx]
        alpha.append((idx, a))
    r = gamma * q
    for i in range(m - 1, -1, -1):
        idx, a = alpha[i]
        # Note: iterating the stored (idx, a) pairs in reverse is exactly
        # the forward loop's (head - count + i) % m order for the count
        # valid slots; invalid slots have rho=0 and contribute nothing
        # regardless of visit order.
        beta = rho[idx] * _ip(y_hist[idx], r)
        r = r + s_hist[idx] * (a - beta)
    return r


def _cubic_min(a, fa, dfa, b, fb, dfb):
    """Minimizer of the cubic interpolant through (a,fa,dfa),(b,fb,dfb)."""
    d1 = dfa + dfb - 3.0 * (fa - fb) / (a - b)
    arg = d1 * d1 - dfa * dfb
    d2 = jnp.sqrt(jnp.maximum(arg, 0.0)) * jnp.sign(b - a)
    denom = dfb - dfa + 2.0 * d2
    x = b - (b - a) * (dfb + d2 - d1) / denom
    bad = (arg < 0.0) | (jnp.abs(denom) < 1e-20) | ~jnp.isfinite(x)
    return jnp.where(bad, 0.5 * (a + b), x)


def _wolfe_line_search(value_and_grad_1d, f0, g0, dphi0, a_init, opts: LBFGSOptions):
    """Strong-Wolfe line search (Nocedal & Wright alg. 3.5/3.6) as one
    while_loop state machine: stage 0 brackets, stage 1 zooms.

    ``value_and_grad_1d(a)`` must return (f, dphi, g) at step size a.
    The full gradient vector rides along in the state so the outer L-BFGS
    loop never needs a separate re-evaluation at the accepted point — at
    ~7 ms per encoder fwd+bwd that re-eval would cost a third of the run.

    Returns (a, f, g, n_evals, ok).
    """
    c1, c2 = opts.resolved_c1c2()
    zero = jnp.asarray(0.0, f0.dtype)

    def eval_at(a):
        return value_and_grad_1d(a)

    init = dict(
        stage=jnp.array(0, jnp.int32),
        i=jnp.array(0, jnp.int32),
        a_prev=zero, f_prev=f0, dphi_prev=dphi0, g_prev=g0,
        a_lo=zero, f_lo=f0, dphi_lo=dphi0, g_lo=g0,
        a_hi=zero, f_hi=f0, dphi_hi=dphi0,
        a=jnp.asarray(a_init, f0.dtype),
        n_evals=jnp.array(0, jnp.int32),
        done=jnp.array(False),
        ok=jnp.array(False),
        a_star=zero, f_star=f0, dphi_star=dphi0, g_star=g0,
    )

    def cond(st):
        return (~st["done"]) & (st["n_evals"] < opts.maxls)

    def body(st):
        f_a, dphi_a, g_a = eval_at(st["a"])
        n_evals = st["n_evals"] + 1
        armijo_fail = (f_a > f0 + c1 * st["a"] * dphi0) | (
            (f_a >= st["f_prev"]) & (st["i"] > 0) & (st["stage"] == 0)
        )
        strong_wolfe = jnp.abs(dphi_a) <= -c2 * dphi0

        def bracket_step(st):
            # stage 0: expanding search
            found_hi = armijo_fail
            found_lo_hi_swap = (~armijo_fail) & (dphi_a >= 0.0)
            accept = (~armijo_fail) & strong_wolfe

            new = dict(st)
            new["n_evals"] = n_evals
            new["i"] = st["i"] + 1
            # accept
            new["done"] = accept
            new["ok"] = accept
            new["a_star"] = jnp.where(accept, st["a"], st["a_star"])
            new["f_star"] = jnp.where(accept, f_a, st["f_star"])
            new["dphi_star"] = jnp.where(accept, dphi_a, st["dphi_star"])
            new["g_star"] = jnp.where(accept, g_a, st["g_star"])
            # switch to zoom with (prev, a) bracket
            go_zoom = (found_hi | found_lo_hi_swap) & ~accept
            lo_is_prev = found_hi
            new["stage"] = jnp.where(go_zoom, 1, st["stage"])
            new["a_lo"] = jnp.where(go_zoom, jnp.where(lo_is_prev, st["a_prev"], st["a"]), st["a_lo"])
            new["f_lo"] = jnp.where(go_zoom, jnp.where(lo_is_prev, st["f_prev"], f_a), st["f_lo"])
            new["dphi_lo"] = jnp.where(go_zoom, jnp.where(lo_is_prev, st["dphi_prev"], dphi_a), st["dphi_lo"])
            new["g_lo"] = jnp.where(
                go_zoom, jnp.where(lo_is_prev, st["g_prev"], g_a), st["g_lo"]
            )
            new["a_hi"] = jnp.where(go_zoom, jnp.where(lo_is_prev, st["a"], st["a_prev"]), st["a_hi"])
            new["f_hi"] = jnp.where(go_zoom, jnp.where(lo_is_prev, f_a, st["f_prev"]), st["f_hi"])
            new["dphi_hi"] = jnp.where(go_zoom, jnp.where(lo_is_prev, dphi_a, st["dphi_prev"]), st["dphi_hi"])
            # otherwise expand
            expand = ~accept & ~go_zoom
            new["a_prev"] = jnp.where(expand, st["a"], st["a_prev"])
            new["f_prev"] = jnp.where(expand, f_a, st["f_prev"])
            new["dphi_prev"] = jnp.where(expand, dphi_a, st["dphi_prev"])
            new["g_prev"] = jnp.where(expand, g_a, st["g_prev"])
            new["a"] = jnp.where(expand, 2.0 * st["a"], st["a"])
            # when entering zoom, next trial comes from interpolation below
            return new

        def zoom_step(st):
            new = dict(st)
            new["n_evals"] = n_evals
            new["i"] = st["i"] + 1
            zoom_armijo_fail = (f_a > f0 + c1 * st["a"] * dphi0) | (f_a >= st["f_lo"])

            accept = (~zoom_armijo_fail) & strong_wolfe
            new["done"] = accept
            new["ok"] = accept
            new["a_star"] = jnp.where(accept, st["a"], st["a_star"])
            new["f_star"] = jnp.where(accept, f_a, st["f_star"])
            new["dphi_star"] = jnp.where(accept, dphi_a, st["dphi_star"])
            new["g_star"] = jnp.where(accept, g_a, st["g_star"])

            # shrink bracket
            hi_to_a = zoom_armijo_fail
            # if derivative sign indicates, hi <- lo before lo <- a
            flip = (~zoom_armijo_fail) & (dphi_a * (st["a_hi"] - st["a_lo"]) >= 0.0)
            new["a_hi"] = jnp.where(hi_to_a, st["a"], jnp.where(flip, st["a_lo"], st["a_hi"]))
            new["f_hi"] = jnp.where(hi_to_a, f_a, jnp.where(flip, st["f_lo"], st["f_hi"]))
            new["dphi_hi"] = jnp.where(hi_to_a, dphi_a, jnp.where(flip, st["dphi_lo"], st["dphi_hi"]))
            lo_to_a = ~zoom_armijo_fail
            new["a_lo"] = jnp.where(lo_to_a, st["a"], st["a_lo"])
            new["f_lo"] = jnp.where(lo_to_a, f_a, st["f_lo"])
            new["dphi_lo"] = jnp.where(lo_to_a, dphi_a, st["dphi_lo"])
            new["g_lo"] = jnp.where(lo_to_a, g_a, st["g_lo"])
            return new

        st2 = jax.lax.cond(st["stage"] == 0, bracket_step, zoom_step, st)

        # choose next trial point when still running
        def next_trial(st2):
            in_zoom = st2["stage"] == 1
            a_cubic = _cubic_min(
                st2["a_lo"], st2["f_lo"], st2["dphi_lo"],
                st2["a_hi"], st2["f_hi"], st2["dphi_hi"],
            )
            lo, hi = st2["a_lo"], st2["a_hi"]
            lo_, hi_ = jnp.minimum(lo, hi), jnp.maximum(lo, hi)
            width = hi_ - lo_
            a_safe = jnp.clip(a_cubic, lo_ + 0.1 * width, hi_ - 0.1 * width)
            st2["a"] = jnp.where(in_zoom, a_safe, st2["a"])
            # degenerate bracket: give up
            st2["done"] = st2["done"] | (in_zoom & (width <= 1e-10 * jnp.maximum(1.0, hi_)))
            return st2

        return next_trial(st2)

    st = jax.lax.while_loop(cond, body, init)
    # On failure take the best bracketing point (a_lo) if it improves f0.
    salvage = (~st["ok"]) & (st["f_lo"] < f0) & (st["a_lo"] > 0.0)
    a = jnp.where(st["ok"], st["a_star"], jnp.where(salvage, st["a_lo"], 0.0))
    f = jnp.where(st["ok"], st["f_star"], jnp.where(salvage, st["f_lo"], f0))
    g = jnp.where(st["ok"], st["g_star"], jnp.where(salvage, st["g_lo"], g0))
    ok = st["ok"] | salvage
    return a, f, g, st["n_evals"], ok


def _dcstep(stx, fx, dx, sty, fy, dy, stp, fp, dp, brackt, stpmin, stpmax):
    """MINPACK dcstep: one safeguarded trial-step update (dcstep.f).

    (stx, fx, dx) is the best step so far, (sty, fy, dy) the other endpoint,
    (stp, fp, dp) the step just evaluated. Returns the updated
    (stx, fx, dx, sty, fy, dy, stp, brackt). Branch-free: all four Fortran
    cases are computed and selected with where (guarded against the inactive
    cases' div-by-zero via small-denominator clamps).
    """

    def _safe(q):
        tiny = jnp.asarray(1e-30, q.dtype)
        return jnp.where(jnp.abs(q) < tiny, jnp.where(q < 0, -tiny, tiny), q)

    sgnd = dp * jnp.sign(dx)

    # case 1: fp > fx — a higher value; the minimum is bracketed.
    theta1 = 3.0 * (fx - fp) / _safe(stp - stx) + dx + dp
    s1 = jnp.maximum(jnp.maximum(jnp.abs(theta1), jnp.abs(dx)), jnp.abs(dp))
    s1 = _safe(s1)
    g1 = s1 * jnp.sqrt(jnp.maximum((theta1 / s1) ** 2 - (dx / s1) * (dp / s1), 0.0))
    g1 = jnp.where(stp < stx, -g1, g1)
    r1 = ((g1 - dx) + theta1) / _safe(((g1 - dx) + g1) + dp)
    stpc1 = stx + r1 * (stp - stx)
    stpq1 = stx + ((dx / _safe((fx - fp) / _safe(stp - stx) + dx)) / 2.0) * (stp - stx)
    stpf1 = jnp.where(
        jnp.abs(stpc1 - stx) < jnp.abs(stpq1 - stx),
        stpc1,
        stpc1 + (stpq1 - stpc1) / 2.0,
    )

    # case 2: fp <= fx, derivatives of opposite sign — bracketed.
    theta2 = 3.0 * (fx - fp) / _safe(stp - stx) + dx + dp
    s2 = _safe(jnp.maximum(jnp.maximum(jnp.abs(theta2), jnp.abs(dx)), jnp.abs(dp)))
    g2 = s2 * jnp.sqrt(jnp.maximum((theta2 / s2) ** 2 - (dx / s2) * (dp / s2), 0.0))
    g2 = jnp.where(stp > stx, -g2, g2)
    r2 = ((g2 - dp) + theta2) / _safe(((g2 - dp) + g2) + dx)
    stpc2 = stp + r2 * (stx - stp)
    stpq2 = stp + (dp / _safe(dp - dx)) * (stx - stp)
    stpf2 = jnp.where(jnp.abs(stpc2 - stp) > jnp.abs(stpq2 - stp), stpc2, stpq2)

    # case 3: fp <= fx, same sign, |dp| decreasing.
    theta3 = 3.0 * (fx - fp) / _safe(stp - stx) + dx + dp
    s3 = _safe(jnp.maximum(jnp.maximum(jnp.abs(theta3), jnp.abs(dx)), jnp.abs(dp)))
    g3 = s3 * jnp.sqrt(jnp.maximum((theta3 / s3) ** 2 - (dx / s3) * (dp / s3), 0.0))
    g3 = jnp.where(stp > stx, -g3, g3)
    r3 = ((g3 - dp) + theta3) / _safe((g3 + (dx - dp)) + g3)
    stpc3 = jnp.where(
        (r3 < 0.0) & (g3 != 0.0),
        stp + r3 * (stx - stp),
        jnp.where(stp > stx, stpmax, stpmin),
    )
    stpq3 = stp + (dp / _safe(dp - dx)) * (stx - stp)
    stpf3_brackt = jnp.where(jnp.abs(stpc3 - stp) < jnp.abs(stpq3 - stp), stpc3, stpq3)
    stpf3_brackt = jnp.where(
        stp > stx,
        jnp.minimum(stp + 0.66 * (sty - stp), stpf3_brackt),
        jnp.maximum(stp + 0.66 * (sty - stp), stpf3_brackt),
    )
    stpf3_open = jnp.where(jnp.abs(stpc3 - stp) > jnp.abs(stpq3 - stp), stpc3, stpq3)
    stpf3_open = jnp.clip(stpf3_open, stpmin, stpmax)
    stpf3 = jnp.where(brackt, stpf3_brackt, stpf3_open)

    # case 4: fp <= fx, same sign, |dp| not decreasing.
    theta4 = 3.0 * (fp - fy) / _safe(sty - stp) + dy + dp
    s4 = _safe(jnp.maximum(jnp.maximum(jnp.abs(theta4), jnp.abs(dy)), jnp.abs(dp)))
    g4 = s4 * jnp.sqrt(jnp.maximum((theta4 / s4) ** 2 - (dy / s4) * (dp / s4), 0.0))
    g4 = jnp.where(stp > sty, -g4, g4)
    r4 = ((g4 - dp) + theta4) / _safe(((g4 - dp) + g4) + dy)
    stpc4 = stp + r4 * (sty - stp)
    stpf4 = jnp.where(brackt, stpc4, jnp.where(stp > stx, stpmax, stpmin))

    case1 = fp > fx
    case2 = (~case1) & (sgnd < 0.0)
    case3 = (~case1) & (~case2) & (jnp.abs(dp) < jnp.abs(dx))
    stpf = jnp.where(case1, stpf1, jnp.where(case2, stpf2, jnp.where(case3, stpf3, stpf4)))

    sty_n = jnp.where(case1, stp, jnp.where(sgnd < 0.0, stx, sty))
    fy_n = jnp.where(case1, fp, jnp.where(sgnd < 0.0, fx, fy))
    dy_n = jnp.where(case1, dp, jnp.where(sgnd < 0.0, dx, dy))
    stx_n = jnp.where(case1, stx, stp)
    fx_n = jnp.where(case1, fx, fp)
    dx_n = jnp.where(case1, dx, dp)
    brackt_n = brackt | case1 | case2

    # NOTE: dcstep.f clamps the trial to [stpmin, stpmax] ONLY in the
    # unbracketed case-3/4 branches (already folded into stpf3_open/stpf4
    # above). A global clamp here diverges from MINPACK on the
    # extrapolate-then-bracket transition — stpmin > stp always holds while
    # unbracketed, so the first interpolation inside a fresh bracket got
    # clipped out of it, parking the search at stx (found in review; see
    # tests/test_mt_line_search.py 'kink' case).
    return stx_n, fx_n, dx_n, sty_n, fy_n, dy_n, stpf, brackt_n


def _mt_line_search(value_and_grad_1d, f0, g0, dphi0, a_init, opts: LBFGSOptions):
    """Moré-Thuente line search — a port of MINPACK's dcsrch driver
    (the line search inside SciPy's L-BFGS-B, lbfgsb.f lnsrlb) as one
    ``lax.while_loop`` with exactly one objective evaluation per iteration.

    Stage 1 works on the *modified* function psi(a) = f(a) - f0 - c1·a·dphi0
    until a step with psi <= 0 and dphi >= 0 is found; this is what lets the
    loose curvature constant (c2=0.9) converge in 1-2 evaluations on
    well-scaled problems without stalling on plateaus (the failure mode of a
    plain zoom at c2=0.9 — see tests/test_lbfgs_scipy_parity.py history).

    Validated against scipy's wrapped Fortran dcsrch step-for-step and
    eval-for-eval on scalar objectives. Returns (a, f, g, n_evals, ok).
    """
    dtype = f0.dtype
    c1, c2 = opts.resolved_c1c2()
    stpmin = jnp.asarray(1e-20, dtype)
    stpmax = jnp.asarray(1e20, dtype)
    xtrapl = jnp.asarray(1.1, dtype)
    xtrapu = jnp.asarray(4.0, dtype)
    finit, ginit = f0, dphi0
    gtest = c1 * ginit
    zero = jnp.asarray(0.0, dtype)

    a0 = jnp.clip(jnp.asarray(a_init, dtype), stpmin, stpmax)
    init = dict(
        stp=a0,
        a_eval=zero,  # the step the state's f/g were evaluated at
        brackt=jnp.array(False),
        stage1=jnp.array(True),
        stx=zero, fx=finit, dx=ginit,
        sty=zero, fy=finit, dy=ginit,
        stmin=zero,
        stmax=a0 + xtrapu * a0,
        width=stpmax - stpmin,
        width1=(stpmax - stpmin) / 0.5,
        n_evals=jnp.array(0, jnp.int32),
        done=jnp.array(False),
        ok=jnp.array(False),
        f=f0, dphi=dphi0, g=g0,
        # Best raw-f evaluated point so far, for non-Wolfe-exit parking
        # (dcsrch parks at stx on its bracket warnings; the best evaluated
        # trial is never worse than stx in raw f).
        a_best=zero, f_best=f0, g_best=g0,
    )

    def cond(st):
        return (~st["done"]) & (st["n_evals"] < opts.maxls)

    def body(st):
        f, dphi, g = value_and_grad_1d(st["stp"])
        n_evals = st["n_evals"] + 1
        stp = st["stp"]
        ftest = finit + stp * gtest

        # dcsrch.f: stage 1 ends once f <= ftest and dphi >= min(c1,c2)*dphi0
        # (a slightly negative threshold, NOT zero).
        stage1 = st["stage1"] & ~(
            (f <= ftest) & (dphi >= jnp.minimum(c1, c2) * ginit)
        )
        converged = (f <= ftest) & (jnp.abs(dphi) <= c2 * (-ginit))
        # dcsrch warning exits: degenerate interval / rounding floor — stop
        # at the current evaluation (the caller salvages if it improves f0).
        warn = (
            (st["brackt"] & ((stp <= st["stmin"]) | (stp >= st["stmax"])))
            | (st["brackt"] & (st["stmax"] - st["stmin"] <= opts.xtol * st["stmax"]))
            | ((stp == stpmax) & (f <= ftest) & (dphi <= gtest))
            | ((stp == stpmin) & ((f > ftest) | (dphi >= gtest)))
        )

        # Stage-1 steps that beat fx but fail sufficient decrease update the
        # interval on the modified function (dcsrch.f lines ~230-250).
        use_mod = stage1 & (f <= st["fx"]) & (f > ftest)
        fm = jnp.where(use_mod, f - stp * gtest, f)
        fxm = jnp.where(use_mod, st["fx"] - st["stx"] * gtest, st["fx"])
        fym = jnp.where(use_mod, st["fy"] - st["sty"] * gtest, st["fy"])
        gm = jnp.where(use_mod, dphi - gtest, dphi)
        gxm = jnp.where(use_mod, st["dx"] - gtest, st["dx"])
        gym = jnp.where(use_mod, st["dy"] - gtest, st["dy"])

        stx, fx2, dx2, sty, fy2, dy2, stp_new, brackt = _dcstep(
            st["stx"], fxm, gxm, st["sty"], fym, gym,
            stp, fm, gm, st["brackt"], st["stmin"], st["stmax"],
        )

        fx3 = jnp.where(use_mod, fx2 + stx * gtest, fx2)
        fy3 = jnp.where(use_mod, fy2 + sty * gtest, fy2)
        dx3 = jnp.where(use_mod, dx2 + gtest, dx2)
        dy3 = jnp.where(use_mod, dy2 + gtest, dy2)

        # Force bisection when the bracket shrinks too slowly.
        wid = jnp.abs(sty - stx)
        force_bisect = brackt & (wid >= 0.66 * st["width1"])
        stp_new = jnp.where(force_bisect, stx + 0.5 * (sty - stx), stp_new)
        width1 = jnp.where(brackt, st["width"], st["width1"])
        width = jnp.where(brackt, wid, st["width"])

        stmin = jnp.where(brackt, jnp.minimum(stx, sty),
                          stp_new + xtrapl * (stp_new - stx))
        stmax_n = jnp.where(brackt, jnp.maximum(stx, sty),
                            stp_new + xtrapu * (stp_new - stx))
        stp_new = jnp.clip(stp_new, stpmin, stpmax)
        # No further progress possible: park at the best point.
        give_up = (brackt & ((stp_new <= stmin) | (stp_new >= stmax_n))) | (
            brackt & (stmax_n - stmin <= opts.xtol * stmax_n)
        )
        stp_new = jnp.where(give_up, stx, stp_new)

        done = converged | warn
        improved = f < st["f_best"]
        return dict(
            stp=jnp.where(done, stp, stp_new),
            a_eval=stp,
            brackt=brackt,
            stage1=stage1,
            stx=stx, fx=fx3, dx=dx3,
            sty=sty, fy=fy3, dy=dy3,
            stmin=stmin, stmax=stmax_n,
            width=width, width1=width1,
            n_evals=n_evals,
            done=done,
            ok=st["ok"] | converged,
            f=f, dphi=dphi, g=g,
            a_best=jnp.where(improved, stp, st["a_best"]),
            f_best=jnp.where(improved, f, st["f_best"]),
            g_best=jnp.where(improved, g, st["g_best"]),
        )

    st = jax.lax.while_loop(cond, body, init)
    # Wolfe convergence accepts the converged trial (``a_eval`` — not
    # ``stp`` — is the step the state's f/g were evaluated at: on exit stp
    # may already hold the NEXT, never-evaluated trial, and returning it
    # would pair x + a*d with stale f/g and corrupt the (s, y) curvature
    # pair built from them). On maxls exhaustion or a dcsrch warning exit,
    # park at the BEST evaluated point rather than the last one — dcsrch
    # parks at stx (dcsrch.f "let stp be the best point obtained"), and an
    # earlier trial that improved f0 must not be discarded for a worse
    # final trial (advisor finding, round 2).
    wolfe = st["ok"]
    best_improves = st["f_best"] < f0
    accept = wolfe | best_improves
    a = jnp.where(wolfe, st["a_eval"], jnp.where(best_improves, st["a_best"], 0.0))
    f = jnp.where(wolfe, st["f"], jnp.where(best_improves, st["f_best"], f0))
    g = jnp.where(wolfe, st["g"], jnp.where(best_improves, st["g_best"], g0))
    return a, f, g, st["n_evals"], accept


def lbfgs_minimize(
    value_and_grad: Callable,
    x0: jax.Array,
    opts: LBFGSOptions = LBFGSOptions(),
    history: dict | None = None,
    return_history: bool = False,
    has_aux: bool = False,
):
    """Minimize ``f`` with L-BFGS, fully on device.

    Args:
      value_and_grad: callable x -> (f, g) with x, g shaped like ``x0``.
        (Build with ``jax.value_and_grad``; any pytree is supported by
        flattening outside.)
      x0: initial point (any shape; the iterate, gradient, and history
        slots all keep this native shape — a history dict passed back in
        must have (memory,) + x0.shape slots).
      history: optional curvature memory from a previous call (as returned
        with ``return_history=True``) to warm-start the Hessian
        approximation — the continuation mode the reference's per-epoch
        ``ScipyOptimizerInterface.minimize`` restarts cannot express
        (SciPy's L-BFGS-B is stateless across calls).
      return_history: also return the final curvature memory.

    Returns:
      LBFGSResult with the final iterate and counters — or
      ``(LBFGSResult, history)`` when ``return_history`` is set. Wrap the
      call in ``jax.jit`` for a single fused XLA program.
    """
    # The iterate keeps its NATIVE shape end to end (history slots are
    # [m, *shape]); all inner products are elementwise-multiply+sum, which
    # XLA fuses without touching the layout.  The previous flatten-to-1D
    # design forced a physical [1, T] <-> [T] retiling copy (2-D (8,128)
    # tiles vs 1-D 1024-lane tiles) on every x and g crossing into the
    # loss — ~48 us/eval of copies + stalls in the transfer hot loop
    # (round-3 device trace).
    shape = x0.shape
    m = opts.memory
    dtype = x0.dtype

    # has_aux: ``value_and_grad`` returns ((f, aux), g) (the
    # jax.value_and_grad(..., has_aux=True) convention).  Only the
    # INITIAL evaluation's aux is kept (returned as LBFGSResult.aux) —
    # the per-epoch transfer engine uses it to read the loss components
    # at the previous epoch's final iterate without re-running the
    # forward pass; the line-search path strips aux.
    def vg(x):
        if has_aux:
            (f, _), g = value_and_grad(x)
        else:
            f, g = value_and_grad(x)
        return f.astype(dtype), g.astype(dtype)

    if has_aux:
        (f0, aux0), g0 = value_and_grad(x0)
        f0, g0 = f0.astype(dtype), g0.astype(dtype)
    else:
        f0, g0 = vg(x0)
        aux0 = None

    if history is None:
        history = dict(
            s_hist=jnp.zeros((m,) + shape, dtype),
            y_hist=jnp.zeros((m,) + shape, dtype),
            rho=jnp.zeros((m,), dtype),
            head=jnp.array(0, jnp.int32),
            count=jnp.array(0, jnp.int32),
            gamma=jnp.asarray(1.0, dtype),
        )
    state = dict(
        x=x0, f=f0, g=g0,
        k=jnp.array(0, jnp.int32),
        n_evals=jnp.array(1, jnp.int32),
        status=jnp.array(2, jnp.int32),  # default: maxiter
        done=jnp.array(False),
        ftol_strikes=jnp.array(0, jnp.int32),
        **history,
    )

    def cond(st):
        return (~st["done"]) & (st["k"] < opts.maxiter)

    def body(st):
        d = -_two_loop(
            st["g"], st["s_hist"], st["y_hist"], st["rho"],
            st["head"], st["count"], st["gamma"],
        )
        dphi0 = _ip(st["g"], d)
        # Safeguard: if not a descent direction, restart with steepest descent.
        bad_dir = dphi0 >= 0.0
        d = jnp.where(bad_dir, -st["g"], d)
        dphi0 = jnp.where(bad_dir, -_ip(st["g"], st["g"]), dphi0)

        # First-iteration step length mirrors L-BFGS-B (lnsrlb.f): 1/||d||_2
        # for the Moré-Thuente search; the zoom path keeps its historical
        # 1/||g||_1 scaling (its parity constants were tuned around it).
        if opts.line_search == "mt":
            first_a = 1.0 / jnp.sqrt(_ip(d, d))
        else:
            first_a = jnp.minimum(1.0, 1.0 / jnp.sum(jnp.abs(st["g"])))
        # The small first step only applies with an empty memory (a
        # warm-started call's two-loop direction is already well scaled).
        a_init = jnp.where(
            (st["k"] == 0) & (st["count"] == 0), first_a, 1.0
        ).astype(dtype)

        x, f, g = st["x"], st["f"], st["g"]

        def vg_1d(a):
            fa, ga = vg(x + a * d)
            return fa, _ip(ga, d), ga

        search = _mt_line_search if opts.line_search == "mt" else _wolfe_line_search
        a, f_new, g_new, ls_evals, ok = search(vg_1d, f, g, dphi0, a_init, opts)
        x_new = x + a * d

        s = x_new - x
        y = g_new - g
        sy = _ip(s, y)
        curv_ok = ok & (sy > 1e-10 * _ip(y, y))
        idx = st["head"] % m
        s_hist = jnp.where(curv_ok, st["s_hist"].at[idx].set(s), st["s_hist"])
        y_hist = jnp.where(curv_ok, st["y_hist"].at[idx].set(y), st["y_hist"])
        rho = jnp.where(curv_ok, st["rho"].at[idx].set(1.0 / sy), st["rho"])
        head = jnp.where(curv_ok, st["head"] + 1, st["head"])
        count = jnp.where(curv_ok, jnp.minimum(st["count"] + 1, m), st["count"])
        gamma = jnp.where(curv_ok, sy / _ip(y, y), st["gamma"])

        # L-BFGS-B (mainlb.f) on a failed line search: discard the history
        # and restart the iteration from the same point with steepest
        # descent; abort only when the line search fails WITH an empty
        # history (i.e. on the steepest-descent direction itself).
        restart = (~ok) & (st["count"] > 0) & opts.restart_on_ls_fail
        rho = jnp.where(restart, jnp.zeros_like(rho), rho)
        count = jnp.where(restart, 0, count)
        gamma = jnp.where(restart, jnp.ones_like(st["gamma"]), gamma)

        # Convergence tests (SciPy semantics; ftol needs `ftol_patience`
        # consecutive hits — see LBFGSOptions for the f32 rationale).
        gtol_hit = jnp.max(jnp.abs(g_new)) <= opts.gtol
        ftol_tick = (f - f_new) <= opts.ftol * jnp.maximum(
            jnp.maximum(jnp.abs(f), jnp.abs(f_new)), 1.0
        )
        ftol_strikes = jnp.where(ftol_tick & ok, st["ftol_strikes"] + 1, 0)
        ftol_hit = ftol_strikes >= opts.ftol_patience
        ls_failed = (~ok) & ~restart

        status = jnp.where(
            gtol_hit, 0, jnp.where(ftol_hit, 1, jnp.where(ls_failed, 3, st["status"]))
        )

        return dict(
            x=jnp.where(ok, x_new, x),
            f=jnp.where(ok, f_new, f),
            g=jnp.where(ok, g_new, g),
            s_hist=s_hist, y_hist=y_hist, rho=rho,
            head=head, count=count, gamma=gamma,
            k=st["k"] + 1,
            n_evals=st["n_evals"] + ls_evals,
            status=status,
            done=gtol_hit | ftol_hit | ls_failed,
            ftol_strikes=ftol_strikes,
        )

    st = jax.lax.while_loop(cond, body, state)
    res = LBFGSResult(
        x=st["x"],
        f=st["f"],
        g=st["g"],
        n_iters=st["k"],
        n_evals=st["n_evals"],
        status=st["status"],
        aux=aux0,
    )
    if return_history:
        return res, {k: st[k] for k in
                     ("s_hist", "y_hist", "rho", "head", "count", "gamma")}
    return res
