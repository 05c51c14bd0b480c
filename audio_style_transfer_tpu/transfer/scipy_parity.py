"""Full-geometry SciPy L-BFGS-B parity check (runnable validation harness).

The north star holds our on-device L-BFGS to final losses within 1% of the
reference's optimizer, SciPy's Fortran L-BFGS-B
(reference methods.py:133-137).  This module runs BOTH optimizers on the
identical full-geometry transfer loss (30 layers, width 128, T=16384 by
default) and reports the relative deviation and evaluation counts as one
JSON line per seed.

Run on the TPU (preferred; ~40 s/side warm) or CPU (slow):

    python -m audio_style_transfer_tpu.transfer.scipy_parity \
        --seeds 2 --maxiter 100 --tol 0.01

Exit code 0 iff every seed's |rel| <= tol.  Measured 2026-08-17 on one
v5e chip with the Moré-Thuente (dcsrch-port) line search after the
review's dcstep fix, maxiter=100, seeds 0/1: rel -0.006% / -0.010%
(ours 221/161 evals vs scipy 102/61 — SciPy quits early on its f64 factr
test at these f32 plateaus; our memory-restart semantics keep optimizing
to a marginally lower loss) — see BENCH_NOTES.md.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _tone(seed: int, t: int) -> np.ndarray:
    """Harmonic test clip (tonal content so the grams carry structure)."""
    r = np.random.RandomState(seed)
    tt = np.arange(t) / 16000.0
    a = sum(
        r.uniform(0.1, 0.4) * np.sin(2 * np.pi * r.uniform(100, 400) * (h + 1) * tt
                                     + r.uniform(0, 6))
        for h in range(4)
    )
    a = 0.8 * a / np.max(np.abs(a)) + 0.05 * r.randn(t)
    return np.clip(a, -1, 1)


def run_parity(t: int = 16384, maxiter: int = 100, seeds: int = 2,
               stack0: bool = True, toy: bool = False,
               line_search: str = "mt") -> list[dict]:
    """Returns one record per seed: {seed, ours, scipy, rel, ...}."""
    import jax
    import jax.numpy as jnp
    import scipy.optimize

    from audio_style_transfer_tpu.models import WaveNetAEConfig, init_params
    from audio_style_transfer_tpu.signal import mu_law_numpy
    from audio_style_transfer_tpu.transfer import LBFGSOptions, lbfgs_minimize
    from audio_style_transfer_tpu.transfer.losses import (
        LossSpec,
        transfer_embeds,
        transfer_loss,
    )

    if toy:
        cfg = WaveNetAEConfig(
            num_layers=2, num_stages=2, width=8, skip_width=8,
            ae_num_layers=4, ae_num_stages=2, ae_width=8,
            ae_hop_length=64, ae_bottleneck_width=4,
        )
        spec = LossSpec(cont_lyr_ids=(3,), style_layer_ids=(0, 1, 2, 3),
                        cnt_channels=8, nb_channels=8, lambd=10.0, gamma=0.01)
    else:
        cfg = WaveNetAEConfig()
        spec = LossSpec(
            style_layer_ids=tuple(range(10)) if stack0 else tuple(range(30))
        )
    params = init_params(jax.random.PRNGKey(7 if not toy else 42), cfg)

    out = []
    for seed in range(seeds):
        if toy:
            rng = np.random.RandomState(seed)
            aud_c = rng.uniform(-0.8, 0.8, t)
            aud_s = rng.uniform(-0.8, 0.8, t)
        else:
            aud_c, aud_s = _tone(2 * seed, t), _tone(2 * seed + 1, t)
        xq_c = jnp.asarray(mu_law_numpy(aud_c[None]), jnp.float32)
        xq_s = jnp.asarray(mu_law_numpy(aud_s[None]), jnp.float32)
        phi_c, _ = transfer_embeds(params, xq_c, cfg, spec)
        _, phi_s = transfer_embeds(params, xq_s, cfg, spec)

        def loss(x):
            return transfer_loss(params, x, phi_c, phi_s, cfg, spec)[0]

        vg = jax.jit(jax.value_and_grad(loss))
        x0 = jnp.full((1, t), 1e-6, jnp.float32)

        opts = LBFGSOptions(maxiter=maxiter, line_search=line_search)
        res = jax.jit(lambda x: lbfgs_minimize(vg, x, opts))(x0)
        ours, ours_ev = float(res.f), int(res.n_evals)

        def f_np(x64):
            v, g = vg(jnp.asarray(x64, jnp.float32).reshape(1, t))
            return float(v), np.asarray(g, np.float64).reshape(-1)

        sp = scipy.optimize.minimize(
            f_np, np.full(t, 1e-6), jac=True, method="L-BFGS-B",
            options={"maxiter": maxiter},
        )
        scipy_loss = float(sp.fun)
        l0 = float(loss(x0))
        max_g = float(np.max(np.abs(sp.jac)))
        out.append({
            "seed": seed,
            "t": t,
            "maxiter": maxiter,
            "start_loss": l0,
            "ours": ours,
            "ours_evals": ours_ev,
            "scipy": scipy_loss,
            "scipy_evals": int(sp.nfev),
            "scipy_status": str(sp.message),
            "scipy_max_grad": max_g,
            "rel": (ours - scipy_loss) / abs(scipy_loss),
            "reduction_ours": (l0 - ours) / l0,
            "reduction_scipy": (l0 - scipy_loss) / l0,
            # SciPy's factr test compares f32-rounded losses, so on flat
            # regions it can declare CONVERGENCE far from any stationary
            # point. The signature — detectable from SciPy's run alone — is
            # the factr message with a final gradient an order of magnitude
            # above pgtol (healthy runs end on the projected-gradient
            # criterion, max|g| <= 1e-5).
            "scipy_stalled": bool(
                "REDUCTION OF F" in str(sp.message) and max_g > 1e-4
            ),
        })
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--t", type=int, default=16384)
    p.add_argument("--maxiter", type=int, default=100)
    p.add_argument("--seeds", type=int, default=2)
    p.add_argument("--tol", type=float, default=0.01)
    p.add_argument("--full_stack", action="store_true",
                   help="style grams over all 30 layers instead of stack 0")
    p.add_argument("--toy", action="store_true",
                   help="toy geometry (fast; the unit-test configuration)")
    p.add_argument("--line_search", default="mt", choices=("mt", "zoom"),
                   help="mt = SciPy's own dcsrch port; zoom = the engine's "
                        "faster strong-Wolfe zoom (c2=0.5)")
    p.add_argument("--device_check", action="store_true",
                   help="print the jax platform and exit 0")
    args = p.parse_args(argv)

    import jax

    if args.device_check:
        print(json.dumps({"platform": jax.devices()[0].platform}))
        return 0

    records = run_parity(t=args.t, maxiter=args.maxiter, seeds=args.seeds,
                         stack0=not args.full_stack, toy=args.toy,
                         line_search=args.line_search)
    ok = True
    for r in records:
        print(json.dumps(r))
        if not r["scipy_stalled"] and abs(r["rel"]) > args.tol:
            ok = False
        if r["scipy_stalled"] and r["ours"] > r["scipy"] * (1 + args.tol):
            ok = False
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
