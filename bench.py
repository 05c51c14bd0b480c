"""Benchmark: style-transfer throughput on a 16384-sample clip.

Driver metric (BASELINE.json): style-transfer iters/sec on a 16384-sample
clip; wall-clock to 100 epochs.  The north-star target is < 10 s wall-clock
for the pachelbel->organ run (100 epochs x <=100 L-BFGS iterations) on one
v5e chip; the reference executes the same budget through SciPy with ~100
host<->device round trips per epoch.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
vs_baseline = (north-star 10 s) / (our wall-clock), i.e. >1 beats the
target. Extra keys document the sub-benchmarks.

Run as: python bench.py  [--epochs N] [--precision float32|bfloat16]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def synth_audio(seconds: float, sr: int = 16000, kind: str = "content"):
    """Deterministic synthetic audio standing in for pachelbel/organ clips."""
    t = np.arange(int(seconds * sr)) / sr
    if kind == "content":
        # melodic arpeggio with vibrato — pachelbel stand-in
        f = 220.0 * 2 ** (np.floor(t * 4) % 8 / 4.0)
        x = 0.4 * np.sin(2 * np.pi * f * t) + 0.2 * np.sin(2 * np.pi * 2 * f * t)
    else:
        # rich harmonic drone — organ stand-in
        x = sum(
            0.25 / (k + 1) * np.sin(2 * np.pi * 110 * (k + 1) * t + 0.1 * k)
            for k in range(8)
        )
    return x.astype(np.float32)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("--maxiter", type=int, default=100)
    parser.add_argument("--batch_size", type=int, default=16384)
    parser.add_argument("--precision", default="bfloat16",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--stack", type=int, default=0)
    parser.add_argument("--fused", dest="fused", action="store_true", default=True,
                        help="Pallas fused encoder blocks (default on)")
    parser.add_argument("--no_fused", dest="fused", action="store_false")
    parser.add_argument("--no_chain", dest="chain", action="store_false",
                        default=None,
                        help="force the per-layer fused kernels instead of "
                             "the chained-trunk kernels (comparison mode; "
                             "default: chain follows --fused)")
    parser.add_argument("--suite", dest="suite", action="store_true",
                        default=True,
                        help="also run gatys / full-stack / batched configs "
                             "(default on, so the driver-recorded JSON "
                             "captures the whole BASELINE suite)")
    parser.add_argument("--no_suite", dest="suite", action="store_false")
    parser.add_argument("--longform", dest="longform", action="store_true",
                        default=True,
                        help="also run the 60-s chunked+OT long-form config "
                             "(BASELINE config 5; default on)")
    parser.add_argument("--no_longform", dest="longform", action="store_false")
    parser.add_argument("--synthesis", dest="synthesis", action="store_true",
                        default=True,
                        help="also record autoregressive-synthesis "
                             "us/sample at f32/bf16/int8 (default on, so "
                             "the round-3 94-us claim is a driver artifact)")
    parser.add_argument("--no_synthesis", dest="synthesis",
                        action="store_false")
    parser.add_argument("--train_step", dest="train_step",
                        action="store_true", default=True,
                        help="also record the reference-geometry training "
                             "step (batch 32 x 6144) ms/step + model FLOP/s "
                             "(default on)")
    parser.add_argument("--no_train_step", dest="train_step",
                        action="store_false")
    parser.add_argument("--strict", dest="strict", action="store_true",
                        default=True,
                        help="fail loudly if the Pallas fused encoder cannot "
                             "compile instead of silently benchmarking the "
                             "XLA fallback (default on: a Mosaic regression "
                             "must not ship fallback numbers as if fused)")
    parser.add_argument("--no_strict", dest="strict", action="store_false")
    parser.add_argument("--warm_start", action="store_true",
                        help="carry L-BFGS curvature memory across epochs "
                             "(continuation mode; same final loss, ~4x "
                             "faster — NOT the reference's per-epoch-"
                             "restart accounting, so off by default)")
    parser.add_argument("--warmup", type=int, default=1)
    args = parser.parse_args()

    import jax

    # Persistent compilation cache: the fused 100-epoch program takes ~1 min
    # to compile cold; subsequent bench runs load it in seconds.
    jax.config.update("jax_compilation_cache_dir", "/tmp/ast_tpu_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp

    from audio_style_transfer_tpu.models import WaveNetAEConfig, init_params
    from audio_style_transfer_tpu.transfer import StyleTransfer, TransferSpec

    device = jax.devices()[0]

    params = init_params(jax.random.PRNGKey(0), WaveNetAEConfig())
    spec = TransferSpec(
        stack=args.stack,
        batch_size=args.batch_size,
        epochs=args.epochs,
        maxiter=args.maxiter,
        lambd=100.0,
        gamma=0.0,
        early_stop_evals=0,  # run the full budget: benchmark fixed work
        compute_dtype=args.precision,
        fused_encoder=args.fused,
        chain_encoder=args.chain,
        warm_start=args.warm_start,
        write_artifacts=False,
    )
    import dataclasses as _dc

    try:
        engine = StyleTransfer(spec, params)
    except Exception as e:
        import sys

        if args.strict and spec.fused_encoder:
            raise RuntimeError(
                "fused-encoder setup failed under --strict (pass "
                "--no_strict to benchmark the XLA fallback)"
            ) from e
        print(f"WARNING: fused-encoder setup failed ({e!r}); "
              "falling back to XLA convs", file=sys.stderr)
        spec = _dc.replace(spec, fused_encoder=False)
        engine = StyleTransfer(spec, params)

    content = synth_audio(2.0, kind="content")
    style = synth_audio(2.0, kind="style")

    phi_c = engine.get_embeds(content[: args.batch_size])
    phi_t = engine.get_style_phi(style)
    phi_s = engine.get_style_phi(content)
    phi = engine.get_embeds(content[: args.batch_size], is_content=False)
    from audio_style_transfer_tpu.transfer.grams import l2_normalize

    phi = np.asarray(l2_normalize(jnp.asarray(phi + phi_t - phi_s), axes=(1, 2)))
    # Keep the ~9 MB of targets resident on device so the timed region
    # measures the chip, not the host<->device link.
    phi_c, phi = jax.device_put(phi_c), jax.device_put(phi)
    jax.block_until_ready((phi_c, phi))

    # Warmup: compile the exact measured program (epochs is a static arg of
    # the fused epoch loop, so warming up with a different count would leave
    # compilation inside the timed region). If the Pallas path fails to
    # compile in this environment, fall back to the XLA composition.
    if args.warmup:
        try:
            engine.optimize(phi_c, phi, epochs=args.epochs)
        except Exception as e:
            import sys

            if args.strict and spec.fused_encoder:
                raise RuntimeError(
                    "fused-encoder compile failed under --strict (pass "
                    "--no_strict to benchmark the XLA fallback)"
                ) from e
            print(f"WARNING: fused-encoder compile failed ({e!r}); "
                  "falling back to XLA convs", file=sys.stderr)
            spec = _dc.replace(spec, fused_encoder=False)
            engine = StyleTransfer(spec, params)
            engine.optimize(phi_c, phi, epochs=args.epochs)

    # Min-of-5 for the headline metric: the program and inputs are
    # deterministic (identical evals and losses each run), so min wall
    # isolates the chip from ambient link-latency spikes (measured
    # hours-scale drift of 10-15% on the tunneled runtime; back-to-back
    # calm runs repeat within ~0.3%). Each run is ~2 s, so two extra reps
    # are cheap; secondary configs stay at min-of-3. All wall times are
    # recorded (advisor r3: min alone hides the spread and inflates
    # comparability with earlier single-shot rounds).
    walls = []
    for _ in range(5):
        t0 = time.time()
        result = engine.optimize(phi_c, phi, epochs=args.epochs)
        walls.append(time.time() - t0)
    wallclock = min(walls)

    total_iters = int(np.sum(result["evals"]))  # L-BFGS function evaluations
    iters_per_sec = total_iters / wallclock
    north_star_seconds = 10.0

    out = {
        "metric": "style-transfer iters/sec on 16384-sample clip",
        "value": round(iters_per_sec, 2),
        "unit": "iters/sec",
        "vs_baseline": round(north_star_seconds / wallclock, 3),
        "wallclock_to_100_epochs_s": round(wallclock, 3),
        "wallclock_runs_s": [round(w, 3) for w in walls],
        "wallclock_median_s": round(sorted(walls)[len(walls) // 2], 3),
        "epochs_done": int(result["epochs_done"]),
        "total_lbfgs_evals": total_iters,
        "final_loss": float(result["metrics"][-1, 0]),
        "precision": args.precision,
        "fused_encoder": spec.fused_encoder,
        "chain_encoder": bool(
            spec.fused_encoder
            if spec.chain_encoder is None
            else spec.chain_encoder
        ),
        "device": str(device),
    }

    if args.suite:
        out["suite"] = run_suite(params, args, content, style)
    if args.longform:
        # Under --no_strict a longform failure is reported in the JSON
        # instead of costing the whole benchmark record; the default
        # --strict re-raises so a regression fails loudly (same policy as
        # the Pallas-compile guard).
        ns_per_eval_ms = 1e3 * wallclock / max(total_iters, 1)
        try:
            out["longform"] = run_longform(params, args, ns_per_eval_ms)
        except Exception as e:  # pragma: no cover - defensive
            if args.strict:
                raise
            out["longform"] = {"error": repr(e)}
    if args.synthesis:
        out["synthesis"] = run_synthesis(params)
    if args.train_step:
        out["train_step"] = run_train_step(params)

    print(json.dumps(out))


def run_longform(params, args, ns_per_eval_ms: float = 1.188):
    """BASELINE config 5 (single-chip flavour): 60 s of audio, chunked into
    16384-sample windows, OT-transformed style target, windows optimized in
    groups of 8. On a v5e-8 the groups shard over the mesh (pass mesh= to
    transfer_longform); here the same program runs them sequentially."""
    from audio_style_transfer_tpu.transfer import StyleTransfer, TransferSpec
    from audio_style_transfer_tpu.transfer.longform import transfer_longform

    spec = TransferSpec(
        stack=0, batch_size=args.batch_size, epochs=min(args.epochs, 20),
        maxiter=args.maxiter, early_stop_evals=0,
        compute_dtype=args.precision,
        # Single-chip longform now runs windows SEQUENTIALLY through the
        # fully-fused single-clip program (optimize_batch mesh=None), so
        # the Pallas encoder pays exactly as in the north-star config.
        fused_encoder=args.fused,
        chain_encoder=args.chain,
        write_artifacts=False,
    )
    try:
        engine = StyleTransfer(spec, params)
    except Exception as e:
        import dataclasses as _dc
        import sys

        if args.strict and spec.fused_encoder:
            raise RuntimeError(
                "fused-encoder setup failed under --strict (pass "
                "--no_strict to benchmark the XLA fallback)"
            ) from e
        print(f"WARNING: fused-encoder setup failed ({e!r}); longform "
              "falling back to XLA convs", file=sys.stderr)
        spec = _dc.replace(spec, fused_encoder=False)
        engine = StyleTransfer(spec, params)
    content = synth_audio(60.0, kind="content")
    style = synth_audio(4.0, kind="style")

    def timed_run(eng):
        # Min-of-3 like the north star (deterministic program; the min
        # isolates the chip from ambient tunnel-latency draws, which
        # round-3 measured at 10-15% — larger than the margins being
        # judged). First call additionally warms the compile caches.
        walls = []
        for _ in range(3):
            t0 = time.time()
            res = transfer_longform(eng, content, style, epochs=spec.epochs,
                                    ot_components=8)
            walls.append(time.time() - t0)
        dt = min(walls)
        evals = int(np.sum(res.per_window["evals"]))
        return {
            "wallclock_s": round(dt, 1),
            "wallclock_runs_s": [round(w, 1) for w in walls],
            "windows": int(res.per_window["evals"].shape[0]),
            "epochs": spec.epochs,
            "evals": evals,
            "iters_per_sec": round(evals / dt, 2),
            "audio_seconds": round(len(res.audio) / 16000.0, 1),
        }

    # Fixed-work flavour (early stop off, comparable across rounds) ...
    out = timed_run(engine)
    # ... plus the reference's own accounting: every window stops once an
    # epoch converges in < 50 evals (methods.py:180-181) — what a user of
    # the reference CLI actually pays for a 60-s clip.
    import dataclasses as _dc

    eng_ref = StyleTransfer(_dc.replace(spec, early_stop_evals=50), params)
    out["reference_accounting"] = timed_run(eng_ref)

    # EXACT flavour: ONE global window over the whole clip (the joint
    # objective the reference's chunk averaging approximates,
    # methods.py:97-111), single-window trunk pass (parallel/halo.py).
    # Cold call = embeds + epoch compile + 1 epoch; warm = min-of-2
    # (runs are ~45 s each — min-of-3 would cost more than it guards).
    from audio_style_transfer_tpu.transfer.longform import transfer_exact

    t0 = time.time()
    transfer_exact(engine, content, style, mesh=None, epochs=1)
    cold = time.time() - t0
    walls = []
    for _ in range(2):
        t0 = time.time()
        res = transfer_exact(engine, content, style, mesh=None,
                             epochs=spec.epochs)
        walls.append(time.time() - t0)
    dt = min(walls)
    evals = int(np.sum(res.per_window["evals"]))
    # The length the program OPTIMIZED (scan mode pads t_valid up to whole
    # scan windows) — the right divisor for per-eval/linear-scaling rows.
    # res.audio is trimmed back to the valid length for output.
    t_total = int(res.per_window.get("t_optimized", res.audio.shape[0]))
    out["exact"] = {
        "t_total": t_total,
        "t_out": int(res.audio.shape[0]),
        "cold_s_inc_compile_1ep": round(cold, 1),
        "wallclock_s": round(dt, 1),
        "wallclock_runs_s": [round(w, 1) for w in walls],
        "epochs": int(res.per_window["epochs_done"]),
        "evals": evals,
        "ms_per_eval": round(1e3 * dt / max(evals, 1), 2),
        # Ratio of the exact global-window per-eval cost to LINEAR scaling
        # of the north star's per-eval wall at T=16384 (the <=1.5x target
        # of BENCH_NOTES "Round 4: exact long-form mode").
        "vs_linear_16384": round(
            (1e3 * dt / max(evals, 1))
            / (ns_per_eval_ms * t_total / args.batch_size), 2),
    }

    # 15-s exact scaling point (BENCH_NOTES round-4 table row, previously
    # notes-only — VERDICT r4 weak #5): same joint objective at mid T.
    content15 = synth_audio(15.0, kind="content")
    transfer_exact(engine, content15, style, mesh=None, epochs=1)  # warm
    walls = []
    for _ in range(2):
        t0 = time.time()
        res15 = transfer_exact(engine, content15, style, mesh=None,
                               epochs=min(spec.epochs, 5))
        walls.append(time.time() - t0)
    dt15 = min(walls)
    evals15 = int(np.sum(res15.per_window["evals"]))
    t15 = int(res15.per_window.get("t_optimized", res15.audio.shape[0]))
    out["exact_15s"] = {
        "t_total": t15,
        "t_out": int(res15.audio.shape[0]),
        "wallclock_s": round(dt15, 1),
        "wallclock_runs_s": [round(w, 1) for w in walls],
        "epochs": int(res15.per_window["epochs_done"]),
        "evals": evals15,
        "ms_per_eval": round(1e3 * dt15 / max(evals15, 1), 2),
        "vs_linear_16384": round(
            (1e3 * dt15 / max(evals15, 1))
            / (ns_per_eval_ms * t15 / args.batch_size), 2),
    }
    return out


def run_synthesis(params):
    """Autoregressive synthesis: us/sample at batch 1 for f32/bf16/int8
    decoder weights (reference hot loop fastgen.py:196-211 pays one
    host<->device round trip PER SAMPLE; ours is one lax.scan)."""
    import jax.numpy as jnp

    from audio_style_transfer_tpu.generate.fastgen import synthesize

    enc = np.random.RandomState(0).randn(1, 16, 16).astype(np.float32) * 0.3
    n = enc.shape[1] * 512  # samples per run (hop 512)
    out = {}
    for label, kw in [("f32", {}), ("bf16", {"dtype": jnp.bfloat16}),
                      ("int8", {"quantize": "int8"})]:
        synthesize(enc, params=params, **kw)  # warm/compile
        walls = []
        for _ in range(3):
            t0 = time.time()
            synthesize(enc, params=params, **kw)
            walls.append(time.time() - t0)
        out[label] = {
            "us_per_sample": round(min(walls) / n * 1e6, 1),
            "s_per_audio_second": round(min(walls) / n * 16000, 2),
        }
    out["samples"] = n
    return out


def run_train_step(params):
    """Reference-geometry training step (total batch 32, length 6144,
    reference nsynth/wavenet/train.py:121-132): ms/step amortized over an
    8-step scanned call, plus XLA's model-FLOP estimate for an MFU row.
    bf16 compute + remat, the configuration of the README's one-chip
    claim (the f32 step needs ~21 GB HBM and does not fit a 16 GB v5e)."""
    import jax
    import jax.numpy as jnp

    from audio_style_transfer_tpu.models import WaveNetAEConfig
    from audio_style_transfer_tpu.train.trainer import TrainConfig, Trainer

    k = 8
    trainer = Trainer(
        TrainConfig(steps_per_call=k, logdir="/tmp/ast_bench_train"),
        WaveNetAEConfig(compute_dtype=jnp.bfloat16),
    )
    state = trainer.init_state(params)
    wavs = np.random.RandomState(0).uniform(
        -0.9, 0.9, (k, 32, 6144)).astype(np.float32)
    state, _ = trainer.run_steps(state, wavs)  # compile
    jax.block_until_ready(state)
    walls = []
    for _ in range(3):
        t0 = time.time()
        state, losses = trainer.run_steps(state, wavs)
        jax.block_until_ready((state, losses))
        walls.append(time.time() - t0)
    ms_per_step = min(walls) / k * 1e3
    rec = {"ms_per_step": round(ms_per_step, 1),
           "wallclock_runs_s": [round(w, 3) for w in walls],
           "steps_per_call": k}
    try:  # XLA cost model: model FLOPs -> achieved FLOP/s.  Analyzed on
        # the SINGLE-step program — the scanned body's flop count is
        # reported once per program regardless of trip count, so dividing
        # the k-step program's count by k would be wrong.  One extra
        # compile, persistent-cache-amortized.
        cost = (
            trainer._step_fn
            .lower(state, jax.numpy.asarray(wavs[0]))
            .compile()
            .cost_analysis()
        )
        flops_per_step = float(cost["flops"])
        rec["model_tflops_per_s"] = round(
            flops_per_step / (ms_per_step / 1e3) / 1e12, 1)
        rec["model_gflops_per_step"] = round(flops_per_step / 1e9, 1)
        # Per-device bf16 peak by TPU generation; "model" counts remat
        # recompute the way XLA emitted it, so this is hardware
        # utilization, not 6ND MFU.  The assumed peak is recorded so the
        # ratio is auditable (and honest on non-v5e devices).
        kind = jax.devices()[0].device_kind.lower()
        peaks = {"v5 lite": 197e12, "v5e": 197e12, "v4": 275e12,
                 "v5p": 459e12, "v6 lite": 918e12, "v6e": 918e12}
        peak = next((v for k_, v in peaks.items() if k_ in kind), 197e12)
        rec["assumed_peak_tflops"] = round(peak / 1e12)
        rec["mxu_utilization_pct"] = round(
            flops_per_step / (ms_per_step / 1e3) / peak * 100, 1)
    except Exception:  # cost model unavailable on some runtimes
        pass
    return rec


def run_suite(params, args, content, style):
    """Secondary BASELINE.json configs: gatys mode, full-stack deep content,
    batched 8-clip transfer. Each entry reports wall-clock after warmup."""
    import dataclasses as _dc

    import jax.numpy as jnp

    from audio_style_transfer_tpu.transfer import StyleTransfer, TransferSpec
    from audio_style_transfer_tpu.transfer.grams import l2_normalize

    results = {}

    def timed(engine, phi_c, phi, epochs, batched=False):
        import jax

        fn = engine.optimize_batch if batched else engine.optimize
        # Upload the targets once, outside the timed region: re-shipping a
        # 67 MB phi batch through the remote-tunnel runtime every call
        # costs ~1 s and measures the sandbox link, not the chip.
        phi_c, phi = jax.device_put(phi_c), jax.device_put(phi)
        jax.block_until_ready((phi_c, phi))
        fn(phi_c, phi, epochs=epochs)  # warmup/compile
        # Min-of-3 (deterministic program): one ambient-latency draw must
        # not decide a config's recorded number.
        walls = []
        for _ in range(3):
            t0 = time.time()
            r = fn(phi_c, phi, epochs=epochs)
            walls.append(time.time() - t0)
        dt = min(walls)
        evals = int(np.sum(r["evals"]))
        return {"wallclock_s": round(dt, 3),
                "wallclock_runs_s": [round(w, 3) for w in walls],
                "evals": evals,
                "iters_per_sec": round(evals / dt, 2)}

    base = dict(
        batch_size=args.batch_size, epochs=args.epochs, maxiter=args.maxiter,
        early_stop_evals=0, compute_dtype=args.precision,
        fused_encoder=args.fused, chain_encoder=args.chain,
        write_artifacts=False,
    )

    def targets(engine, gatys=False):
        phi_c = engine.get_embeds(content[: args.batch_size])
        phi_t = engine.get_style_phi(style)
        phi_s = engine.get_style_phi(content)
        phi = engine.get_embeds(content[: args.batch_size], is_content=False)
        phi = np.asarray(l2_normalize(jnp.asarray(phi + phi_t - phi_s), axes=(1, 2)))
        return phi_c, phi

    # config 2: Gatys mode
    eng = StyleTransfer(TransferSpec(stack=0, gatys=True, **base), params)
    results["gatys"] = timed(eng, *targets(eng), epochs=args.epochs)

    # config 3: full stack + deep content layer (--cont_lyrs 25)
    eng = StyleTransfer(
        TransferSpec(stack=None, cont_lyr_ids=(25,), **base), params
    )
    results["full_stack_cont25"] = timed(eng, *targets(eng), epochs=args.epochs)

    # config 4: 8 clips vmapped on one chip
    eng = StyleTransfer(TransferSpec(stack=0, **base), params)
    pc, ph = targets(eng)
    phi_c8 = np.stack([pc] * 8)
    phi8 = np.stack([ph] * 8)
    r = timed(eng, phi_c8, phi8, epochs=min(args.epochs, 20), batched=True)
    r["clips"] = 8
    results["batched_8clips_20ep"] = r
    return results


if __name__ == "__main__":
    main()
