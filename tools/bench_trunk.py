"""Microbenchmark: chained-trunk kernels alone (ops/pallas_chain.py).

Times the fused encoder trunk forward and forward+backward at the
north-star geometry (stack 0: 30 layers, dils 2^(i%10), T=16384, C=128,
bf16, emits {0..9, 29} — reference model.py:96-116 cost driver) so kernel
passes can be A/B'd without the full transfer program around them.

    python tools/bench_trunk.py [--t 16384] [--dtype bfloat16] [--iters 50]

Prints fwd and fwd+bwd wall us/eval (min over --reps timing loops) plus
the inferred bwd share.  Env knobs under test (AST_CHAIN_*) are read by
ops/pallas_chain at import, so set them on the command line.
"""

from __future__ import annotations

import argparse
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--t", type=int, default=16384)
    p.add_argument("--c", type=int, default=128)
    p.add_argument("--layers", type=int, default=30)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--iters", type=int, default=50,
                   help="evals per timing loop (chained with a data "
                   "dependency so the loop can't parallelize)")
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from audio_style_transfer_tpu.ops.pallas_chain import fused_trunk

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    dils = tuple(2 ** (i % 10) for i in range(args.layers))
    emit = tuple(range(10)) + (args.layers - 1,)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (args.t, args.c), dtype)
    # Weights in the compute dtype, as the engine stacks them
    # (models/wavenet_ae.py _chain_trunk_extracts).
    wd = (jax.random.normal(ks[1], (args.layers, 3, args.c, args.c),
                            jnp.float32) * 0.08).astype(dtype)
    bd = (jax.random.normal(ks[2], (args.layers, args.c), jnp.float32)
          * 0.01).astype(dtype)
    wr = (jax.random.normal(ks[3], (args.layers, args.c, args.c),
                            jnp.float32) * 0.08).astype(dtype)
    br = (jax.random.normal(ks[4], (args.layers, args.c), jnp.float32)
          * 0.01).astype(dtype)

    def loss(z):
        taps = fused_trunk(z, wd, bd, wr, br, dils, emit)
        return sum(jnp.sum(t.astype(jnp.float32) ** 2) for t in taps)

    # Chained iterations: each eval's input depends on the previous
    # eval's scalar so XLA cannot overlap the evals.
    @jax.jit
    def fwd_loop(z):
        def body(i, carry):
            z, acc = carry
            v = loss(z)
            return z + (v * 0).astype(z.dtype), acc + v
        return jax.lax.fori_loop(0, args.iters, body, (z, 0.0))[1]

    g = jax.grad(loss)

    @jax.jit
    def fwdbwd_loop(z):
        def body(i, carry):
            z, acc = carry
            dz = g(z)
            return z + dz * 0, acc + jnp.sum(dz.astype(jnp.float32) ** 2)
        return jax.lax.fori_loop(0, args.iters, body, (z, 0.0))[1]

    def run(fn):
        fn(x).block_until_ready()  # compile
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn(x).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best / args.iters * 1e6

    fwd = run(fwd_loop)
    fb = run(fwdbwd_loop)
    print(f"device={jax.devices()[0]} t={args.t} dtype={args.dtype} "
          f"layers={args.layers} iters={args.iters}")
    print(f"fwd          {fwd:8.1f} us/eval")
    print(f"fwd+bwd      {fb:8.1f} us/eval")
    print(f"bwd (inferred) {fb - fwd:6.1f} us/eval")


if __name__ == "__main__":
    main()
