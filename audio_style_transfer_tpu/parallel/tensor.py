"""Tensor-parallel WaveNet decoder: width-axis sharding over a mesh.

SURVEY.md §2d lists tensor parallelism as absent from the reference (its
only distribution story is parameter-server data parallelism,
nsynth/wavenet/train.py:71-132) with the optional TPU-native plan "shard
the 512-wide decoder channels across a mesh axis".  This module implements
that plan, Megatron-style:

  * the gated dilated conv (512 -> 2*512, reference model.py:136-181) is
    **column-parallel**: each device holds 2*width/n output channels,
    re-ordered so every shard owns matching (sigmoid, tanh) pairs and the
    gate multiply needs no communication;
  * the conditioning projection (cond_map_i) is sharded identically, so
    the `condition` add stays local;
  * the residual and skip 1x1 projections are fused into one
    **row-parallel** matmul (their input axis is the gated width, already
    sharded) whose partial products are combined by a single ``psum`` per
    layer — the layer's only collective;
  * the thin trunk (startconv, skip_start, out1, logits — all at most
    width/skip_width wide on both sides) is replicated: sharding it would
    trade trivial FLOPs for more collectives.

Per layer each device computes 1/n of the 512->1024 and 512->768 matmuls
(= 1/n of the decoder FLOPs, which dominate training: the encoder is 16x
cheaper) and contributes one [B, T, width+skip] psum over ICI.

Use cases: model-parallel *training* and teacher-forced evaluation — e.g.
combined with data parallelism on a 2-D mesh when per-chip HBM cannot hold
the batch even with rematerialization.  Batch-1 autoregressive synthesis
is NOT a TP customer: its per-sample step is weight-streaming bound
(BENCH_NOTES.md) and 30 latency-bound psums per generated sample would
cost more than the streaming they save; scale synthesis by batching clips
across devices instead.

Numerics are exactly the single-device decoder's up to f32 reduction
order: tests/test_tensor_parallel.py asserts logits, NLL, and parameter
gradients match jax.grad through ``decode_logits`` on a virtual 8-device
CPU mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from audio_style_transfer_tpu.models.wavenet_ae import Params, WaveNetAEConfig
from audio_style_transfer_tpu.ops import condition, conv1d, shift_right


def _interleave_gate_halves(w, b, width: int, n: int):
    """Reorder [..., 2*width] outputs so a contiguous 1/n chunk holds the
    (sigmoid, tanh) pair for its width/n channels."""
    m = width // n
    sig, tnh = w[..., :width], w[..., width:]
    w2 = jnp.concatenate(
        [
            jnp.concatenate(
                [sig[..., k * m : (k + 1) * m], tnh[..., k * m : (k + 1) * m]],
                axis=-1,
            )
            for k in range(n)
        ],
        axis=-1,
    )
    bs, bt = b[:width], b[width:]
    b2 = jnp.concatenate(
        [
            jnp.concatenate([bs[k * m : (k + 1) * m], bt[k * m : (k + 1) * m]])
            for k in range(n)
        ]
    )
    return w2, b2


def tp_prepare_decoder_params(
    params: Params, n: int, cfg: WaveNetAEConfig
) -> Params:
    """Decoder params re-laid-out for n-way tensor parallelism.

    Differentiable (pure gather/concat), so ``jax.grad`` through a
    TP loss lands on the ORIGINAL parameter pytree — the trainer never
    needs to know about the TP layout.
    """
    gate_names = {
        name
        for i in range(1, cfg.num_layers + 1)
        for name in (f"dilatedconv_{i}", f"cond_map_{i}")
    }
    fused_away = {
        name
        for i in range(1, cfg.num_layers + 1)
        for name in (f"res_{i}", f"skip_{i}")
    }
    out: Params = {}
    for name, entry in params.items():
        if name in gate_names:
            w, b = _interleave_gate_halves(
                entry["w"], entry["b"], cfg.width, n
            )
            out[name] = {"w": w, "b": b}
        elif name in fused_away:
            continue  # fused below
        else:
            out[name] = entry
    for i in range(1, cfg.num_layers + 1):
        res, skip = params[f"res_{i}"], params[f"skip_{i}"]
        out[f"res_skip_{i}"] = {
            "w": jnp.concatenate([res["w"], skip["w"]], axis=-1),
            "b": jnp.concatenate([res["b"], skip["b"]]),
        }
    return out


def _tp_param_specs(prepared: Params, axis: str):
    """PartitionSpec pytree: column-parallel gate/cond shards, row-parallel
    fused res+skip shards, everything else replicated."""
    specs = {}
    for name in prepared:
        if name.startswith(("dilatedconv_", "cond_map_")) and not name.endswith(
            "out1"
        ):
            specs[name] = {"w": P(None, None, axis), "b": P(axis)}
        elif name.startswith("res_skip_"):
            # bias replicated: added once after the psum
            specs[name] = {"w": P(None, axis, None), "b": P()}
        else:
            specs[name] = {k: P() for k in prepared[name]}
    return specs


def tp_decode_logits(
    params: Params,
    x_quantized,
    encoding,
    cfg: WaveNetAEConfig,
    mesh: Mesh,
    axis_name: str = "model",
):
    """Teacher-forced decoder logits with the width axis sharded over
    ``mesh[axis_name]``. Drop-in equal to models.decode_logits.

    Accepts the ORIGINAL params pytree; the TP re-layout happens inside
    the traced function (XLA folds it into the weight feed).
    """
    n = mesh.shape[axis_name]
    assert cfg.width % n == 0, (
        f"decoder width {cfg.width} must divide the {n}-way '{axis_name}' axis"
    )
    dtype = cfg.compute_dtype
    prepared = tp_prepare_decoder_params(params, n, cfg)
    prepared = jax.tree.map(lambda v: v.astype(dtype), prepared)
    specs = _tp_param_specs(prepared, axis_name)

    x_scaled = (x_quantized.astype(jnp.float32) / 128.0).astype(dtype)[..., None]
    encoding = encoding.astype(dtype)

    def local_fn(p, x_scaled, encoding):
        l = shift_right(x_scaled)
        l = conv1d(l, p["startconv"]["w"], p["startconv"]["b"], causal=True)
        s = conv1d(l, p["skip_start"]["w"], p["skip_start"]["b"])

        for i in range(1, cfg.num_layers + 1):
            def block(l, s, p_dil, p_cond, p_rs, encoding, *, i=i):
                d = conv1d(l, p_dil["w"], p_dil["b"],
                           dilation=cfg.dilation(i - 1), causal=True)
                cond = conv1d(encoding, p_cond["w"], p_cond["b"])
                d = condition(d, cond)
                m = d.shape[2] // 2
                d = jax.nn.sigmoid(d[:, :, :m]) * jnp.tanh(d[:, :, m:])
                rs = conv1d(d, p_rs["w"])  # partial products, no bias
                rs = jax.lax.psum(rs, axis_name) + p_rs["b"].astype(rs.dtype)
                return l + rs[:, :, : cfg.width], s + rs[:, :, cfg.width :]

            if cfg.remat:
                block = jax.checkpoint(block)
            l, s = block(
                l, s, p[f"dilatedconv_{i}"], p[f"cond_map_{i}"],
                p[f"res_skip_{i}"], encoding,
            )

        s = jax.nn.relu(s)
        s = conv1d(s, p["out1"]["w"], p["out1"]["b"])
        s = condition(
            s, conv1d(encoding, p["cond_map_out1"]["w"], p["cond_map_out1"]["b"])
        )
        s = jax.nn.relu(s)
        return conv1d(s, p["logits"]["w"], p["logits"]["b"]).astype(jnp.float32)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(specs, P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(prepared, x_scaled, encoding)
