"""Feature embeddings and Gram statistics for style transfer.

Two gram flavours (reference README.md:28-29, methods.py:62-76):

* "ours" — channel-wise grams: stack the selected encoder taps into
  [L, T, C], transpose to [C, L, T] and form per-channel layer x layer
  grams [C, L, L] (methods.py:69,73);
* Gatys — classic per-layer channel x channel grams [L, C, C]
  (methods.py:71,73).

Both are l2-normalized over their trailing two axes (methods.py:74).
The content embedding concatenates selected taps along channels and drops
the batch dim (methods.py:58).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def l2_normalize(x, axes=(1, 2), eps: float = 1e-12):
    """tf.nn.l2_normalize semantics: x / sqrt(max(sum(x^2), eps))."""
    sq = jnp.sum(jnp.square(x), axis=axes, keepdims=True)
    return x * jnp.reciprocal(jnp.sqrt(jnp.maximum(sq, eps)))


def select_style_layers(
    num_layers: int = 30,
    stack: int | None = None,
    style_lyr_ids: Sequence[int] | None = None,
) -> list[int]:
    """Layer-id selection logic of reference methods.py:60-66."""
    if style_lyr_ids is not None:
        assert isinstance(style_lyr_ids, (tuple, list)), (
            "style_lyr_ids must be of type tuple or list!"
        )
        return list(style_lyr_ids)
    if stack is not None:
        return list(range(stack * 10, stack * 10 + 10))
    return list(range(num_layers))


def content_embeds(extracts, cont_lyr_ids: Sequence[int], cnt_channels: int = 128):
    """[T, cnt_channels * len(ids)] content feature (methods.py:58)."""
    return jnp.concatenate(
        [extracts[i][:, :, :cnt_channels] for i in cont_lyr_ids], axis=2
    )[0]


def style_gram(
    extracts,
    layer_ids: Sequence[int],
    *,
    gatys: bool = False,
    nb_channels: int = 128,
    fused: bool = False,
):
    """Normalized Gram tensor over the selected taps (methods.py:62-76).

    Returns [C, L, L] for "ours" (channel-wise) or [L, C, C] for Gatys.
    Assumes batch size 1 (taps are [1, T, C]), exactly like the reference's
    axis-0 concat.

    With ``fused=True`` the channel-wise flavour runs the Pallas all-pairs
    kernel (ops/pallas_gram.py): every tap is read from HBM once per
    evaluation instead of once per pair — the L^2 pair traffic dominates
    the full-stack transfer eval otherwise (TPU only; same f32-product
    semantics).
    """
    if gatys:
        stl = jnp.concatenate([extracts[i] for i in layer_ids], axis=0)
        stl = jnp.transpose(stl, (0, 2, 1))  # [L, C, T]
        gram = jnp.matmul(
            stl, jnp.transpose(stl, (0, 2, 1)),
            preferred_element_type=jnp.float32,
        ).astype(stl.dtype)
        return l2_normalize(gram, axes=(1, 2))

    if fused and extracts[layer_ids[0]].shape[1] % 128 == 0:
        from audio_style_transfer_tpu.ops.pallas_gram import pair_gram

        g = pair_gram(*[extracts[i] for i in layer_ids])  # [1, L, L, C] f32
        gram = jnp.transpose(g[0], (2, 0, 1))  # [C, L, L] f32
        dtype = extracts[layer_ids[0]].dtype
    else:
        # "ours" channel-wise gram, computed pairwise: G[c,i,j] = sum_t
        # E_i[t,c]·E_j[t,c] as elementwise products + column sums instead of
        # a batched matmul on a [C, L, T] transpose. The taps then stay in
        # their native [T, C] layout end to end — on TPU the transpose form
        # forced XLA to materialize ~40 MB layout copies around the Pallas
        # encoder's custom-calls, ~0.75 ms/eval of the transfer hot path
        # (round-2 profile). bf16 taps are multiplied in f32 (exact: 8-bit
        # mantissa products fit f32), matching the MXU's accumulation
        # semantics.
        taps = [extracts[i][0] for i in layer_ids]  # each [T, C]
        n = len(taps)
        pair = {}
        for i in range(n):
            for j in range(i, n):
                p = taps[i].astype(jnp.float32) * taps[j].astype(jnp.float32)
                pair[(i, j)] = jnp.sum(p, axis=0)  # [C]
        rows = [
            jnp.stack([pair[(min(i, j), max(i, j))] for j in range(n)], axis=0)
            for i in range(n)
        ]
        gram = jnp.transpose(jnp.stack(rows, axis=0), (2, 0, 1))  # [C, L, L]
        dtype = taps[0].dtype
    gram = l2_normalize(gram.astype(dtype), axes=(1, 2))
    if nb_channels < gram.shape[0]:
        gram = gram[:nb_channels]
    return gram
