"""Transfer loss: content MSE + style-gram MSE + STFT L1 regularizer.

Mirrors reference methods.py:113-131:
  content = mean((F(x) - phi_c)^2) * 10
  style   = mean((G(x) - phi_s)^2) * 1e3
  reg     = mean(|Re STFT(inv_mu_law(x))| + |Im STFT|)   (frame 1024/512)
  loss    = content + lambd * style + gamma * reg

The whole thing is one differentiable function of the waveform variable in
mu-law quantized space, so the L-BFGS step jits into a single XLA program.
Note the reference builds the (width-512, unused) decoder into the transfer
graph but TF never executes it for this loss; we simply never build it —
the encoder-only graph is the honest equivalent of the hot path.
"""

from __future__ import annotations

import dataclasses
import jax.numpy as jnp

from audio_style_transfer_tpu.models.wavenet_ae import (
    WaveNetAEConfig,
    encoder_extracts,
)
from audio_style_transfer_tpu.signal.mu_law import inv_mu_law
from audio_style_transfer_tpu.signal.stft import stft_l1
from audio_style_transfer_tpu.transfer.grams import (
    content_embeds,
    style_gram,
)


@dataclasses.dataclass(frozen=True)
class LossSpec:
    cont_lyr_ids: tuple = (29,)
    style_layer_ids: tuple = tuple(range(30))
    cnt_channels: int = 128
    nb_channels: int = 128
    gatys: bool = False
    lambd: float = 100.0
    gamma: float = 0.0
    # Run the channel-wise gram through the Pallas all-pairs kernel
    # (ops/pallas_gram.py). Independent of the fused *encoder* flag: the
    # batched transfer path keeps XLA convs but still benefits from the
    # single-read gram (see engine.py).
    fused_gram: bool = False


def transfer_embeds(params, x_quantized, cfg: WaveNetAEConfig, spec: LossSpec):
    """(content embed, style gram) of a [1, T] quantized waveform —
    the equivalent of evaluating the reference's ``embeds_c``/``embeds_s``
    tensors (methods.py:58-76)."""
    needed = tuple(sorted(set(spec.cont_lyr_ids) | set(spec.style_layer_ids)))
    extracts, _ = encoder_extracts(params, x_quantized, cfg, needed_taps=needed)
    c = content_embeds(extracts, spec.cont_lyr_ids, spec.cnt_channels)
    s = style_gram(
        extracts,
        spec.style_layer_ids,
        gatys=spec.gatys,
        nb_channels=spec.nb_channels,
        fused=spec.fused_gram,
    )
    return c.astype(jnp.float32), s.astype(jnp.float32)


def transfer_loss(params, x_quantized, phi_c, phi_s, cfg: WaveNetAEConfig, spec: LossSpec):
    """Scalar loss + components dict for a [1, T] quantized waveform."""
    c, s = transfer_embeds(params, x_quantized, cfg, spec)
    content_loss = jnp.mean(jnp.square(c - phi_c)) * 10.0
    style_loss = jnp.mean(jnp.square(s - phi_s)) * 1e3
    if spec.gamma != 0.0:
        a = inv_mu_law(x_quantized[0])
        regularizer = stft_l1(a, frame_length=1024, frame_step=512)
    else:
        # gamma is the CLI default 0.0 (methods.py:257) in most runs; skip
        # building the STFT + its backward pass entirely in that case.
        regularizer = jnp.asarray(0.0, jnp.float32)
    loss = content_loss + spec.lambd * style_loss + spec.gamma * regularizer
    return loss, {
        "loss": loss,
        "content_loss": content_loss,
        "style_loss": style_loss,
        "regularizer": regularizer,
    }
