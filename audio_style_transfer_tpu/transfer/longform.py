"""Long-form (60 s+) style transfer via chunking or time sharding.

The reference handles long audio only by fixed-window chunking with gram
averaging on the host (reference methods.py:97-111 caps style statistics at
5 windows; output windows would be transferred one at a time).  This module
scales that story to a TPU slice two ways:

1. **Chunked mode** (reference semantics, embarrassingly parallel): split
   the waveform into batch_size windows, build per-window content targets
   and a shared (averaged, gram-translated) style target, and run the
   vmapped multi-clip optimizer — all windows advance in lockstep on one
   chip, or sharded over the mesh's data axis.

2. **Exact mode**: one giant window, time-sharded over the mesh with halo
   exchange (parallel/halo.py) — identical numerics to a single huge chip.

Optionally the style target is first mapped through the NMF + optimal
transport palette transform (reference utils.py:132-145), which is the
"OT loss" flavour of BASELINE.json config 5.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from audio_style_transfer_tpu.signal.mu_law import inv_mu_law_numpy
from audio_style_transfer_tpu.transfer.engine import StyleTransfer
from audio_style_transfer_tpu.transfer.grams import l2_normalize
from audio_style_transfer_tpu.transfer.losses import transfer_embeds


def chunk_audio(audio: np.ndarray, window: int) -> np.ndarray:
    """[T] -> [n_windows, window], dropping the trailing partial window."""
    n = len(audio) // window
    return audio[: n * window].reshape(n, window)


@dataclasses.dataclass
class LongformResult:
    audio: np.ndarray  # [total] stitched transferred waveform
    per_window: dict


def transfer_longform(
    engine: StyleTransfer,
    content_audio: np.ndarray,
    style_audio: np.ndarray,
    epochs: int | None = None,
    max_style_examples: int = 5,
    ot_components: int | None = None,
    crossfade: int = 256,
    mesh=None,
    windows_per_device: int = 8,
) -> LongformResult:
    """Chunked long-form transfer with the reference's gram-translation trick
    applied per window, optionally through the NMF+OT palette transform.

    Args:
      engine: a StyleTransfer built for the window size (spec.batch_size).
      content_audio / style_audio: [T] float waveforms (any length).
      ot_components: if set, transform the averaged *bottleneck features* of
        the style target through NMF + optimal transport before building the
        style grams (the reference's utils.transform pipeline).
      crossfade: samples of linear crossfade when stitching windows.
      mesh: optional 1-D jax Mesh — windows shard across its devices
        (the v5e-8 scale-out path; window count must divide device count).
      windows_per_device: (mesh only) windows optimized concurrently per
        chip. A 60-s clip is 58 windows; running all of them in one
        vmapped program exhausts a chip's HBM (each lane keeps 30 residual
        taps alive for the backward pass), so windows run in groups of
        windows_per_device * n_devices, padded to the mesh size by
        repeating the last window, then trimmed. Without a mesh the
        windows run sequentially through the fused single-clip program
        (faster than vmap on one chip — no lockstep) and this is unused.
    """
    spec = engine.spec
    window = spec.batch_size
    windows = chunk_audio(content_audio, window)
    k = windows.shape[0]

    # Shared style statistics (chunk-averaged, methods.py:97-111).
    phi_t = engine.get_style_phi(style_audio, max_examples=max_style_examples)
    phi_s = engine.get_style_phi(content_audio, max_examples=max_style_examples)

    if ot_components is not None:
        phi_t = _ot_transform_gram(engine, style_audio, content_audio,
                                   phi_t, ot_components)

    # Per-window content embeds + translated style targets, computed in ONE
    # jitted device program (lax.map over windows) with the results left on
    # device. The previous host loop made 2 dispatches per window and
    # shipped every [T, C] content embed device->host->device (~1 GB of
    # tunnel traffic for 58 windows; measured 27 s of a 182 s run).
    from audio_style_transfer_tpu.signal.mu_law import mu_law_numpy

    def _window_targets(params, wins_q, pt, ps):
        def one(xq):
            c, s = transfer_embeds(params, xq[None], engine.cfg,
                                   engine.loss_spec)
            return c, l2_normalize(s + pt - ps, axes=(1, 2))

        return jax.lax.map(one, wins_q)

    phi_cs, phis = jax.jit(_window_targets)(
        engine.params,
        jnp.asarray(mu_law_numpy(windows), jnp.float32),
        jnp.asarray(phi_t),
        jnp.asarray(phi_s),
    )

    if mesh is None:
        # Single chip: optimize_batch runs the windows sequentially through
        # the fused single-clip program (one compile, no lockstep, no HBM
        # pressure from concurrent lanes) — no grouping or padding needed.
        result = engine.optimize_batch(phi_cs, phis, epochs=epochs)
    else:
        n_dev = int(mesh.devices.size)
        group = max(windows_per_device * n_dev, n_dev)
        parts = []
        for s in range(0, k, group):
            pc, ph = phi_cs[s : s + group], phis[s : s + group]
            # Pad a trailing partial group to the FULL group size when
            # earlier groups exist: vmapped lanes run in lockstep, so the
            # padded lanes are free, and reusing the first group's program
            # shape avoids a second XLA/Mosaic compile. A lone short group
            # only pads to the mesh multiple (a smaller program is cheaper
            # than a padded one).
            pad_to = group if k > group else -(-len(pc) // n_dev) * n_dev
            pad = pad_to - len(pc)
            if pad:
                # jnp (not np) so the device-resident targets from
                # _window_targets stay on device — np.concatenate here
                # forced a device->host->device round trip per window
                # group, undoing the tunnel-traffic optimization above.
                pc = jnp.concatenate([pc, jnp.repeat(pc[-1:], pad, axis=0)])
                ph = jnp.concatenate([ph, jnp.repeat(ph[-1:], pad, axis=0)])
            r = engine.optimize_batch(pc, ph, epochs=epochs, mesh=mesh)
            if pad:
                r = {key: v[: len(v) - pad] for key, v in r.items()}
            parts.append(r)
        result = {
            key: np.concatenate([p[key] for p in parts]) for key in parts[0]
        }

    # Stitch windows with a short crossfade to hide seam discontinuities.
    outs = [inv_mu_law_numpy(result["x"][i, 0]) for i in range(k)]
    audio = _stitch(outs, crossfade)
    return LongformResult(audio=audio, per_window=result)


def _ot_transform_gram(engine, style_audio, content_audio, phi_t, n_components):
    """NMF + optimal-transport feature matching (reference utils.py:132-145).

    Factorizes the relu'd ``enc_`` features of one style and one content
    window into non-negative palettes, OT-matches the content palette to the
    style palette (reference optimal_transport.py:151-162), reconstructs the
    content features in the matched palette, and blends the reconstructed
    features' channel gram into the style target.  (In the reference,
    ``utils.transform`` is provided but never wired into the loss — here the
    OT-matched gram participates with a 0.5 blend so the capability is live.)
    """
    from audio_style_transfer_tpu.analysis.nmf import nmf, nmf_transform
    from audio_style_transfer_tpu.analysis.ot import compute_permutation
    from audio_style_transfer_tpu.models.wavenet_ae import encoder_extracts
    from audio_style_transfer_tpu.signal.mu_law import mu_law_numpy

    window = engine.spec.batch_size

    # One jitted program per encoder pass — running the 30-layer encoder
    # eagerly dispatches every op through the (remote) runtime one at a
    # time, measured ~35 s/pass on the tunnel vs milliseconds jitted.
    @jax.jit
    def _enc_feats(params, xq):
        extracts, _ = encoder_extracts(params, xq, engine.cfg)
        return jnp.maximum(extracts[-2][0].astype(jnp.float32), 0.0)

    def feats(aud):
        xq = jnp.asarray(mu_law_numpy(aud[None, :window]), jnp.float32)
        return np.asarray(_enc_feats(engine.params, xq))  # [T, C]

    fs = feats(style_audio)
    fc = feats(content_audio)
    _, hs = nmf(fs, n_components)  # style palette  [k, C]
    _, hc = nmf(fc, n_components)  # content palette [k, C]
    ws, wc = np.asarray(hs), np.asarray(hc)

    # Move the content palette toward the style palette and reconstruct the
    # content features in the matched basis.
    w_matched = compute_permutation(wc, ws)  # [k, C]
    h = np.asarray(nmf_transform(fc, wc))  # [T, k]
    f_matched = h @ w_matched  # [T, C]

    rec_err = np.linalg.norm(fc - h @ wc) / max(np.linalg.norm(fc), 1e-12)
    pal_dist = np.linalg.norm(wc - w_matched) / max(np.linalg.norm(wc), 1e-12)
    print(f"OT transform: nmf rec err {rec_err:.4f}, palette shift {pal_dist:.4f}")

    # Channel gram of the OT-matched features, shaped like phi_t's leading
    # channel axis, blended into the translated style statistics.
    g = f_matched.T @ f_matched  # [C, C]
    g = g / max(np.linalg.norm(g), 1e-12)
    c = phi_t.shape[0]
    diag = np.diag(g)[:c]
    correction = phi_t * (1.0 + 0.5 * (diag / max(diag.mean(), 1e-12) - 1.0))[
        :, None, None
    ]
    return np.asarray(
        l2_normalize(jnp.asarray(correction), axes=(1, 2))
    )


def _stitch(windows: list[np.ndarray], crossfade: int) -> np.ndarray:
    if not windows:
        return np.zeros(0, np.float32)
    if crossfade <= 0 or len(windows) == 1:
        return np.concatenate(windows)
    out = [windows[0]]
    ramp = np.linspace(0.0, 1.0, crossfade, dtype=np.float32)
    for w in windows[1:]:
        prev = out[-1]
        blended = prev[-crossfade:] * (1 - ramp) + w[:crossfade] * ramp
        out[-1] = prev[:-crossfade]
        out.append(blended)
        out.append(w[crossfade:])
    return np.concatenate(out)
