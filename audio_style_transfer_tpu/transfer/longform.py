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
import functools

import jax
import jax.numpy as jnp
import numpy as np

from audio_style_transfer_tpu.signal.mu_law import inv_mu_law_numpy
from audio_style_transfer_tpu.transfer.engine import StyleTransfer
from audio_style_transfer_tpu.transfer.grams import l2_normalize
from audio_style_transfer_tpu.transfer.losses import transfer_embeds

# The jitted helpers below live at MODULE level with hashable static args
# (the frozen config dataclasses): defining them inside the driver
# functions handed jax.jit a fresh function object per call, so every
# transfer_longform/ot_translated_gram invocation re-traced and re-loaded
# its executables (~10 s per program via the persistent cache, much more
# cold) — bench.py alone calls the long-form driver twice per run.


@functools.partial(jax.jit, static_argnames=("cfg", "lspec"))
def _window_targets(params, wins_q, pt, ps, cfg, lspec):
    """Per-window (content embed, translated style gram) in ONE program."""

    def one(xq):
        c, s = transfer_embeds(params, xq[None], cfg, lspec)
        return c, l2_normalize(s + pt - ps, axes=(1, 2))

    return jax.lax.map(one, wins_q)


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
    ot_blend: float = 0.5,
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
      ot_blend: weight of the OT translated-gram delta on the style target
        (0 = reference target untouched, 1 = full correction; see
        _ot_transform_gram for the measured sensitivity).
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
                                   phi_t, ot_components, blend=ot_blend)

    # Per-window content embeds + translated style targets, computed in ONE
    # jitted device program (lax.map over windows) with the results left on
    # device. The previous host loop made 2 dispatches per window and
    # shipped every [T, C] content embed device->host->device (~1 GB of
    # tunnel traffic for 58 windows; measured 27 s of a 182 s run).
    from audio_style_transfer_tpu.signal.mu_law import mu_law_numpy

    phi_cs, phis = _window_targets(
        engine.params,
        jnp.asarray(mu_law_numpy(windows), jnp.float32),
        jnp.asarray(phi_t),
        jnp.asarray(phi_s),
        cfg=engine.cfg,
        lspec=engine.loss_spec,
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


def ot_translated_gram(engine, style_audio, content_audio, n_components):
    """Full OT-translated gram: content features reconstructed in the
    OT-matched palette, per style layer, through the engine's own gram
    statistic.

    The reference ships this pipeline as ``utils.transform``
    (utils.py:132-145 — NMF-factorize non-negative features over a
    palette, OT-match the palette, return the reconstruction ``h @ W``)
    plus the ADMM matcher (optimal_transport.py:140-162), but never wires
    it into a loss. Here the same pipeline runs on EVERY style layer the
    loss uses:

      1. the relu'd content and style taps at layer i (NMF needs
         non-negative input — exactly why the reference's transform could
         only ever consume relu'd features) are factorized into palettes
         wc_i / ws_i [k, C];
      2. the content palette is OT-matched toward the style palette,
         w*_i = compute_permutation(wc_i, ws_i) — the ADMM transport's
         barycentric projection;
      3. the content tap is reconstructed in the matched palette,
         f'_i = h_i @ w*_i with h_i the NMF activations of the content
         tap over its own palette (the reference's ``h @ W`` form,
         utils.py:139-145);
      4. the engine's gram statistic (channel-wise or Gatys, same
         nb_channels trim and l2 normalization) is built over all the
         reconstructed taps — the full gram of "content rendered in the
         style palette".

    Returns (g_ot, g_c, g_s): the translated gram, plus the same-
    construction (relu'd-tap) content and style grams for reference —
    all l2-normalized and shaped exactly like the engine's ``phi_t``.
    Property (asserted at full geometry in tests/test_longform.py):
    g_ot differs measurably from g_c and is strictly CLOSER to g_s —
    the transport moved the statistic in the style direction.
    """
    from audio_style_transfer_tpu.signal.mu_law import mu_law_numpy

    window = engine.spec.batch_size
    lspec = engine.loss_spec
    style_ids = tuple(sorted(set(lspec.style_layer_ids)))

    def taps(aud):
        xq = jnp.asarray(mu_law_numpy(aud[None, :window]), jnp.float32)
        return _relu_taps(engine.params, xq, cfg=engine.cfg,
                          style_ids=style_ids)

    fc, fs = taps(content_audio), taps(style_audio)

    f_ot, rec_errs, pal_dists = _ot_translate(fc, fs,
                                              n_components=n_components)
    print(
        f"OT transform: nmf rec err {float(jnp.mean(rec_errs)):.4f}, "
        f"palette shift {float(jnp.mean(pal_dists)):.4f} "
        f"(mean over {len(style_ids)} layers)"
    )

    gram = functools.partial(_stack_gram, lspec=lspec, style_ids=style_ids)
    return np.asarray(gram(f_ot)), np.asarray(gram(fc)), np.asarray(gram(fs))


@functools.partial(jax.jit, static_argnames=("cfg", "style_ids"))
def _relu_taps(params, xq, cfg, style_ids):
    """relu'd [L, T, C] style-layer taps — one jitted encoder pass
    (running the 30-layer encoder eagerly dispatches every op through the
    remote runtime one at a time, ~35 s/pass on the tunnel)."""
    from audio_style_transfer_tpu.models.wavenet_ae import encoder_extracts

    extracts, _ = encoder_extracts(params, xq, cfg, needed_taps=style_ids)
    return jnp.stack(
        [jnp.maximum(extracts[i][0].astype(jnp.float32), 0.0)
         for i in style_ids]
    )


@functools.partial(jax.jit, static_argnames=("n_components",))
def _ot_translate(fc, fs, n_components: int):
    """ALL per-layer NMFs + OTs batched into one jitted program: the
    layer-loop version paid the nmf executable's per-process load (~10 s
    cache-warm) plus 30+ tunnel dispatches — ~68 s of the 60-s long-form
    run; vmapped it is one compile + one dispatch (~2 s warm)."""
    from audio_style_transfer_tpu.analysis.nmf import nmf, nmf_transform
    from audio_style_transfer_tpu.analysis.ot import ot_admm, transform_palette

    palette = lambda x: nmf(x, n_components)[1]  # [k, C]
    wc = jax.vmap(palette)(fc)  # content palettes [L, k, C]
    ws = jax.vmap(palette)(fs)  # style palettes   [L, k, C]
    plans = jax.vmap(lambda a, b: ot_admm(a, b))(wc, ws)
    wm = jax.vmap(transform_palette)(wc, ws, plans)  # matched [L, k, C]
    h = jax.vmap(nmf_transform)(fc, wc)  # activations [L, T, k]
    f_ot = jnp.einsum("ltk,lkc->ltc", h, wm)
    fro = lambda a: jnp.sqrt(jnp.sum(jnp.square(a), axis=(-2, -1)))
    rec_err = fro(fc - jnp.einsum("ltk,lkc->ltc", h, wc)) / jnp.maximum(
        fro(fc), 1e-12
    )
    pal_dist = fro(wc - wm) / jnp.maximum(fro(wc), 1e-12)
    return f_ot, rec_err, pal_dist


@functools.partial(jax.jit, static_argnames=("lspec", "style_ids"))
def _stack_gram(stack, lspec, style_ids):
    from audio_style_transfer_tpu.transfer.grams import style_gram

    tap_map = {i: stack[j][None] for j, i in enumerate(style_ids)}
    return style_gram(
        tap_map, lspec.style_layer_ids, gatys=lspec.gatys,
        nb_channels=lspec.nb_channels,
    ).astype(jnp.float32)


def _ot_transform_gram(engine, style_audio, content_audio, phi_t,
                       n_components, blend: float = 0.5):
    """Style target with the full OT-translated gram blended in (config
    5's "OT loss").  The correction is the DELTA between the translated
    and untranslated relu'd-tap grams — a same-space difference, so the
    relu-vs-raw statistic mismatch cancels and the correction is exactly
    zero when the transport is the identity (OT-off ≡ reference target).
    Round 2's diagonal-rescale heuristic is gone: the translated
    statistic participates as a full gram.

    ``blend`` scales the delta: 0 reproduces the reference target
    exactly, 1 applies the full translated-gram correction.  Measured at
    full geometry (sweep asserted in tests/test_longform.py, recorded in
    BENCH_NOTES.md "OT blend sweep"): the target's distance to the style
    gram has an INTERIOR minimum — the l2 re-normalization overshoots at
    full weight (d(0)=8.446 ... d(0.75)=8.241, d(1.0)=8.281) — so the
    0.5 default sits in the shallow basin while keeping the reference
    target dominant.  The reference never wired OT into a loss
    (utils.py:132-145 builds the transform but stops at features), so
    there is no parity constraint — the knob is exposed on
    transfer_longform, transfer_exact, and the CLI."""
    g_ot, g_c, _ = ot_translated_gram(
        engine, style_audio, content_audio, n_components
    )
    return np.asarray(
        l2_normalize(jnp.asarray(phi_t + blend * (g_ot - g_c)), axes=(1, 2))
    )


def transfer_exact(
    engine: StyleTransfer,
    content_audio: np.ndarray,
    style_audio: np.ndarray,
    mesh,
    epochs: int | None = None,
    max_style_examples: int = 5,
    scan_window: int | None = None,
    ot_components: int | None = None,
    ot_blend: float = 0.5,
) -> LongformResult:
    """Exact long-form mode: ONE window spanning the whole clip,
    time-sharded over the mesh with halo exchange (parallel/halo.py).

    Numerics are identical to running the transfer on a single giant
    device: one global gram over the full sequence, no chunk seams, no
    crossfade, content features preserved at every sample. Style
    statistics stay chunk-averaged exactly like the reference
    (methods.py:97-111) — only the OPTIMIZED window is global. The
    per-epoch L-BFGS restarts and the ``< early_stop_evals`` stop follow
    the engine's spec; each epoch is one jitted sharded program.

    With ``mesh=None`` the same global-window semantics run on a SINGLE
    device.  Clips whose trunk taps fit HBM (about two minutes of 16 kHz
    audio on a 16 GB v5e) run as ONE unmasked trunk pass — the fastest
    exact flavour, near-linear in T (halo._single_window_exact_loss_fn).
    Longer clips run as a ``lax.scan`` over ``scan_window``-sample
    halo-extended tiles: compile cost and live memory scale with the
    window, not the clip (halo.make_scan_exact_loss_fn).  Pass
    ``scan_window`` explicitly to force the scan flavour (or a different
    tile size); ``None`` picks automatically.

    ``ot_components`` / ``ot_blend``: as in :func:`transfer_longform` —
    the style statistic is first mapped through the NMF + optimal-
    transport palette transform (the "OT loss" of BASELINE.json config
    5), composing with the exact objective: the correction applies to
    the chunk-averaged ``phi_t`` before the gram translation, so the
    global window optimizes toward the OT-corrected target.

    The clip is trimmed to a multiple of mesh_size * 512 samples (equal
    shards; shard length divisible by the STFT frame step so gamma != 0
    stays exact) or of 4096 in single-window mode.  Scan mode trims only
    to a multiple of 512 and zero-pads up to a whole number of windows,
    masking the pad out of the loss (halo.make_scan_exact_loss_fn
    ``t_valid``) — a 32768-window no longer silently drops up to ~2 s of
    trailing audio.
    """
    from audio_style_transfer_tpu.signal.mu_law import mu_law_numpy
    from audio_style_transfer_tpu.transfer.lbfgs import LBFGSOptions

    spec = engine.spec
    epochs = epochs or spec.epochs
    if mesh is None and scan_window is None:
        # ~131 s of 16 kHz audio: the single-window taps+masks footprint
        # approaches the chip's HBM beyond this; longer clips scan.
        scan_window = (
            len(content_audio) if len(content_audio) <= 2_097_152 else 32768
        )
    if mesh is None:
        if scan_window >= len(content_audio):  # single-window mode
            quantum, scan_window = 4096, len(content_audio)
        else:
            quantum = 512
    else:
        quantum = int(mesh.devices.size) * 512
    t_valid = (len(content_audio) // quantum) * quantum
    if t_valid == 0:
        raise ValueError(
            f"content ({len(content_audio)} samples) shorter than one "
            f"{quantum}-sample quantum"
        )
    if mesh is None and scan_window < t_valid:
        # Scan mode: pad to a whole number of windows; the pad tail is
        # masked out of the loss (t_valid), not silently trimmed.
        t_total = -(-t_valid // scan_window) * scan_window
    else:
        t_total = t_valid
    content = np.pad(content_audio[:t_valid], (0, t_total - t_valid))

    # Reference-semantics style statistics (chunk-averaged).
    phi_t = engine.get_style_phi(style_audio, max_examples=max_style_examples)
    phi_s = engine.get_style_phi(content_audio, max_examples=max_style_examples)

    if ot_components is not None:
        phi_t = _ot_transform_gram(engine, style_audio, content_audio,
                                   phi_t, ot_components, blend=ot_blend)

    opts = LBFGSOptions(
        maxiter=spec.maxiter, line_search="zoom", restart_on_ls_fail=False
    )
    if mesh is None:
        embeds_fn, epoch_fn = _exact_scan_programs(
            engine.cfg, engine.loss_spec, opts, t_total, scan_window, t_valid
        )
        shard_x = None
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = mesh.axis_names[0]
        embeds_fn, epoch_fn = _exact_programs(mesh, axis, engine.cfg,
                                              engine.loss_spec, opts)
        shard_x = NamedSharding(mesh, P(None, axis))

    # Full-sequence content targets through ONE exact encoder pass.
    xq_c = jnp.asarray(mu_law_numpy(content[None]), jnp.float32)
    if shard_x is not None:
        xq_c = jax.device_put(xq_c, shard_x)
    phi_c, phi_full = embeds_fn(engine.params, xq_c)
    phi = l2_normalize(
        phi_full.astype(jnp.float32) + jnp.asarray(phi_t) - jnp.asarray(phi_s),
        axes=(1, 2),
    )

    x = jnp.full((1, t_total), 1e-6, jnp.float32)
    if shard_x is not None:
        x = jax.device_put(x, shard_x)
    metrics, evals = [], []
    done = 0
    for _ in range(epochs):
        res = epoch_fn(engine.params, x, phi_c, phi)
        x = res.x
        metrics.append(float(res.f))
        evals.append(int(res.n_evals))
        done += 1
        if evals[-1] < spec.early_stop_evals:
            break

    audio = inv_mu_law_numpy(np.asarray(x[0, :t_valid]))
    return LongformResult(
        audio=audio,
        per_window={
            "metrics": np.asarray(metrics, np.float32),
            "evals": np.asarray(evals, np.int32),
            "epochs_done": done,
            # Length the program actually optimized: in scan mode this is
            # t_valid padded up to whole scan windows, so per-eval-cost
            # accounting must divide by THIS, not len(audio).
            "t_optimized": int(t_total),
            "x": np.asarray(x),
        },
    )


@functools.lru_cache(maxsize=8)
def _exact_programs(mesh, axis: str, cfg, lspec, opts):
    """(embeds_fn, epoch_fn) for exact mode, traced ONCE per
    (mesh, config, optimizer options) — weights and targets are program
    ARGUMENTS, so repeated transfer_exact calls (or several clips) reuse
    the executables instead of re-tracing them per invocation (the giant
    T-global programs cost minutes cold, ~10 s even via the persistent
    cache)."""
    from audio_style_transfer_tpu.parallel.halo import (
        make_sharded_embeds_fn,
        make_sharded_loss_fn,
    )
    from audio_style_transfer_tpu.transfer.lbfgs import lbfgs_minimize

    embeds_fn = jax.jit(make_sharded_embeds_fn(cfg, lspec, mesh, axis))
    loss_sharded = make_sharded_loss_fn(cfg, lspec, mesh, axis)

    @jax.jit
    def epoch_fn(params, x, phi_c, phi):
        vg = jax.value_and_grad(
            lambda xx: loss_sharded(params, xx, phi_c, phi)
        )
        return lbfgs_minimize(vg, x, opts)

    return embeds_fn, epoch_fn


@functools.lru_cache(maxsize=8)
def _exact_scan_programs(cfg, lspec, opts, t_total: int, window: int,
                         t_valid: int | None = None):
    """Single-device flavour of :func:`_exact_programs`: the loss runs
    as a window scan (halo.make_scan_exact_loss_fn), so the traced
    program is window-sized however long the clip is."""
    from audio_style_transfer_tpu.parallel.halo import (
        make_scan_exact_embeds_fn,
        make_scan_exact_loss_fn,
    )
    from audio_style_transfer_tpu.transfer.lbfgs import lbfgs_minimize

    embeds_fn = jax.jit(
        make_scan_exact_embeds_fn(cfg, lspec, t_total, window, t_valid)
    )
    loss_scan = make_scan_exact_loss_fn(cfg, lspec, t_total, window, t_valid)

    @jax.jit
    def epoch_fn(params, x, phi_c, phi):
        vg = jax.value_and_grad(
            lambda xx: loss_scan(params, xx, phi_c, phi)
        )
        return lbfgs_minimize(vg, x, opts)

    return embeds_fn, epoch_fn


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
