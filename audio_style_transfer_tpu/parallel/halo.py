"""Time-axis sharding of the encoder with halo exchange — the
context-parallel analogue for a dilated conv stack (SURVEY.md §2d).

The reference scales long audio by *chunking* on the host with gram
averaging (reference methods.py:97-111).  That stays available (and is
embarrassingly parallel), but it changes semantics at chunk borders.  This
module instead computes the *exact* full-sequence encoder over a sequence
sharded across devices:

1. each device holds a contiguous time chunk of the waveform;
2. one ``ppermute`` round exchanges the encoder's full one-sided receptive
   field R = 3070 samples (models.wavenet_ae.receptive_field_radius) with
   both neighbours over ICI;
3. every device runs the trunk on its halo-extended chunk and crops R from
   each side — recompute cost 2R/chunk (~4% at 5s chunks) in exchange for a
   single small collective instead of 31 per-layer exchanges;
4. Gram statistics are *time sums*, so the exact global gram is the psum of
   local partial grams; content features stay sharded.

Result: the transfer loss (and its gradient, which reverses the same
collectives automatically) over a 60-second clip runs as one SPMD program
on a v5e-8 with identical numerics to a single giant device.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from audio_style_transfer_tpu.models.wavenet_ae import (
    WaveNetAEConfig,
    encoder_trunk,
    receptive_field_radius,
)
from audio_style_transfer_tpu.signal.mu_law import inv_mu_law, safe_abs
from audio_style_transfer_tpu.signal.stft import stft
from audio_style_transfer_tpu.transfer.grams import l2_normalize
from audio_style_transfer_tpu.transfer.losses import LossSpec


def _exchange_halos(x_local, radius: int, axis_name: str):
    """Fetch ``radius`` samples from both neighbours of a [B, chunk] shard.

    Edge devices receive zeros (SAME-padding semantics at the global edges,
    matching the single-device encoder's zero padding).
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    # Send my right edge to my right neighbour -> arrives as his left halo.
    right_edge = x_local[:, -radius:]
    left_halo = jax.lax.ppermute(
        right_edge, axis_name, [(i, (i + 1) % n) for i in range(n)]
    )
    left_halo = jnp.where(idx == 0, jnp.zeros_like(left_halo), left_halo)

    # Send my left edge to my left neighbour -> arrives as his right halo.
    left_edge = x_local[:, :radius]
    right_halo = jax.lax.ppermute(
        left_edge, axis_name, [(i, (i - 1) % n) for i in range(n)]
    )
    right_halo = jnp.where(idx == n - 1, jnp.zeros_like(right_halo), right_halo)

    return jnp.concatenate([left_halo, x_local, right_halo], axis=1)


def time_sharded_trunk(params, x_local, cfg: WaveNetAEConfig,
                       axis_name: str = "time", needed_taps=None):
    """Per-shard encoder trunk with exact full-sequence semantics.

    Call inside ``shard_map`` with the waveform sharded as P(None, axis).
    Returns the 32 extracts cropped back to the local chunk (entries the
    caller did not list in ``needed_taps`` may be None — see
    models.wavenet_ae.encoder_trunk).

    The exchanged halo is the receptive-field radius rounded UP to a
    multiple of 512: a larger halo is semantically free (the extra rows
    are exact neighbour samples, cropped below), and it keeps the
    extended chunk length divisible by a >=128 power-of-two so the
    chained Pallas trunk (ops/pallas_chain.py) admits a feasible plan —
    3070 alone would leave clip_rows divisible only by 4.
    """
    radius = -(-receptive_field_radius(cfg) // 512) * 512
    x_ext = _exchange_halos(x_local, radius, axis_name)

    # Mark which extended positions lie inside the global sequence: only the
    # first/last devices carry out-of-range halo (their neighbours across the
    # ring wrap don't exist). The trunk re-zeroes masked positions per layer
    # so SAME-padding numerics match the single-device encoder exactly.
    # Expressed as a CONTIGUOUS (lo, hi) window so the chained Pallas
    # kernels run this path natively (valid_window); the XLA fallback
    # derives the same boolean mask from it.
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    chunk = x_local.shape[1]
    lo = jnp.where(idx == 0, radius, 0)
    hi = jnp.where(idx == n - 1, chunk + radius, chunk + 2 * radius)

    extracts = encoder_trunk(params, x_ext, cfg, valid_window=(lo, hi),
                             needed_taps=needed_taps)
    return [None if e is None else e[:, radius:-radius, :] for e in extracts]


def sharded_stft_l1(
    a_local,
    axis_name: str,
    frame_length: int = 1024,
    frame_step: int = 512,
):
    """Exact global ``stft_l1`` over a time-sharded signal.

    The global non-centered STFT (reference methods.py:122) has frames that
    straddle shard boundaries. Each device fetches ``frame_length -
    frame_step`` samples from its right neighbour so boundary frames are
    computed exactly once (by the left shard); frames whose global index
    falls past the end of the signal are masked off the sum. The result —
    sum over all global frames / global element count — is bit-comparable to
    the single-device regularizer, and so is its gradient (the halo
    ppermute reverses automatically under AD).

    Requires chunk % frame_step == 0 (the long-form engine pads to this).

    Args:
      a_local: [chunk] local waveform shard (audio domain, post inv_mu_law).
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    chunk = a_local.shape[-1]
    if chunk % frame_step != 0:
        raise ValueError(
            f"sharded_stft_l1 needs chunk % frame_step == 0, got {chunk} % {frame_step}"
        )
    halo = frame_length - frame_step

    # My right neighbour's first `halo` samples (the last device receives
    # wrap-around data, but all its frames using it are masked below).
    right_halo = jax.lax.ppermute(
        a_local[..., :halo], axis_name, [(i, (i - 1) % n) for i in range(n)]
    )
    ext = jnp.concatenate([a_local, right_halo], axis=-1)

    s = stft(ext, frame_length, frame_step)  # [m, F]
    m = s.shape[-2]
    n_global = 1 + (n * chunk - frame_length) // frame_step
    in_range = (idx * m + jnp.arange(m)) < n_global
    vals = safe_abs(jnp.real(s)) + safe_abs(jnp.imag(s))
    local_sum = jnp.sum(vals * in_range[..., :, None].astype(vals.dtype))
    total = jax.lax.psum(local_sum, axis_name)
    return total / (n_global * s.shape[-1])


def _local_grams(extracts, layer_ids: Sequence[int], gatys: bool):
    """Unnormalized partial grams of a local time chunk.

    Deliberately the TRANSPOSED-matmul form, unlike transfer/grams.py's
    pairwise products: at the long chunk lengths this path runs on
    (T/n_devices ~ 10^5+ samples), one [C, L, t] layout pass + batched
    matmul reads each tap once, whereas the pairwise fusions re-read both
    taps per pair — measured 768 vs 336 ms/eval at T=239616 on one v5e.
    (The pairwise form wins only next to the Pallas custom-calls at
    T=16384, where the transpose forced ~40 MB of layout copies.)"""
    stl = jnp.concatenate([extracts[i] for i in layer_ids], axis=0)  # [L, t, C]
    if not gatys:
        stl = jnp.transpose(stl, (2, 0, 1))  # [C, L, t]
    else:
        stl = jnp.transpose(stl, (0, 2, 1))  # [L, C, t]
    return jnp.matmul(
        stl, jnp.transpose(stl, (0, 2, 1)), preferred_element_type=jnp.float32
    )


def make_sharded_embeds_fn(
    cfg: WaveNetAEConfig,
    spec: LossSpec,
    mesh: Mesh,
    axis_name: str = "time",
):
    """Unbound flavour of :func:`make_sharded_embeds`:
    (params, x [1, T]) -> (content embed [T, C*], style gram).  Taking
    params as an ARGUMENT keeps the callable cacheable/jittable once per
    (cfg, spec, mesh) instead of once per weights pytree."""

    needed = tuple(sorted(set(spec.cont_lyr_ids) | set(spec.style_layer_ids)))

    def local(params, x_local):
        extracts = time_sharded_trunk(params, x_local, cfg, axis_name,
                                      needed_taps=needed)
        c_local = jnp.concatenate(
            [extracts[i][:, :, : spec.cnt_channels] for i in spec.cont_lyr_ids],
            axis=2,
        )[0]
        gram = jax.lax.psum(
            _local_grams(extracts, spec.style_layer_ids, spec.gatys), axis_name
        )
        gram = l2_normalize(gram, axes=(1, 2))
        if spec.nb_channels < gram.shape[0] and not spec.gatys:
            gram = gram[: spec.nb_channels]
        return c_local, gram

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(None, axis_name)),
        out_specs=(P(axis_name), P()),
        check_vma=False,
    )


def make_sharded_embeds(
    params,
    cfg: WaveNetAEConfig,
    spec: LossSpec,
    mesh: Mesh,
    axis_name: str = "time",
):
    """Jittable x [1, T] -> (content embed [T, C*], style gram) with exact
    full-sequence semantics over the time-sharded mesh — the target-building
    companion of :func:`make_sharded_loss` (one encoder pass, no chunking).
    The content embed comes back sharded over T, the gram replicated."""
    sharded = make_sharded_embeds_fn(cfg, spec, mesh, axis_name)

    def embeds(x):
        return sharded(params, x)

    return embeds


def make_sharded_loss_fn(
    cfg: WaveNetAEConfig,
    spec: LossSpec,
    mesh: Mesh,
    axis_name: str = "time",
):
    """Unbound flavour of :func:`make_sharded_loss`:
    (params, x [1, T], phi_c, phi_s) -> scalar loss.  Targets/weights as
    ARGUMENTS so one traced program serves every clip (see
    transfer/longform.transfer_exact's per-(mesh, cfg) program cache)."""

    needed = tuple(sorted(set(spec.cont_lyr_ids) | set(spec.style_layer_ids)))

    def local_loss(params, x_local, phi_c_local, phi_s_rep):
        extracts = time_sharded_trunk(params, x_local, cfg, axis_name,
                                      needed_taps=needed)

        # Content term: local MSE partial sums -> pmean is exact because all
        # shards are equal length.
        c_local = jnp.concatenate(
            [extracts[i][:, :, : spec.cnt_channels] for i in spec.cont_lyr_ids],
            axis=2,
        )[0]
        content_sq = jnp.mean(jnp.square(c_local - phi_c_local))
        content_loss = jax.lax.pmean(content_sq, axis_name) * 10.0

        # Style term: grams are time sums -> psum then normalize = exact.
        gram = jax.lax.psum(
            _local_grams(extracts, spec.style_layer_ids, spec.gatys), axis_name
        )
        gram = l2_normalize(gram, axes=(1, 2))
        if spec.nb_channels < gram.shape[0] and not spec.gatys:
            gram = gram[: spec.nb_channels]
        style_loss = jnp.mean(jnp.square(gram - phi_s_rep)) * 1e3

        loss = content_loss + spec.lambd * style_loss
        if spec.gamma != 0.0:
            # Exact global regularizer: one extra frame of halo makes the
            # boundary-straddling frames exact (see sharded_stft_l1).
            reg = sharded_stft_l1(inv_mu_law(x_local[0]), axis_name)
            loss = loss + spec.gamma * reg
        return loss

    return shard_map(
        local_loss,
        mesh=mesh,
        in_specs=(P(), P(None, axis_name), P(axis_name), P()),
        out_specs=P(),
        check_vma=False,
    )


def make_sharded_loss(
    params,
    phi_c,
    phi_s,
    cfg: WaveNetAEConfig,
    spec: LossSpec,
    mesh: Mesh,
    axis_name: str = "time",
):
    """Build loss(x) over a time-sharded waveform with exact global numerics.

    ``phi_c`` is the [T, C] content target (sharded over T on the mesh) and
    ``phi_s`` the (replicated) gram target. Returns a jittable callable
    x [1, T] -> scalar loss usable under jax.grad.
    """
    sharded = make_sharded_loss_fn(cfg, spec, mesh, axis_name)

    def loss(x):
        return sharded(params, x, phi_c, phi_s)

    return loss


# --------------------------------------------------------------------- #
# Single-device exact mode: scan over fixed halo-extended windows
# --------------------------------------------------------------------- #


def _window_radius(cfg: WaveNetAEConfig, align: int = 512) -> int:
    """Receptive-field radius rounded up to a multiple of ``align`` (see
    time_sharded_trunk's docstring for why the rounding is free).  The
    scan path aligns to 2048 so the extended window keeps a 4096 power-
    of-two factor — the chained-kernel planner's preferred tile; 512
    alignment left the 15-s scan on 2048-row tiles (measured +25% kernel
    time from the doubled per-tile fixed costs)."""
    return -(-receptive_field_radius(cfg) // align) * align


def _window_grams(extracts, spec: LossSpec):
    """Unnormalized partial grams of one scan window.

    Unlike the mesh path's :func:`_local_grams` (transposed batched
    matmul — the winner at T/device ~ 10^5+), scan windows are
    engine-sized (~32k samples) and sit right next to the Pallas trunk
    custom-calls, where the [C, L, t] transpose forces XLA to
    materialize tens of MB of layout copies per window (round-2
    profile).  The channel-wise flavour therefore uses the Pallas
    all-pairs kernel when the window admits it (each tap read from HBM
    once), falling back to the native-layout pairwise-product form; the
    measured effect is the 15-s exact eval dropping 47.9 -> ~22 ms
    (round-4 BENCH_NOTES)."""
    ids = spec.style_layer_ids
    if spec.gatys:
        return _local_grams(extracts, ids, True)
    t = extracts[ids[0]].shape[1]
    if spec.fused_gram and t % 128 == 0:
        from audio_style_transfer_tpu.ops.pallas_gram import pair_gram

        g = pair_gram(*[extracts[i] for i in ids])  # [1, L, L, C] f32
        return jnp.transpose(g[0], (2, 0, 1))  # [C, L, L]
    taps = [extracts[i][0] for i in ids]
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
    return jnp.transpose(jnp.stack(rows, axis=0), (2, 0, 1))  # [C, L, L]


def _single_window_exact_loss_fn(cfg: WaveNetAEConfig, spec: LossSpec,
                                 t_total: int):
    """Whole-clip exact loss as ONE unmasked trunk pass.

    For a single window the unmasked trunk's SAME-padding clip semantics
    ARE the global semantics — no halo, no padding, no valid-window
    masking, no tap cropping (and so none of the crop/pad copy traffic
    the windowed formulation pays: round 4 measured 3.6 ms/eval of pure
    tap slicing+padding at T=229376).  This is the fastest exact flavour
    whenever the taps fit HBM (~11 bf16 [T, 128] arrays + masks: a
    60-second clip costs ~4 GB on a 16 GB v5e); transfer_exact picks it
    automatically for clips under its memory threshold."""
    needed = tuple(sorted(set(spec.cont_lyr_ids) | set(spec.style_layer_ids)))

    def loss(params, x, phi_c, phi_s):
        extracts = encoder_trunk(params, x, cfg, needed_taps=needed)
        c_local = jnp.concatenate(
            [extracts[i][:, :, : spec.cnt_channels] for i in spec.cont_lyr_ids],
            axis=2,
        )[0]
        content_loss = jnp.mean(
            jnp.square(c_local.astype(jnp.float32) - phi_c.astype(jnp.float32))
        ) * 10.0
        gram = l2_normalize(_window_grams(extracts, spec), axes=(1, 2))
        if spec.nb_channels < gram.shape[0] and not spec.gatys:
            gram = gram[: spec.nb_channels]
        style_loss = jnp.mean(jnp.square(gram - phi_s)) * 1e3
        total = content_loss + spec.lambd * style_loss
        if spec.gamma != 0.0:
            from audio_style_transfer_tpu.signal.stft import stft_l1

            total = total + spec.gamma * stft_l1(
                inv_mu_law(x[0]), frame_length=1024, frame_step=512
            )
        return total

    return loss


def _single_window_exact_embeds_fn(cfg: WaveNetAEConfig, spec: LossSpec):
    needed = tuple(sorted(set(spec.cont_lyr_ids) | set(spec.style_layer_ids)))

    def embeds(params, x):
        extracts = encoder_trunk(params, x, cfg, needed_taps=needed)
        c = jnp.concatenate(
            [extracts[i][:, :, : spec.cnt_channels] for i in spec.cont_lyr_ids],
            axis=2,
        )[0]
        gram = l2_normalize(_window_grams(extracts, spec), axes=(1, 2))
        if spec.nb_channels < gram.shape[0] and not spec.gatys:
            gram = gram[: spec.nb_channels]
        return c, gram

    return embeds


def make_scan_exact_loss_fn(
    cfg: WaveNetAEConfig,
    spec: LossSpec,
    t_total: int,
    window: int = 32768,
    t_valid: int | None = None,
):
    """Single-DEVICE exact long-form loss with bounded compile/memory.

    Same semantics as :func:`make_sharded_loss_fn` — ONE global gram,
    exact content features, SAME padding at the global clip edges
    (exceeding the reference's chunked approximation,
    methods.py:97-111) — but instead of sharding time over a mesh it
    runs a ``lax.scan`` over fixed ``window``-sample tiles, each
    extended by the receptive-field halo and masked with the trunk's
    dynamic valid window.  The traced program contains ONE trunk at
    ``window + 2*radius`` samples regardless of ``t_total``, so the
    60-second clip that made the global-T program un-compilable on one
    chip compiles in the same time as a single window.

    Gram statistics are time sums and the content MSE is a mean over
    T, so per-window partial sums reproduce the global loss exactly
    (f32 accumulation order differs only across window boundaries).

    Returns (params, x [1, t_total], phi_c [t_total, C*], phi_s) ->
    scalar loss.  ``t_total`` must be a multiple of ``window`` (and
    ``window`` a multiple of 512 so the STFT regularizer frames
    partition cleanly).

    ``t_valid`` (default ``t_total``): the true clip length.  When the
    clip does not tile into windows, the caller zero-pads it to
    ``t_total`` and passes the unpadded length here; positions in
    [t_valid, t_total) are zeroed before the trunk (exactly the SAME
    padding a ``t_valid``-length clip would see), masked out of every
    tap, excluded from the content mean and the STFT frame count — so
    the loss (and gradient) equal the unpadded computation, instead of
    silently trimming up to ``window - 1`` trailing samples.
    """
    t_valid = t_total if t_valid is None else t_valid
    if not (0 < t_valid <= t_total):
        raise ValueError(f"t_valid {t_valid} outside (0, {t_total}]")
    if window >= t_total:
        if t_valid != t_total:
            raise ValueError(
                "single-window mode has no pad masking: trim to t_total"
            )
        return _single_window_exact_loss_fn(cfg, spec, t_total)
    if t_total % window or window % 512:
        raise ValueError(
            f"t_total {t_total} must tile into 512-aligned windows of "
            f"{window}"
        )
    radius = _window_radius(cfg, align=2048)
    n_win = t_total // window
    needed = tuple(sorted(set(spec.cont_lyr_ids) | set(spec.style_layer_ids)))
    frame_length, frame_step = 1024, 512
    n_frames = 1 + (t_valid - frame_length) // frame_step
    if spec.gamma != 0.0 and n_frames < 1:
        # The STFT regularizer needs at least one whole frame; with
        # t_valid < frame_length the mean below would divide by zero and
        # poison the loss with NaN.  Unreachable via transfer_exact
        # (its quantum keeps t_valid >= 512-aligned window sizes), but
        # guard the public builder for direct callers.
        raise ValueError(
            f"t_valid {t_valid} is shorter than one STFT frame "
            f"({frame_length}); the gamma regularizer is undefined"
        )
    m_win = window // frame_step
    # Edge/middle split: a window is FULLY valid iff its halo-extended
    # tile lies inside [0, t_valid) — those run the plain (unmasked)
    # trunk, whose chained kernels skip the per-layer window multiply
    # (measured ~1.4x cheaper per row).  The handful of edge windows
    # (window 0, plus the tail that touches clip padding) run masked
    # with STATIC (lo, hi), unrolled.  mid_lo..mid_hi is the contiguous
    # fully-valid range; when it is empty (radius > window, or a tiny
    # clip) everything stays in the dynamically-masked scan.
    mid_lo = -(-radius // window)  # first i with i*window >= radius
    mid_hi = (t_valid - radius) // window - 1  # last fully-valid i
    split = mid_lo <= mid_hi and n_win >= 2

    def _window_terms(params, x_ext, vw, phi_c_win):
        extracts = encoder_trunk(params, x_ext, cfg, valid_window=vw,
                                 needed_taps=needed)
        extracts = [
            None if e is None else e[:, radius:-radius, :] for e in extracts
        ]
        c_local = jnp.concatenate(
            [extracts[i][:, :, : spec.cnt_channels] for i in spec.cont_lyr_ids],
            axis=2,
        )[0]
        content_sq = jnp.sum(
            jnp.square(c_local.astype(jnp.float32) - phi_c_win)
        )
        gram_part = _window_grams(extracts, spec)
        return content_sq, gram_part

    def _window_reg(xp, start, i):
        # Global non-centered STFT: window i owns the frames starting
        # inside it; one extra frame of right halo (real neighbour
        # samples from xp) makes the boundary-straddling frames exact,
        # frames past the global end are masked (same scheme as
        # sharded_stft_l1).
        a = inv_mu_law(
            jax.lax.dynamic_slice(
                xp, (0, radius + start),
                (1, window + frame_length - frame_step),
            )[0]
        )
        s = stft(a, frame_length, frame_step)
        in_range = (i * m_win + jnp.arange(m_win)) < n_frames
        vals = safe_abs(jnp.real(s)) + safe_abs(jnp.imag(s))
        return jnp.sum(vals * in_range[:, None].astype(vals.dtype))

    def loss(params, x, phi_c, phi_s):
        if t_valid < t_total:
            # Zero the trainable pad tail BEFORE the trunk: the startconv
            # reads raw x, so valid positions near t_valid must see the
            # zeros a t_valid-length clip's SAME padding provides (and the
            # multiply makes the pad tail's gradient exactly zero).
            x = x * (jnp.arange(t_total) < t_valid).astype(x.dtype)[None]
        xp = jnp.pad(x, ((0, 0), (radius, radius)))
        phi_c = phi_c.astype(jnp.float32)
        cdim = phi_c.shape[-1]

        def one(params, i, vw):
            start = i * window
            x_ext = jax.lax.dynamic_slice(
                xp, (0, start), (1, window + 2 * radius)
            )
            pc = jax.lax.dynamic_slice(phi_c, (start, 0), (window, cdim))
            c2, gp = _window_terms(params, x_ext, vw, pc)
            r = (
                _window_reg(xp, start, i)
                if spec.gamma != 0.0
                else jnp.asarray(0.0, jnp.float32)
            )
            return c2, gp, r

        nl = len(spec.style_layer_ids)
        c_w = cfg.ae_width
        # _local_grams returns [C, L, L] ("ours") or [L, C, C] (gatys).
        gshape = (nl, c_w, c_w) if spec.gatys else (c_w, nl, nl)
        init = (
            jnp.zeros((), jnp.float32),
            jnp.zeros(gshape, jnp.float32),
            jnp.zeros((), jnp.float32),
        )
        w_ext = window + 2 * radius

        def static_vw(i):
            # Ext position p of window i is global sample i*window -
            # radius + p, valid iff it lies in [0, t_valid).
            return (max(0, radius - i * window),
                    min(w_ext, t_valid - i * window + radius))

        if split:
            # Edge windows (window 0 + the tail touching clip padding):
            # static valid windows, masked trunk, unrolled.
            csum, gsum, rsum = init
            for i in [*range(mid_lo), *range(mid_hi + 1, n_win)]:
                c2, gp, r = one(params, i, static_vw(i))
                csum, gsum, rsum = csum + c2, gsum + gp, rsum + r

            # Remat the window body: without it lax.scan stacks every
            # window's trunk residuals (taps + packed masks, ~130 MB
            # per full-geometry window) into [n_mid, rows, C] arrays
            # whose dynamic-update-slice shuffling measured ~10
            # ms/eval at 15 s — more than the recomputed forward
            # costs — and whose footprint scales with the clip.
            mid = jax.checkpoint(
                lambda p, i: one(p, i, None)  # fully valid window
            )

            def body(carry, i):
                cs, gs, rs = carry
                c2, gp, r = mid(params, i)
                return (cs + c2, gs + gp, rs + r), None

            (csum, gsum, rsum), _ = jax.lax.scan(
                body, (csum, gsum, rsum), jnp.arange(mid_lo, mid_hi + 1)
            )
        else:
            def body(carry, i):
                cs, gs, rs = carry
                # General dynamic valid window (radius > window means
                # interior windows can straddle the clip edges too, so
                # every window runs the masked trunk).
                lo = jnp.maximum(0, radius - i * window)
                hi = jnp.minimum(w_ext, t_valid - i * window + radius)
                c2, gp, r = one(params, i, (lo, hi))
                return (cs + c2, gs + gp, rs + r), None

            (csum, gsum, rsum), _ = jax.lax.scan(
                body, init, jnp.arange(n_win)
            )

        content_loss = csum / (t_valid * cdim) * 10.0
        gram = l2_normalize(gsum, axes=(1, 2))
        if spec.nb_channels < gram.shape[0] and not spec.gatys:
            gram = gram[: spec.nb_channels]
        style_loss = jnp.mean(jnp.square(gram - phi_s)) * 1e3
        total = content_loss + spec.lambd * style_loss
        if spec.gamma != 0.0:
            nfft = frame_length // 2 + 1
            total = total + spec.gamma * rsum / (n_frames * nfft)
        return total

    return loss


def make_scan_exact_embeds_fn(
    cfg: WaveNetAEConfig,
    spec: LossSpec,
    t_total: int,
    window: int = 32768,
    t_valid: int | None = None,
):
    """Target-building companion of :func:`make_scan_exact_loss_fn`:
    (params, x [1, t_total]) -> (content embed [t_total, C*], gram) with
    exact full-sequence semantics, one window-sized trace.  ``t_valid``
    as in the loss fn: positions past it are treated as clip padding
    (the returned content embed is zero there)."""
    t_valid = t_total if t_valid is None else t_valid
    if window >= t_total:
        if t_valid != t_total:
            raise ValueError(
                "single-window mode has no pad masking: trim to t_total"
            )
        return _single_window_exact_embeds_fn(cfg, spec)
    if t_total % window or window % 512:
        raise ValueError(
            f"t_total {t_total} must tile into 512-aligned windows of "
            f"{window}"
        )
    radius = _window_radius(cfg, align=2048)
    n_win = t_total // window
    needed = tuple(sorted(set(spec.cont_lyr_ids) | set(spec.style_layer_ids)))

    def embeds(params, x):
        if t_valid < t_total:
            x = x * (jnp.arange(t_total) < t_valid).astype(x.dtype)[None]
        xp = jnp.pad(x, ((0, 0), (radius, radius)))

        def body(gsum, i):
            start = i * window
            x_ext = jax.lax.dynamic_slice(
                xp, (0, start), (1, window + 2 * radius)
            )
            # General valid window (see make_scan_exact_loss_fn): runs
            # once per clip for target building, so the masked trunk is
            # fine for every window here.
            lo = jnp.maximum(0, radius - start)
            hi = jnp.minimum(
                window + 2 * radius, t_valid - start + radius
            )
            extracts = encoder_trunk(
                params, x_ext, cfg, valid_window=(lo, hi), needed_taps=needed
            )
            extracts = [
                None if e is None else e[:, radius:-radius, :]
                for e in extracts
            ]
            c_local = jnp.concatenate(
                [
                    extracts[i][:, :, : spec.cnt_channels]
                    for i in spec.cont_lyr_ids
                ],
                axis=2,
            )[0]
            gp = _window_grams(extracts, spec)
            return gsum + gp, c_local

        nl = len(spec.style_layer_ids)
        c_w = cfg.ae_width
        gshape = (nl, c_w, c_w) if spec.gatys else (c_w, nl, nl)
        gsum, c_wins = jax.lax.scan(
            body, jnp.zeros(gshape, jnp.float32), jnp.arange(n_win)
        )
        c = c_wins.reshape(t_total, -1)
        gram = l2_normalize(gsum, axes=(1, 2))
        if spec.nb_channels < gram.shape[0] and not spec.gatys:
            gram = gram[: spec.nb_channels]
        return c, gram

    return embeds
