"""Time-sharded encoder must match the single-device encoder exactly."""

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from audio_style_transfer_tpu.models import WaveNetAEConfig, init_params
from audio_style_transfer_tpu.models.wavenet_ae import (
    encoder_extracts,
    receptive_field_radius,
)
from audio_style_transfer_tpu.parallel import make_mesh
from audio_style_transfer_tpu.parallel.halo import make_sharded_loss, time_sharded_trunk
from audio_style_transfer_tpu.signal import mu_law_numpy
from audio_style_transfer_tpu.transfer.losses import LossSpec, transfer_loss

SMALL = WaveNetAEConfig(
    num_layers=2,
    num_stages=2,
    width=8,
    skip_width=8,
    ae_num_layers=6,
    ae_num_stages=3,
    ae_width=8,
    ae_hop_length=64,
    ae_bottleneck_width=4,
)


def test_receptive_field_radius():
    assert receptive_field_radius(WaveNetAEConfig()) == 1 + 3 * (2**10 - 1)
    # SMALL: 1 + (1+2+4)*2 = 15
    assert receptive_field_radius(SMALL) == 15


def _setup(t=2048, seed=0):
    params = init_params(jax.random.PRNGKey(seed), SMALL)
    x = jnp.asarray(
        mu_law_numpy(np.random.RandomState(seed).uniform(-0.9, 0.9, (1, t))),
        jnp.float32,
    )
    return params, x


def test_sharded_trunk_matches_single_device():
    mesh = make_mesh(4, axis_name="time")
    params, x = _setup()

    ref_extracts, _ = encoder_extracts(params, x, SMALL)

    def fn(params, x_local):
        ext = time_sharded_trunk(params, x_local, SMALL, "time")
        return ext[-1], ext[0]

    sharded = shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(), P(None, "time")),
        out_specs=(P(None, "time"), P(None, "time")),
        check_vma=False,
    )
    bott, first = jax.jit(sharded)(params, x)
    np.testing.assert_allclose(
        np.asarray(bott), np.asarray(ref_extracts[-1]), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(first), np.asarray(ref_extracts[0]), rtol=1e-4, atol=1e-5
    )


def test_sharded_loss_and_gradient_match_single_device():
    """Loss AND full gradient equality vs the single-device program,
    including the STFT regularizer (gamma != 0): exactness is what lets
    L-BFGS consume the sharded value_and_grad unchanged."""
    mesh = make_mesh(4, axis_name="time")
    params, x = _setup(seed=1)
    spec = LossSpec(
        cont_lyr_ids=(5,),
        style_layer_ids=(0, 1, 2, 3, 4, 5),
        cnt_channels=8,
        nb_channels=8,
        lambd=10.0,
        gamma=0.01,  # exact sharded regularizer (halo.sharded_stft_l1)
    )
    # targets from a second clip
    _, x2 = _setup(seed=2)
    ref_extracts, _ = encoder_extracts(params, x2, SMALL)
    from audio_style_transfer_tpu.transfer.grams import content_embeds, style_gram

    phi_c = content_embeds(ref_extracts, spec.cont_lyr_ids, spec.cnt_channels)
    phi_s = style_gram(
        ref_extracts, spec.style_layer_ids, gatys=spec.gatys,
        nb_channels=spec.nb_channels,
    )

    ref_loss, ref_grad = jax.value_and_grad(
        lambda x: transfer_loss(params, x, phi_c, phi_s, SMALL, spec)[0]
    )(x)

    loss_fn = make_sharded_loss(params, phi_c, phi_s, SMALL, spec, mesh, "time")
    got, got_grad = jax.jit(jax.value_and_grad(loss_fn))(x)
    np.testing.assert_allclose(float(got), float(ref_loss), rtol=2e-4)

    ref_grad = np.asarray(ref_grad)
    got_grad = np.asarray(got_grad)
    assert float(np.max(np.abs(ref_grad))) > 0
    scale = np.max(np.abs(ref_grad))
    np.testing.assert_allclose(got_grad, ref_grad, rtol=1e-4, atol=1e-5 * scale)


def test_sharded_stft_regularizer_exact():
    """sharded_stft_l1 == single-device stft_l1 value and gradient, incl.
    the boundary-straddling frames the pre-round-2 code dropped."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from audio_style_transfer_tpu.parallel.halo import sharded_stft_l1
    from audio_style_transfer_tpu.signal.stft import stft_l1

    mesh = make_mesh(4, axis_name="time")
    t = 4096  # chunk 1024 per device; frames straddle every boundary
    a = jnp.asarray(np.random.RandomState(5).uniform(-0.9, 0.9, t), jnp.float32)

    def sharded(a):
        return shard_map(
            lambda al: sharded_stft_l1(al, "time"),
            mesh=mesh,
            in_specs=(P("time"),),
            out_specs=P(),
            check_vma=False,
        )(a)

    ref_v, ref_g = jax.value_and_grad(stft_l1)(a)
    got_v, got_g = jax.jit(jax.value_and_grad(sharded))(a)
    np.testing.assert_allclose(float(got_v), float(ref_v), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got_g), np.asarray(ref_g), rtol=1e-5, atol=1e-8
    )


def test_scan_exact_loss_and_gradient_match_single_device():
    """make_scan_exact_loss_fn (the single-device exact mode: lax.scan
    over fixed halo-extended windows) == the global transfer_loss, value
    AND gradient, including the STFT regularizer — same bar as the
    mesh-sharded flavour above."""
    from audio_style_transfer_tpu.parallel.halo import (
        make_scan_exact_embeds_fn,
        make_scan_exact_loss_fn,
    )
    from audio_style_transfer_tpu.transfer.grams import (
        content_embeds,
        style_gram,
    )

    params, x = _setup(seed=1)
    t = x.shape[1]
    spec = LossSpec(
        cont_lyr_ids=(5,),
        style_layer_ids=(0, 1, 2, 3, 4, 5),
        cnt_channels=8,
        nb_channels=8,
        lambd=10.0,
        gamma=0.01,
    )
    _, x2 = _setup(seed=2)
    ref_extracts, _ = encoder_extracts(params, x2, SMALL)
    phi_c = content_embeds(ref_extracts, spec.cont_lyr_ids, spec.cnt_channels)
    phi_s = style_gram(
        ref_extracts, spec.style_layer_ids, gatys=spec.gatys,
        nb_channels=spec.nb_channels,
    )

    ref_loss, ref_grad = jax.value_and_grad(
        lambda x: transfer_loss(params, x, phi_c, phi_s, SMALL, spec)[0]
    )(x)

    loss_fn = make_scan_exact_loss_fn(SMALL, spec, t, window=512)
    got, got_grad = jax.jit(jax.value_and_grad(
        lambda xx: loss_fn(params, xx, phi_c, phi_s)
    ))(x)
    np.testing.assert_allclose(float(got), float(ref_loss), rtol=2e-4)
    ref_grad = np.asarray(ref_grad)
    got_grad = np.asarray(got_grad)
    assert float(np.max(np.abs(ref_grad))) > 0
    scale = np.max(np.abs(ref_grad))
    np.testing.assert_allclose(got_grad, ref_grad, rtol=1e-4, atol=1e-5 * scale)

    # The target-building companion: same taps, same statistics.
    ref_c = content_embeds(
        encoder_extracts(params, x, SMALL)[0],
        spec.cont_lyr_ids, spec.cnt_channels,
    )
    embeds_fn = make_scan_exact_embeds_fn(SMALL, spec, t, window=512)
    got_c, got_g = jax.jit(embeds_fn)(params, x)
    np.testing.assert_allclose(
        np.asarray(got_c), np.asarray(ref_c), rtol=1e-4, atol=1e-5
    )
    ref_g = style_gram(
        encoder_extracts(params, x, SMALL)[0], spec.style_layer_ids,
        gatys=spec.gatys, nb_channels=spec.nb_channels,
    )
    np.testing.assert_allclose(
        np.asarray(got_g), np.asarray(ref_g), rtol=2e-4, atol=1e-6
    )


def test_scan_exact_split_path_matches_single_device():
    """The edge/middle split (radius <= window: interior windows run the
    UNMASKED trunk, only the two edge windows mask) must agree with the
    global loss exactly like the dynamic-masked fallback above."""
    from audio_style_transfer_tpu.parallel.halo import (
        _window_radius,
        make_scan_exact_loss_fn,
    )

    t = 8192
    params, x = _setup(t=t, seed=4)
    window = 2048
    assert _window_radius(SMALL, align=2048) <= window  # split engages
    spec = LossSpec(
        cont_lyr_ids=(5,),
        style_layer_ids=(0, 2, 4),
        cnt_channels=8,
        nb_channels=8,
        lambd=10.0,
        gamma=0.01,
    )
    _, x2 = _setup(t=t, seed=5)
    ref_extracts, _ = encoder_extracts(params, x2, SMALL)
    from audio_style_transfer_tpu.transfer.grams import content_embeds, style_gram

    phi_c = content_embeds(ref_extracts, spec.cont_lyr_ids, spec.cnt_channels)
    phi_s = style_gram(
        ref_extracts, spec.style_layer_ids, gatys=spec.gatys,
        nb_channels=spec.nb_channels,
    )
    ref_loss, ref_grad = jax.value_and_grad(
        lambda x: transfer_loss(params, x, phi_c, phi_s, SMALL, spec)[0]
    )(x)
    loss_fn = make_scan_exact_loss_fn(SMALL, spec, t, window=window)
    got, got_grad = jax.jit(jax.value_and_grad(
        lambda xx: loss_fn(params, xx, phi_c, phi_s)
    ))(x)
    np.testing.assert_allclose(float(got), float(ref_loss), rtol=2e-4)
    scale = np.max(np.abs(np.asarray(ref_grad)))
    np.testing.assert_allclose(
        np.asarray(got_grad), np.asarray(ref_grad), rtol=1e-4,
        atol=1e-5 * scale,
    )
