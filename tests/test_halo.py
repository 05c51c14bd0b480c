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


def test_sharded_loss_matches_single_device():
    mesh = make_mesh(4, axis_name="time")
    params, x = _setup(seed=1)
    spec = LossSpec(
        cont_lyr_ids=(5,),
        style_layer_ids=(0, 1, 2, 3, 4, 5),
        cnt_channels=8,
        nb_channels=8,
        lambd=10.0,
        gamma=0.0,  # frame-straddling makes the sharded reg approximate
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

    ref_loss, _ = transfer_loss(params, x, phi_c, phi_s, SMALL, spec)

    loss_fn = make_sharded_loss(params, phi_c, phi_s, SMALL, spec, mesh, "time")
    got = jax.jit(loss_fn)(x)
    np.testing.assert_allclose(float(got), float(ref_loss), rtol=2e-4)

    # gradient flows through the collectives
    g = jax.grad(lambda x: loss_fn(x))(x)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0
