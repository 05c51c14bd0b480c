"""Tensor-parallel decoder == single-device decoder (logits, NLL, grads).

Runs on the virtual 8-device CPU mesh from tests/conftest.py, mirroring
the driver's dryrun environment (SURVEY.md §4 testing plan).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_style_transfer_tpu.models import WaveNetAEConfig, init_params
from audio_style_transfer_tpu.models.wavenet_ae import (
    decode_logits,
    encoder_extracts,
    nll_loss,
)
from audio_style_transfer_tpu.parallel import make_mesh
from audio_style_transfer_tpu.parallel.tensor import (
    tp_decode_logits,
    tp_prepare_decoder_params,
)
from audio_style_transfer_tpu.signal import mu_law_numpy

TINY = WaveNetAEConfig(
    num_layers=4,
    num_stages=2,
    width=16,
    skip_width=8,
    ae_num_layers=2,
    ae_num_stages=2,
    ae_width=8,
    ae_hop_length=32,
    ae_bottleneck_width=4,
)


def _setup(seed=0, batch=2, t=128):
    params = init_params(jax.random.PRNGKey(seed), TINY)
    rng = np.random.RandomState(seed)
    xq = jnp.asarray(mu_law_numpy(rng.uniform(-0.9, 0.9, (batch, t))), jnp.float32)
    _, encoding = encoder_extracts(params, xq, TINY)
    return params, xq, encoding


def test_prepare_is_a_relayout():
    """Re-laid-out params hold exactly the original values (gate halves
    interleaved, res+skip fused)."""
    params, _, _ = _setup()
    prep = tp_prepare_decoder_params(params, 4, TINY)
    w = np.asarray(params["dilatedconv_1"]["w"])
    w2 = np.asarray(prep["dilatedconv_1"]["w"])
    m = TINY.width // 4
    # device 0's chunk = first m sigmoid channels then first m tanh channels
    np.testing.assert_array_equal(w2[..., :m], w[..., :m])
    np.testing.assert_array_equal(w2[..., m : 2 * m],
                                  w[..., TINY.width : TINY.width + m])
    rs = np.asarray(prep["res_skip_1"]["w"])
    np.testing.assert_array_equal(rs[..., : TINY.width],
                                  np.asarray(params["res_1"]["w"]))
    np.testing.assert_array_equal(rs[..., TINY.width :],
                                  np.asarray(params["skip_1"]["w"]))


@pytest.mark.parametrize("n", [2, 4, 8])
def test_tp_logits_match_single_device(n):
    params, xq, encoding = _setup(seed=n)
    mesh = make_mesh(n, axis_name="model")
    ref = decode_logits(params, xq, encoding, TINY)
    got = tp_decode_logits(params, xq, encoding, TINY, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_tp_nll_and_param_gradients_match():
    """jax.grad through the TP decoder must equal the single-device grads on
    the ORIGINAL pytree (the relayout is differentiable), so a trainer can
    swap decoders without touching its optimizer state."""
    params, xq, encoding = _setup(seed=9)
    mesh = make_mesh(4, axis_name="model")

    def loss_single(p):
        return nll_loss(decode_logits(p, xq, encoding, TINY), xq)

    def loss_tp(p):
        return nll_loss(tp_decode_logits(p, xq, encoding, TINY, mesh), xq)

    l_ref, g_ref = jax.value_and_grad(loss_single)(params)
    l_tp, g_tp = jax.value_and_grad(loss_tp)(params)
    np.testing.assert_allclose(float(l_tp), float(l_ref), rtol=1e-6)

    flat_ref, _ = jax.tree.flatten(g_ref)
    flat_tp, tree_tp = jax.tree.flatten(g_tp)
    assert jax.tree.structure(g_ref) == tree_tp
    nonzero = 0
    for a, b in zip(flat_tp, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)
        nonzero += int(np.abs(np.asarray(b)).max() > 0)
    assert nonzero > len(flat_ref) // 2  # most grads genuinely nonzero


def test_tp_jits_under_mesh():
    params, xq, encoding = _setup(seed=3, batch=1, t=64)
    mesh = make_mesh(8, axis_name="model")
    fn = jax.jit(lambda p, x, e: tp_decode_logits(p, x, e, TINY, mesh))
    out = fn(params, xq, encoding)
    assert out.shape == (1, 64, TINY.quant_channels)
    assert bool(np.all(np.isfinite(np.asarray(out))))
