import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_style_transfer_tpu.ckpt import load_params, save_params
from audio_style_transfer_tpu.models import (
    WaveNetAEConfig,
    decode_logits,
    encoder_extracts,
    forward,
    init_params,
)
from audio_style_transfer_tpu.models.wavenet_ae import _conv_shapes, nll_loss
from audio_style_transfer_tpu.signal import mu_law_numpy

SMALL = WaveNetAEConfig(
    num_layers=4,
    num_stages=2,
    width=16,
    skip_width=8,
    ae_num_layers=4,
    ae_num_stages=2,
    ae_width=8,
    ae_hop_length=64,
    ae_bottleneck_width=4,
)


def _x(bsz=1, t=256, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(mu_law_numpy(rng.uniform(-0.9, 0.9, size=(bsz, t))), jnp.float32)


def test_param_shapes_cover_reference_inventory():
    shapes = _conv_shapes(WaveNetAEConfig())
    # 2 + 2*30 encoder convs, 2 + 4*30 decoder convs + out1/cond_map_out1/logits
    assert len(shapes) == (2 + 60) + (2 + 120 + 3)
    assert shapes["ae_dilatedconv_5"] == (3, 128, 128)
    assert shapes["cond_map_out1"] == (1, 16, 256)
    assert shapes["logits"] == (1, 256, 256)
    assert shapes["startconv"] == (3, 1, 512)


def test_extracts_contract():
    params = init_params(jax.random.PRNGKey(0), SMALL)
    extracts, encoding = encoder_extracts(params, _x(), SMALL)
    assert len(extracts) == SMALL.ae_num_layers + 2
    # extracts[-2] is the enc_ alias of the last trunk state (model.py:118-119)
    np.testing.assert_array_equal(
        np.asarray(extracts[-2]), np.asarray(extracts[SMALL.ae_num_layers - 1])
    )
    assert extracts[-1].shape == (1, 256, SMALL.ae_bottleneck_width)
    assert encoding.shape == (1, 256 // SMALL.ae_hop_length, SMALL.ae_bottleneck_width)


def test_encoder_taps_shape_full_geometry():
    cfg = WaveNetAEConfig()
    params = init_params(jax.random.PRNGKey(1), cfg)
    x = _x(t=2048)
    extracts, encoding = encoder_extracts(params, x, cfg)
    assert len(extracts) == 32
    assert extracts[0].shape == (1, 2048, 128)
    assert extracts[31].shape == (1, 2048, 16)
    assert encoding.shape == (1, 4, 16)


def test_forward_full_dict():
    params = init_params(jax.random.PRNGKey(2), SMALL)
    out = forward(params, {"quantized_wav": _x()}, SMALL)
    assert set(out) >= {
        "predictions", "loss", "eval", "quantized_input", "encoding", "before_enc",
    }
    assert np.isfinite(float(out["loss"]))
    # predictions are a softmax over 256 bins
    p = np.asarray(out["predictions"])
    assert p.shape == (256, 256)
    np.testing.assert_allclose(p.sum(-1), 1.0, rtol=1e-4)


def test_forward_wav_input_continuous_mu_law():
    params = init_params(jax.random.PRNGKey(3), SMALL)
    wav = jnp.asarray(np.random.RandomState(1).uniform(-0.5, 0.5, (1, 256)), jnp.float32)
    out = forward(params, {"wav": wav}, SMALL)
    q = np.asarray(out["quantized_input"])
    assert not np.allclose(q, np.floor(q))  # continuous variant


def test_decoder_causality():
    params = init_params(jax.random.PRNGKey(4), SMALL)
    x = _x(t=256, seed=5)
    _, encoding = encoder_extracts(params, x, SMALL)
    logits = decode_logits(params, x, encoding, SMALL)
    # Perturb the last quarter of the input; logits before it must not change
    # (conditioning is constant because the perturbed region shares no hop
    # window with the checked region).
    x2 = x.at[:, 192:].add(17.0)
    logits2 = decode_logits(params, x2, encoding, SMALL)
    np.testing.assert_allclose(
        np.asarray(logits[:, :192]), np.asarray(logits2[:, :192]), rtol=1e-4, atol=1e-4
    )


def test_nll_matches_manual():
    rng = np.random.RandomState(7)
    logits = jnp.asarray(rng.randn(1, 16, 256).astype(np.float32))
    xq = jnp.asarray(rng.randint(-128, 128, size=(1, 16)).astype(np.float32))
    got = float(nll_loss(logits, xq))
    lp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    labels = np.asarray(xq).astype(int) + 128
    ref = -np.mean([lp[0, i, labels[0, i]] for i in range(16)])
    assert abs(got - ref) < 1e-5


def test_params_npz_round_trip(tmp_path):
    params = init_params(jax.random.PRNGKey(8), SMALL)
    p = str(tmp_path / "params.npz")
    save_params(p, params)
    loaded = load_params(p)
    assert set(loaded) == set(params)
    for layer in params:
        np.testing.assert_array_equal(
            np.asarray(params[layer]["w"]), np.asarray(loaded[layer]["w"])
        )


def test_jit_encoder_grad_flows():
    params = init_params(jax.random.PRNGKey(9), SMALL)

    @jax.jit
    def loss_fn(xq):
        extracts, _ = encoder_extracts(params, xq, SMALL)
        return jnp.mean(extracts[-1] ** 2)

    g = jax.grad(loss_fn)(_x())
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0
