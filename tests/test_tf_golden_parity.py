"""Golden numerical parity: our JAX encoder vs a TensorFlow oracle.

SURVEY.md hard-part #1 is checkpoint/activation fidelity. Without the
pretrained NSynth checkpoint in this environment, the strongest available
evidence is exact agreement with TensorFlow's own dilated-convolution
semantics (the reference's compute substrate): build the same tapped
encoder in TF with identical random weights and compare activations
layer by layer, plus the gram/loss statistics built on top.

The TF oracle below uses tf.nn.conv1d's native `dilations` argument — not
the reference's time_to_batch reshape — so it is an independent
implementation of the same math on the original framework.

Skipped when TensorFlow is unavailable.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax
import jax.numpy as jnp

from audio_style_transfer_tpu.models import WaveNetAEConfig, init_params
from audio_style_transfer_tpu.models.wavenet_ae import encoder_extracts
from audio_style_transfer_tpu.signal import mu_law_numpy
from audio_style_transfer_tpu.transfer.grams import content_embeds, style_gram

CFG = WaveNetAEConfig(
    ae_num_layers=6,
    ae_num_stages=3,
    ae_width=16,
    ae_hop_length=64,
    ae_bottleneck_width=4,
    # decoder side unused here but keep it tiny
    num_layers=2,
    num_stages=2,
    width=8,
    skip_width=8,
)


def _tf_encoder(params, x_quantized):
    """TF oracle of the tapped encoder (reference model.py:88-128 semantics)."""
    x = tf.constant(x_quantized, tf.float32) / 128.0
    x = x[:, :, None]  # [B, T, 1]

    def conv(h, name, dilation=1):
        w = tf.constant(np.asarray(params[name]["w"]), tf.float32)  # [F, Cin, Cout]
        b = tf.constant(np.asarray(params[name]["b"]), tf.float32)
        return tf.nn.conv1d(h, w, stride=1, padding="SAME",
                            dilations=dilation) + b

    enc = conv(x, "ae_startconv")
    extracts = []
    for k in range(1, CFG.ae_num_layers + 1):
        d = tf.nn.relu(enc)
        d = conv(d, f"ae_dilatedconv_{k}", dilation=CFG.ae_dilation(k - 1))
        d = tf.nn.relu(d)
        d = conv(d, f"ae_res_{k}")
        enc = enc + d
        extracts.append(enc)
    extracts.append(enc)
    bottleneck = conv(enc, "ae_bottleneck")
    extracts.append(bottleneck)
    pooled = tf.nn.avg_pool1d(bottleneck, CFG.ae_hop_length, CFG.ae_hop_length,
                              padding="VALID")
    return [e.numpy() for e in extracts], pooled.numpy()


@pytest.fixture(scope="module")
def setup():
    params = init_params(jax.random.PRNGKey(3), CFG)
    rng = np.random.RandomState(0)
    xq = mu_law_numpy(rng.uniform(-0.9, 0.9, (1, 512))).astype(np.float32)
    return params, xq


def test_every_tap_matches_tensorflow(setup):
    params, xq = setup
    ours, our_encoding = encoder_extracts(params, jnp.asarray(xq), CFG)
    theirs, tf_encoding = _tf_encoder(params, xq)
    assert len(ours) == len(theirs)
    for i, (a, b) in enumerate(zip(ours, theirs)):
        np.testing.assert_allclose(
            np.asarray(a), b, rtol=1e-4, atol=1e-4,
            err_msg=f"tap {i} diverges from the TF oracle",
        )
    np.testing.assert_allclose(np.asarray(our_encoding), tf_encoding,
                               rtol=1e-4, atol=1e-5)


def test_gram_statistics_match_tf_pipeline(setup):
    """The full methods.py feature pipeline on TF activations equals ours."""
    params, xq = setup
    ours, _ = encoder_extracts(params, jnp.asarray(xq), CFG)
    theirs, _ = _tf_encoder(params, xq)

    ids = list(range(CFG.ae_num_layers))
    our_gram = np.asarray(style_gram(ours, ids, gatys=False, nb_channels=16))
    # TF-side gram exactly as methods.py:62-76
    stl = tf.concat([tf.constant(theirs[i]) for i in ids], axis=0)
    stl = tf.transpose(stl, perm=[2, 0, 1])
    g = tf.linalg.matmul(stl, tf.transpose(stl, perm=[0, 2, 1]))
    g = tf.math.l2_normalize(g, axis=(1, 2)).numpy()
    np.testing.assert_allclose(our_gram, g, rtol=1e-3, atol=1e-4)

    our_content = np.asarray(content_embeds(ours, [5], cnt_channels=16))
    np.testing.assert_allclose(our_content, theirs[5][0], rtol=1e-4, atol=1e-4)


def test_mu_law_matches_tf_formula(setup):
    """Continuous mu-law (nsynth/utils.py:88-102) vs the TF expression."""
    from audio_style_transfer_tpu.signal.mu_law import mu_law

    x = np.random.RandomState(1).uniform(-1, 1, 1000).astype(np.float32)
    tf_out = (
        tf.sign(x) * tf.math.log(1.0 + 255.0 * tf.abs(x)) / np.log(1.0 + 255.0)
    ) * 128.0
    np.testing.assert_allclose(
        np.asarray(mu_law(jnp.asarray(x))), tf_out.numpy(), rtol=1e-5, atol=1e-5
    )
