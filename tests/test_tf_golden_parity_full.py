"""Full-geometry golden parity vs a TensorFlow oracle (slow).

tests/test_tf_golden_parity.py proves tap-for-tap agreement at toy geometry;
this module repeats the proof at the REAL model geometry of the reference
(/root/reference/model.py:69-77: 30 encoder layers, width 128, hop 512,
bottleneck 16; 30 causal decoder layers, width 512, skip 256) on a
16384-sample clip — the north-star workload shape — plus a TF oracle for the
causal decoder (`decode_logits` + NLL, reference model.py:136-194) which the
toy test does not cover.

Depth matters: dilated-conv padding asymmetries or f32 accumulation drift
compound across 30 residual layers and only become visible at dilation 512 /
T=16384. Without the pretrained checkpoint in this environment (download
blocked, see BENCH_NOTES.md), agreement with TF's own kernels at full
geometry is the strongest available proof of the "losses within 1% of the TF
reference" north star.

The oracle uses tf.nn.conv1d's native `dilations` argument — an independent
implementation of the reference's time_to_batch + SAME/causal-pad semantics
(/root/reference/nsynth/wavenet/masked.py:57-160).

Runtime: ~2-4 min CPU (dominated by the width-512 TF decoder). Marked slow.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax
import jax.numpy as jnp

from audio_style_transfer_tpu.models import WaveNetAEConfig, init_params
from audio_style_transfer_tpu.models.wavenet_ae import (
    decode_logits,
    encoder_extracts,
    nll_loss,
)
from audio_style_transfer_tpu.signal import mu_law_numpy
from audio_style_transfer_tpu.transfer.grams import content_embeds, style_gram
from audio_style_transfer_tpu.transfer.losses import LossSpec, transfer_loss

pytestmark = pytest.mark.slow

CFG = WaveNetAEConfig()  # the real geometry — all defaults
T = 16384


# ---------------------------------------------------------------------------
# TF oracles
# ---------------------------------------------------------------------------

def _conv(params, h, name, dilation=1, causal=False):
    """Reference masked.conv1d semantics (masked.py:110-160): causal =
    left-pad (F-1)*dilation + VALID; non-causal = SAME (symmetric)."""
    w = tf.constant(np.asarray(params[name]["w"]), tf.float32)  # [F, Cin, Cout]
    b = tf.constant(np.asarray(params[name]["b"]), tf.float32)
    f = int(w.shape[0])
    if causal and f > 1:
        h = tf.pad(h, [[0, 0], [(f - 1) * dilation, 0], [0, 0]])
        pad = "VALID"
    else:
        pad = "SAME"
    return tf.nn.conv1d(h, w, stride=1, padding=pad, dilations=dilation) + b


def _tf_encoder(params, xq):
    """Tapped non-causal encoder oracle (reference model.py:88-128)."""
    x = tf.constant(xq, tf.float32)[:, :, None] / 128.0
    enc = _conv(params, x, "ae_startconv")
    extracts = []
    for k in range(1, CFG.ae_num_layers + 1):
        d = tf.nn.relu(enc)
        d = _conv(params, d, f"ae_dilatedconv_{k}", dilation=CFG.ae_dilation(k - 1))
        d = tf.nn.relu(d)
        d = _conv(params, d, f"ae_res_{k}")
        enc = enc + d
        extracts.append(enc)
    extracts.append(enc)  # enc_ alias tap (model.py:118-119)
    bottleneck = _conv(params, enc, "ae_bottleneck")
    extracts.append(bottleneck)
    pooled = tf.nn.avg_pool1d(
        bottleneck, CFG.ae_hop_length, CFG.ae_hop_length, padding="VALID"
    )
    return extracts, pooled


def _tf_condition(x, encoding):
    """Block-broadcast conditioning (reference model.py:34-55)."""
    mb, length, channels = x.shape
    enc_length = encoding.shape[1]
    x = tf.reshape(x, [mb, enc_length, -1, channels])
    x += tf.reshape(encoding, [mb, enc_length, 1, channels])
    return tf.reshape(x, [mb, length, channels])


def _tf_decoder_nll(params, xq, encoding):
    """Causal gated decoder + mu-law NLL oracle (reference model.py:136-194)."""
    x = tf.constant(xq, tf.float32)[:, :, None] / 128.0
    # shift_right (masked.py:24-37): pad one zero at front, drop last.
    l = tf.pad(x, [[0, 0], [1, 0], [0, 0]])[:, : x.shape[1], :]
    l = _conv(params, l, "startconv", causal=True)
    s = _conv(params, l, "skip_start")
    for i in range(1, CFG.num_layers + 1):
        d = _conv(params, l, f"dilatedconv_{i}",
                  dilation=CFG.dilation(i - 1), causal=True)
        d = _tf_condition(d, _conv(params, encoding, f"cond_map_{i}"))
        m = d.shape[2] // 2
        d = tf.sigmoid(d[:, :, :m]) * tf.tanh(d[:, :, m:])
        l = l + _conv(params, d, f"res_{i}")
        s = s + _conv(params, d, f"skip_{i}")
    s = tf.nn.relu(s)
    s = _conv(params, s, "out1")
    s = _tf_condition(s, _conv(params, encoding, "cond_map_out1"))
    s = tf.nn.relu(s)
    logits = _conv(params, s, "logits")
    flat = tf.reshape(logits, [-1, 256])
    labels = tf.cast(tf.reshape(tf.constant(xq), [-1]), tf.int32) + 128
    nll = tf.reduce_mean(
        tf.nn.sparse_softmax_cross_entropy_with_logits(logits=flat, labels=labels)
    )
    return logits, nll


# ---------------------------------------------------------------------------
# Fixtures
# ---------------------------------------------------------------------------

def _clip(seed):
    """A mu-law-quantized 16384-sample clip with tonal structure (so the
    deep taps carry signal, not just bias offsets)."""
    rng = np.random.RandomState(seed)
    t = np.arange(T) / 16000.0
    f0 = rng.uniform(100, 400)
    a = sum(
        rng.uniform(0.1, 0.4) * np.sin(2 * np.pi * f0 * (h + 1) * t + rng.uniform(0, 6))
        for h in range(4)
    )
    a = 0.8 * a / np.max(np.abs(a)) + 0.05 * rng.randn(T)
    return mu_law_numpy(np.clip(a, -1, 1))[None].astype(np.float32)


@pytest.fixture(scope="module")
def setup():
    params = init_params(jax.random.PRNGKey(7), CFG)
    return params, _clip(0), _clip(1)


@pytest.fixture(scope="module")
def oracle(setup):
    params, xc, _ = setup
    extracts, pooled = _tf_encoder(params, xc)
    return [e.numpy() for e in extracts], pooled.numpy()


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------

def test_all_32_taps_match_tf_at_full_geometry(setup, oracle):
    params, xc, _ = setup
    theirs, tf_encoding = oracle
    ours, our_encoding = encoder_extracts(params, jnp.asarray(xc), CFG)
    assert len(ours) == len(theirs) == CFG.ae_num_layers + 2
    worst = 0.0
    for i, (a, b) in enumerate(zip(ours, theirs)):
        a = np.asarray(a)
        scale = np.max(np.abs(b))
        rel = np.max(np.abs(a - b)) / scale
        worst = max(worst, rel)
        assert rel < 1e-4, f"tap {i}: max rel deviation {rel:.2e} vs TF oracle"
    # Measured ~1e-6 relative at depth 30 / dilation 512 (f32); the 1e-4
    # bound leaves two orders of headroom while staying far under the 1%
    # north-star budget.
    np.testing.assert_allclose(
        np.asarray(our_encoding), tf_encoding, rtol=1e-4, atol=1e-4
    )


def test_transfer_loss_value_matches_tf_pipeline(setup, oracle):
    """End-to-end loss parity: target embeds AND the loss value itself are
    computed twice — once fully in TF from oracle activations exactly as
    methods.py:58-76,113-125, once through our pipeline — and must agree
    well within the 1% north-star budget."""
    params, xc, xs = setup
    spec = LossSpec()  # full stack, cont (29,), lambd 100

    # --- TF side ---
    def tf_phi(extracts):
        stl = tf.concat([extracts[i] for i in spec.style_layer_ids], axis=0)
        stl = tf.transpose(stl, perm=[2, 0, 1])
        g = tf.linalg.matmul(stl, tf.transpose(stl, perm=[0, 2, 1]))
        g = tf.math.l2_normalize(g, axis=(1, 2))
        cont = tf.concat([extracts[i] for i in spec.cont_lyr_ids], axis=0)
        return cont[0, :, : spec.cnt_channels], g

    exc, _ = oracle
    exc = [tf.constant(e) for e in exc]
    exs, _ = _tf_encoder(params, xs)
    phi_c_tf, _ = tf_phi(exc)
    _, phi_s_tf = tf_phi(exs)
    # Loss of the style clip's waveform against (content=xc, style=xs)
    # targets — non-trivial on both terms.
    cx, gx = tf_phi(exs)
    content_tf = tf.reduce_mean(tf.square(cx - phi_c_tf)) * 10.0
    style_tf = tf.reduce_mean(tf.square(gx - phi_s_tf)) * 1e3
    loss_tf = float(content_tf + spec.lambd * style_tf)

    # --- our side (independent end to end) ---
    ours_c, _ = encoder_extracts(params, jnp.asarray(xc), CFG)
    phi_c = content_embeds(ours_c, spec.cont_lyr_ids, spec.cnt_channels)
    ours_s, _ = encoder_extracts(params, jnp.asarray(xs), CFG)
    phi_s = style_gram(ours_s, spec.style_layer_ids, gatys=spec.gatys,
                       nb_channels=spec.nb_channels)
    loss_ours, parts = transfer_loss(
        params, jnp.asarray(xs), phi_c, phi_s, CFG, spec
    )
    loss_ours = float(loss_ours)

    assert abs(loss_ours - loss_tf) / abs(loss_tf) < 1e-3, (
        f"transfer loss: ours {loss_ours} vs TF {loss_tf}"
    )
    # style term is pure-style-vs-style => ~0; content term carries the value
    assert float(parts["style_loss"]) < 1e-6


def test_decoder_logits_and_nll_match_tf(setup, oracle):
    """Causal decoder oracle — the toy suite only checks the decoder against
    itself (incremental == teacher-forced); this pins the causal padding,
    conditioning broadcast, and NLL to TF at full geometry."""
    params, xc, _ = setup
    _, tf_encoding = oracle
    encoding = jnp.asarray(tf_encoding)

    ours_logits = decode_logits(params, jnp.asarray(xc), encoding, CFG)
    ours_nll = float(nll_loss(ours_logits, jnp.asarray(xc)))

    tf_logits, tf_nll = _tf_decoder_nll(params, xc, tf.constant(tf_encoding))
    tf_logits = tf_logits.numpy()
    tf_nll = float(tf_nll)

    scale = np.max(np.abs(tf_logits))
    rel = np.max(np.abs(np.asarray(ours_logits) - tf_logits)) / scale
    assert rel < 1e-4, f"decoder logits: max rel deviation {rel:.2e}"
    assert abs(ours_nll - tf_nll) / tf_nll < 1e-4, (
        f"NLL: ours {ours_nll} vs TF {tf_nll}"
    )


def test_first_sample_causality(setup):
    """shift_right + causal padding => logits[t] depend only on x[<t] and the
    encoding. Perturbing the LAST input sample must leave every logit before
    it unchanged (catches any symmetric-pad leak in the causal stack)."""
    params, xc, _ = setup
    # tiny decoder geometry is enough for the causality property; keep the
    # real dilation schedule depth
    xq = jnp.asarray(xc[:, :2048])
    _, encoding = encoder_extracts(params, xq, CFG)
    base = decode_logits(params, xq, encoding, CFG)
    bumped = decode_logits(params, xq.at[0, -1].add(10.0), encoding, CFG)
    np.testing.assert_array_equal(
        np.asarray(base[:, :-1]), np.asarray(bumped[:, :-1])
    )
