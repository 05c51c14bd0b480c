import jax
import jax.numpy as jnp
import numpy as np

from audio_style_transfer_tpu.generate.fastgen import (
    encode,
    incremental_logits,
    load_batch,
    save_batch,
    synthesize_jit,
)
from audio_style_transfer_tpu.models import WaveNetAEConfig, init_params
from audio_style_transfer_tpu.models.wavenet_ae import decode_logits, encoder_extracts
from audio_style_transfer_tpu.signal import mu_law_numpy
from audio_style_transfer_tpu.utils import write_wav

TINY = WaveNetAEConfig(
    num_layers=4,
    num_stages=2,
    width=8,
    skip_width=8,
    ae_num_layers=2,
    ae_num_stages=2,
    ae_width=8,
    ae_hop_length=32,
    ae_bottleneck_width=4,
)


def test_incremental_matches_teacher_forced():
    """The rolling-buffer decoder must equal the parallel decoder exactly.

    This is the functional-queue correctness oracle: reference FIFOQueue
    state (nsynth/utils.py:861-868) vs our circular buffers.
    """
    params = init_params(jax.random.PRNGKey(0), TINY)
    rng = np.random.RandomState(0)
    xq = jnp.asarray(mu_law_numpy(rng.uniform(-0.9, 0.9, (2, 128))), jnp.float32)
    _, encoding = encoder_extracts(params, xq, TINY)

    ref = decode_logits(params, xq, encoding, TINY)
    got = incremental_logits(params, xq, encoding, TINY)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-3, atol=1e-4)


def test_encode_shape():
    params = init_params(jax.random.PRNGKey(1), TINY)
    wav = np.random.RandomState(1).uniform(-0.5, 0.5, 100).astype(np.float32)
    enc = encode(wav, params, sample_length=100, cfg=TINY)
    # trimmed to 96 = 3 * hop(32)
    assert enc.shape == (1, 3, 4)


def test_synthesize_produces_audio():
    params = init_params(jax.random.PRNGKey(2), TINY)
    encodings = jnp.asarray(
        np.random.RandomState(2).randn(2, 3, 4).astype(np.float32) * 0.1
    )
    audio = np.asarray(
        jax.jit(synthesize_jit, static_argnums=3)(
            params, encodings, jax.random.PRNGKey(0), TINY
        )
    )
    assert audio.shape == (2, 3 * TINY.ae_hop_length)
    assert np.all(np.isfinite(audio))
    assert np.abs(audio).max() <= 1.0
    assert np.abs(audio).max() > 0  # not silence


def test_synthesize_deterministic_given_seed():
    params = init_params(jax.random.PRNGKey(3), TINY)
    encodings = jnp.zeros((1, 2, 4))
    fn = jax.jit(synthesize_jit, static_argnums=3)
    a = np.asarray(fn(params, encodings, jax.random.PRNGKey(7), TINY))
    b = np.asarray(fn(params, encodings, jax.random.PRNGKey(7), TINY))
    np.testing.assert_array_equal(a, b)


def test_load_batch_pads(tmp_path):
    p1, p2 = str(tmp_path / "a.wav"), str(tmp_path / "b.wav")
    write_wav(p1, np.ones(100, np.float32) * 0.1, 16000)
    write_wav(p2, np.ones(50, np.float32) * 0.1, 16000)
    batch = load_batch([p1, p2], sample_length=200)
    assert batch.shape == (2, 100)
    assert np.allclose(batch[1, 50:], 0)


def test_save_batch(tmp_path):
    paths = [str(tmp_path / "x.wav"), str(tmp_path / "y.wav")]
    save_batch(np.zeros((2, 64), np.float32), paths)
    import os

    assert all(os.path.exists(p) for p in paths)


def test_int8_quantization_error_bound():
    """Per-channel symmetric quantization: |w - dequant(w)| <= scale/2."""
    from audio_style_transfer_tpu.generate.fastgen import quantize_params_int8

    params = init_params(jax.random.PRNGKey(5), TINY)
    q = quantize_params_int8(params, min_size=1)
    n_quantized = 0
    for name, entry in q.items():
        if "w_q" not in entry:
            continue
        n_quantized += 1
        assert entry["w_q"].dtype == jnp.int8
        deq = entry["w_q"].astype(np.float32) * np.asarray(entry["w_scale"])
        err = np.abs(np.asarray(params[name]["w"]) - deq)
        bound = np.asarray(entry["w_scale"]) * 0.5 + 1e-9
        assert np.all(err <= bound), name
    assert n_quantized > 0


def test_int8_decoder_logits_close_to_f32():
    """int8 weights perturb the incremental decoder's logits only by the
    8-bit rounding — distributions must stay close to the f32 decoder's."""
    from audio_style_transfer_tpu.generate.fastgen import quantize_params_int8

    params = init_params(jax.random.PRNGKey(6), TINY)
    rng = np.random.RandomState(6)
    xq = jnp.asarray(mu_law_numpy(rng.uniform(-0.9, 0.9, (1, 64))), jnp.float32)
    _, encoding = encoder_extracts(params, xq, TINY)

    ref = np.asarray(incremental_logits(params, xq, encoding, TINY))
    got = np.asarray(
        incremental_logits(quantize_params_int8(params, min_size=1), xq,
                           encoding, TINY)
    )
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() <= 0.02 * scale + 2e-2


def test_int8_synthesize_produces_audio():
    from audio_style_transfer_tpu.generate.fastgen import quantize_params_int8

    params = quantize_params_int8(init_params(jax.random.PRNGKey(7), TINY),
                                  min_size=1)
    encodings = jnp.asarray(
        np.random.RandomState(7).randn(1, 2, 4).astype(np.float32) * 0.1
    )
    audio = np.asarray(
        jax.jit(synthesize_jit, static_argnums=3)(
            params, encodings, jax.random.PRNGKey(0), TINY
        )
    )
    assert audio.shape == (1, 2 * TINY.ae_hop_length)
    assert np.all(np.isfinite(audio))
    assert np.abs(audio).max() > 0
