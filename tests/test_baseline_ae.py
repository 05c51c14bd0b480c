import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_style_transfer_tpu.models.baseline_ae import (
    ENCODER_LAYERS,
    DECODER_LAYERS,
    BaselineHParams,
    compute_mse_loss,
    decode,
    encode,
    eval_interpolations,
    frequency_weighted_cost_mask,
    init_baseline_params,
    leaky_relu,
    pitch_embeddings,
    train_step_fn,
)

# Shallow CPU-testable geometry: 3 strided layers each way (full nfft_1024
# stack is exercised via shape bookkeeping in test_full_geometry_shapes).
SHALLOW_ENC = (
    ((5, 5), (2, 2), 16),
    ((4, 4), (2, 2), 16),
    ((4, 4), (2, 2), 32),
)
SHALLOW_DEC = (
    ((4, 4), (2, 2), 32),
    ((4, 4), (2, 2), 16),
    ((5, 5), (2, 2), 16),
)

# n_fft=64 so the frequency-weighted mask (n_fft//2 = 32 rows) matches the
# shallow spectrogram height used below.
HP = BaselineHParams(
    num_latent=8,
    pitch_embedding_dim=8,
    n_fft=64,
    encoder_spec=SHALLOW_ENC,
    decoder_spec=SHALLOW_DEC,
)


@pytest.fixture(scope="module")
def setup():
    params = init_baseline_params(jax.random.PRNGKey(0), HP)
    rng = np.random.RandomState(0)
    spec = jnp.asarray(rng.rand(2, 32, 16, 1).astype(np.float32))
    pitch = jnp.asarray([60, 64])
    return params, spec, pitch


def test_leaky_relu():
    x = jnp.asarray([-1.0, 2.0])
    np.testing.assert_allclose(np.asarray(leaky_relu(x)), [-0.1, 2.0])


def test_frequency_weighted_mask():
    m = np.asarray(frequency_weighted_cost_mask(10.0, hz_flat=1000, n_fft=512))
    assert m.shape == (1, 256, 1)
    assert m[0, 0, 0] == 10.0
    assert m[0, -1, 0] == 1.0


def test_full_geometry_shapes():
    """The default specs follow nfft_1024.py:48-229: 10 encoder layers with
    cumulative stride (512, 256) and 10 mirrored decoder layers."""
    assert len(ENCODER_LAYERS) == len(DECODER_LAYERS) == 10
    sh = sw = 1
    for (_, _), (a, b), _ in ENCODER_LAYERS:
        sh *= a
        sw *= b
    assert (sh, sw) == (512, 256)
    assert ENCODER_LAYERS[-1][2] == 1024
    assert DECODER_LAYERS[0][2] == 1024


def test_encode_decode_shapes(setup):
    params, spec, pitch = setup
    z, params1 = encode(params, spec, HP)
    assert z.shape == (2, 4, 2, HP.num_latent)
    xhat, _ = decode(params1, z, pitch, HP)
    assert xhat.shape == spec.shape
    assert np.asarray(xhat).min() >= 0 and np.asarray(xhat).max() <= 1


def test_pitch_embeddings_shape(setup):
    params, _, pitch = setup
    emb = pitch_embeddings(params, pitch, timesteps=4)
    assert emb.shape == (2, 1, 4, HP.pitch_embedding_dim)


def test_mse_loss_mag_only(setup):
    params, spec, _ = setup
    loss = compute_mse_loss(spec, spec * 0.9, HP)
    assert float(loss) > 0


def test_mse_loss_with_phase():
    hp = BaselineHParams(mag_only=False, n_fft=1024)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(1, 512, 8, 2).astype(np.float32))
    loss = compute_mse_loss(x, x * 0.5, hp)
    assert float(loss) > 0


def test_train_step_reduces_loss(setup):
    params, spec, pitch = setup
    step, init_state = train_step_fn(HP)
    step = jax.jit(step)
    state = init_state(params)
    batch = {"spectrogram": spec, "pitch": pitch}
    losses = []
    for _ in range(5):
        state, loss = step(state, batch)
        losses.append(float(loss))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_batchnorm_running_stats_update(setup):
    params, spec, pitch = setup
    _, params1 = encode(params, spec, HP, is_training=True)
    before = np.asarray(params["encoder"][0]["bn_mean"])
    after = np.asarray(params1["encoder"][0]["bn_mean"])
    assert not np.allclose(before, after)
    # eval mode: no update
    _, params2 = encode(params1, spec, HP, is_training=False)
    np.testing.assert_array_equal(
        np.asarray(params1["encoder"][0]["bn_mean"]),
        np.asarray(params2["encoder"][0]["bn_mean"]),
    )


def test_eval_interpolations(setup):
    params, spec, pitch = setup
    out = eval_interpolations(params, spec, pitch, HP)
    assert set(out) == {
        "reconstruction", "linear_interp_half", "pitch_plus_2", "pitch_minus_2",
    }
    for v in out.values():
        assert v.shape == spec.shape
