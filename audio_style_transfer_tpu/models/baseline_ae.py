"""Baseline spectral conv-autoencoder (reference nsynth/baseline).

Re-provides the capability documented (but import-broken as vendored, see
SURVEY.md §1) by reference nsynth/baseline/models/ae.py and
ae_configs/nfft_1024.py: an 11-layer strided conv encoder over (log-mag,
dphase) spectrograms, a pitch-conditioned transpose-conv decoder, and the
frequency-weighted magnitude/phase MSE loss.

Design notes:
* batch norm is functional — running statistics live in the params pytree
  and updated copies are returned from training applications;
* conv/transpose-conv run in NHWC via lax.conv_general_dilated, bf16-ready;
* hparams mirror ae.py:38-64 with the nfft_1024 overrides (nfft_1024.py:25-31).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class BaselineHParams:
    """reference ae.py:38-64 defaults + nfft_1024.py:25-31 overrides."""

    batch_size: int = 8
    learning_rate: float = 1e-4
    adam_beta: float = 0.5
    num_latent: int = 1984
    n_fft: int = 1024
    hop_length: int = 256
    mask: bool = True
    log_mag: bool = True
    re_im: bool = False
    dphase: bool = True
    mag_only: bool = True
    pad: bool = True
    raw_audio: bool = False
    samples_per_second: int = 16000
    num_samples: int = 64000
    cost_phase_mask: bool = False
    phase_loss_coeff: float = 1.0
    fw_loss_coeff: float = 10.0
    fw_loss_cutoff: int = 4000
    n_pitches: int = 128
    pitch_embedding_dim: int = 128
    # layer specs: ((kh, kw), (sh, sw), channels). Defaults are the
    # nfft_1024 geometry; tests use shallow variants.
    encoder_spec: tuple = None  # type: ignore[assignment]
    decoder_spec: tuple = None  # type: ignore[assignment]

    @property
    def enc_layers(self):
        return self.encoder_spec or ENCODER_LAYERS

    @property
    def dec_layers(self):
        return self.decoder_spec or DECODER_LAYERS


# (kernel hw, stride hw, channels) per encoder layer — nfft_1024.py:48-118
ENCODER_LAYERS = [
    ((5, 5), (2, 2), 128),
    ((4, 4), (2, 2), 128),
    ((4, 4), (2, 2), 128),
    ((4, 4), (2, 2), 256),
    ((4, 4), (2, 2), 256),
    ((4, 4), (2, 2), 256),
    ((4, 4), (2, 2), 512),
    ((4, 4), (2, 2), 512),
    ((4, 4), (2, 1), 512),
    ((1, 1), (1, 1), 1024),
]

# decoder mirror — nfft_1024.py:150-229
DECODER_LAYERS = [
    ((1, 1), (1, 1), 1024),
    ((4, 4), (2, 2), 512),
    ((4, 4), (2, 2), 512),
    ((4, 4), (2, 2), 256),
    ((4, 4), (2, 2), 256),
    ((4, 4), (2, 2), 256),
    ((4, 4), (2, 2), 128),
    ((4, 4), (2, 2), 128),
    ((5, 5), (2, 2), 128),
    ((5, 5), (2, 1), 128),
]


def leaky_relu(x, leak: float = 0.1):
    """reference nsynth/utils.py:825-835."""
    return jnp.maximum(x, leak * x)


def _conv_init(key, kh, kw, cin, cout):
    # Xavier/Glorot uniform (slim default in the reference's arg scope).
    limit = float(np.sqrt(6.0 / (kh * kw * cin + kh * kw * cout)))
    return jax.random.uniform(key, (kh, kw, cin, cout), jnp.float32, -limit, limit)


def init_baseline_params(
    rng: jax.Array, hparams: BaselineHParams | None = None, in_channels: int = 1
):
    hparams = hparams or BaselineHParams()
    params = {"encoder": [], "decoder": []}
    keys = jax.random.split(
        rng, len(hparams.enc_layers) + len(hparams.dec_layers) + 4
    )
    ki = 0

    cin = in_channels
    for (kh, kw), _, cout in hparams.enc_layers:
        params["encoder"].append(_make_bn_conv(keys[ki], kh, kw, cin, cout))
        cin = cout
        ki += 1
    params["z_proj"] = _make_bn_conv(keys[ki], 1, 1, cin, hparams.num_latent)
    ki += 1

    cin = hparams.num_latent + hparams.pitch_embedding_dim
    for (kh, kw), _, cout in hparams.dec_layers:
        params["decoder"].append(_make_bn_conv(keys[ki], kh, kw, cin, cout))
        cin = cout
        ki += 1
    params["mag_out"] = {
        "w": _conv_init(keys[ki], 1, 1, cin, in_channels),
        "b": jnp.zeros((in_channels,)),
    }
    ki += 1
    params["pitch_embedding"] = {
        "w": jax.random.normal(
            keys[ki], (hparams.n_pitches, hparams.pitch_embedding_dim)
        )
    }
    return params


def _make_bn_conv(key, kh, kw, cin, cout):
    return {
        "w": _conv_init(key, kh, kw, cin, cout),
        "b": jnp.zeros((cout,)),
        "bn_scale": jnp.ones((cout,)),
        "bn_bias": jnp.zeros((cout,)),
        "bn_mean": jnp.zeros((cout,)),
        "bn_var": jnp.ones((cout,)),
    }


def _conv2d(x, w, stride):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def _conv2d_transpose(x, w, stride):
    return jax.lax.conv_transpose(
        x, w, strides=stride, padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _batch_norm(x, layer, is_training: bool, decay: float = 0.999,
                eps: float = 0.001):
    """Functional BN; returns (y, updated_layer)."""
    if is_training:
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.var(x, axis=(0, 1, 2))
        new_layer = dict(
            layer,
            bn_mean=decay * layer["bn_mean"] + (1 - decay) * mean,
            bn_var=decay * layer["bn_var"] + (1 - decay) * var,
        )
    else:
        mean, var = layer["bn_mean"], layer["bn_var"]
        new_layer = layer
    y = (x - mean) * jax.lax.rsqrt(var + eps) * layer["bn_scale"] + layer["bn_bias"]
    return y, new_layer


def _bn_conv(x, layer, stride, is_training, transpose=False, activate=True):
    conv = _conv2d_transpose if transpose else _conv2d
    y = conv(x, layer["w"], stride) + layer["b"]
    y, new_layer = _batch_norm(y, layer, is_training)
    if activate:
        y = leaky_relu(y)
    return y, new_layer


def encode(params, x, hparams: BaselineHParams | None = None,
           is_training: bool = True):
    """Spectrogram [B, H, W, C] -> latent z (reference nfft_1024.py:34-127).

    Returns (z, updated_params).
    """
    hparams = hparams or BaselineHParams()
    new_enc = []
    h = x
    for layer, ((_, _), stride, _) in zip(params["encoder"], hparams.enc_layers):
        h, nl = _bn_conv(h, layer, stride, is_training)
        new_enc.append(nl)
    z, nz = _bn_conv(h, params["z_proj"], (1, 1), is_training, activate=False)
    new_params = dict(params, encoder=new_enc, z_proj=nz)
    return z, new_params


def pitch_embeddings(params, pitch, timesteps: int = 1):
    """One-hot pitch -> linear embedding (reference nsynth/utils.py:662-691).

    Returns [B, 1, timesteps, dim].
    """
    w = params["pitch_embedding"]["w"]
    one_hot = jax.nn.one_hot(pitch.reshape(-1), w.shape[0])
    emb = (one_hot @ w)[:, None, None, :]
    if timesteps > 1:
        emb = jnp.tile(emb, (1, 1, timesteps, 1))
    return emb


def decode(params, z, pitch, hparams: BaselineHParams | None = None,
           is_training: bool = True):
    """Latent + pitch -> reconstructed spectrogram (nfft_1024.py:130-238).

    Returns (xhat, updated_params).
    """
    hparams = hparams or BaselineHParams()
    z_pitch = pitch_embeddings(params, pitch, timesteps=z.shape[2])
    z_pitch = jnp.broadcast_to(
        z_pitch, (z.shape[0], z.shape[1], z.shape[2], z_pitch.shape[-1])
    )
    h = jnp.concatenate([z, z_pitch], axis=3)
    new_dec = []
    for layer, ((_, _), stride, _) in zip(params["decoder"], hparams.dec_layers):
        h, nl = _bn_conv(h, layer, stride, is_training, transpose=True)
        new_dec.append(nl)
    xhat = jax.nn.sigmoid(
        _conv2d(h, params["mag_out"]["w"], (1, 1)) + params["mag_out"]["b"]
    )
    return xhat, dict(params, decoder=new_dec)


def frequency_weighted_cost_mask(peak: float = 10.0, hz_flat: float = 1000,
                                 sr: int = 16000, n_fft: int = 512):
    """Low-frequency-weighted loss mask (reference nsynth/utils.py:639-656)."""
    n = n_fft // 2
    fft_freqs = np.arange(1 + n_fft // 2) * sr / n_fft
    cutoff = int(np.where(fft_freqs >= hz_flat)[0][0])
    mask = np.concatenate([np.linspace(peak, 1.0, cutoff), np.ones(n - cutoff)])
    return jnp.asarray(mask[None, :, None], jnp.float32)


def compute_mse_loss(x, xhat, hparams: BaselineHParams | None = None):
    """Freq-weighted mag + phase MSE (reference ae.py:73-111)."""
    hparams = hparams or BaselineHParams()
    if hparams.raw_audio:
        return jnp.mean((x - xhat) ** 2)
    m = x[..., 0] if hparams.cost_phase_mask else 1.0
    fm = frequency_weighted_cost_mask(
        hparams.fw_loss_coeff, hz_flat=hparams.fw_loss_cutoff, n_fft=hparams.n_fft
    )
    mag_loss = jnp.mean(fm * (x[..., 0] - xhat[..., 0]) ** 2)
    if hparams.mag_only:
        return mag_loss
    if hparams.dphase:
        phase_loss = jnp.mean(fm * m * (x[..., 1] - xhat[..., 1]) ** 2)
    else:
        phase_loss = 1 - jnp.mean(
            fm * m * jnp.cos((x[..., 1] - xhat[..., 1]) * np.pi)
        )
    return mag_loss + hparams.phase_loss_coeff * phase_loss


def train_step_fn(hparams: BaselineHParams | None = None):
    """Build a jittable (state, batch) -> (state, loss) Adam step
    (reference ae.py:114-160: Adam(lr, beta1=0.5))."""
    import optax

    hparams = hparams or BaselineHParams()
    opt = optax.adam(hparams.learning_rate, b1=hparams.adam_beta)

    def loss_fn(params, spec, pitch):
        z, params1 = encode(params, spec, hparams, is_training=True)
        xhat, params2 = decode(params1, z, pitch, hparams, is_training=True)
        return compute_mse_loss(spec, xhat, hparams), params2

    def step(state, batch):
        (loss, new_params), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"], batch["spectrogram"], batch["pitch"]
        )
        updates, opt_state = opt.update(grads, state["opt_state"], state["params"])
        params = optax.apply_updates(new_params, updates)
        return dict(params=params, opt_state=opt_state,
                    step=state["step"] + 1), loss

    def init_state(params):
        return dict(params=params, opt_state=opt.init(params),
                    step=jnp.zeros((), jnp.int32))

    return step, init_state


def eval_interpolations(params, spec, pitch, hparams: BaselineHParams | None = None):
    """Latent interpolation + pitch-shift decodes (reference ae.py:207-226)."""
    hparams = hparams or BaselineHParams()
    z, _ = encode(params, spec, hparams, is_training=False)
    xhat, _ = decode(params, z, pitch, hparams, is_training=False)

    z_shift = jnp.concatenate([z[1:], z[:1]], 0)
    z_half = (z + z_shift) / 2.0
    xhat_half, _ = decode(params, z_half, pitch, hparams, is_training=False)

    p_plus = jnp.clip(pitch + 2, 0, 127)
    p_minus = jnp.clip(pitch - 2, 0, 127)
    xhat_up, _ = decode(params, z, p_plus, hparams, is_training=False)
    xhat_down, _ = decode(params, z, p_minus, hparams, is_training=False)
    return {
        "reconstruction": xhat,
        "linear_interp_half": xhat_half,
        "pitch_plus_2": xhat_up,
        "pitch_minus_2": xhat_down,
    }
