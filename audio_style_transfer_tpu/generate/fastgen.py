"""Fast autoregressive WaveNet synthesis as a single on-device scan.

The reference generates one audio sample per ``sess.run`` with TF FIFOQueues
holding per-layer state (reference nsynth/wavenet/fastgen.py:160-212,
nsynth/utils.py:838-887) — ≥6 minutes per second of 16 kHz audio because
every sample crosses the host<->device boundary, runs the Python loop, and
samples the categorical on the host.

Here the queues become functional circular buffers carried through
``lax.scan``:

* reference ``causal_linear`` keeps two length-``rate`` queues per layer so
  that taps x[t-rate] and x[t-2*rate] are available (utils.py:861-868);
* we keep one [2*rate, batch, channels] rolling buffer per layer: at step t
  the slot ``t mod 2r`` still holds x[t-2r] and slot ``(t-r) mod 2r`` holds
  x[t-r] — read both, then overwrite slot ``t mod 2r`` with x[t];
* categorical sampling runs on device with ``jax.random.categorical``.

The entire generation (16k+ steps) is ONE XLA program: zero host round
trips, fused sampling, state updates in registers/VMEM.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from audio_style_transfer_tpu.models.wavenet_ae import (
    Params,
    WaveNetAEConfig,
    encoder_extracts,
)
from audio_style_transfer_tpu.signal.mu_law import (
    inv_mu_law,
    mu_law,
)
from audio_style_transfer_tpu.utils.audio_io import (
    load_audio_mono,
    trim_for_encoding,
    write_wav,
)


# --------------------------------------------------------------------- #
# Encoder inference (reference fastgen.py:86-113)
# --------------------------------------------------------------------- #


def encode(wav_data: np.ndarray, params: Params, sample_length: int = 64000,
           cfg: WaveNetAEConfig | None = None) -> np.ndarray:
    """[B, T] raw audio -> [B, T/hop, 16] encodings (one device pass)."""
    cfg = cfg or WaveNetAEConfig()
    if wav_data.ndim == 1:
        wav_data = wav_data[None, :]
    wav_data, sample_length = trim_for_encoding(
        wav_data, sample_length, cfg.ae_hop_length
    )
    x_quantized = mu_law(jnp.asarray(wav_data, jnp.float32))
    encoding = _encode_jitted(params, x_quantized, cfg)
    return np.asarray(encoding)


# Module-level jit wrappers: re-wrapping with jax.jit inside encode()/
# synthesize() created a fresh cache per call, so CLI batch loops
# re-traced (and re-loaded executables) on every batch.
def _encoding_only(params, x, cfg):
    # Return ONLY the pooled encoding: jitting encoder_extracts whole
    # would pin all 32 [B, T, C] taps as program outputs (~1 GB per
    # 64000-sample batch item) that encode() immediately discards;
    # dropping them inside the jit lets XLA DCE the tap buffers
    # (needed_taps additionally lets the chained-kernel path skip
    # emitting them at all).
    return encoder_extracts(params, x, cfg, needed_taps=(31,))[1]


_encode_jitted = jax.jit(_encoding_only, static_argnums=2)


# --------------------------------------------------------------------- #
# Autoregressive decoder state
# --------------------------------------------------------------------- #


def _init_buffers(cfg: WaveNetAEConfig, batch_size: int):
    """Zero-filled rolling buffers (queue init, reference utils.py:863-864)."""
    bufs = {"startconv": jnp.zeros((2, batch_size, 1), jnp.float32)}
    for i in range(1, cfg.num_layers + 1):
        r = cfg.dilation(i - 1)
        bufs[f"dilatedconv_{i}"] = jnp.zeros((2 * r, batch_size, cfg.width), jnp.float32)
    return bufs


def _taps(buf, t, rate: int):
    """(x[t-2r], x[t-r]) from a [2r, B, C] rolling buffer at step t."""
    two_r = 2 * rate
    idx2 = jnp.mod(t, two_r)          # slot holding x[t-2r]
    idx1 = jnp.mod(t + rate, two_r)   # slot holding x[t-r]
    return (
        jax.lax.dynamic_index_in_dim(buf, idx2, axis=0, keepdims=False),
        jax.lax.dynamic_index_in_dim(buf, idx1, axis=0, keepdims=False),
    )


def _push(buf, t, rate: int, value):
    return jax.lax.dynamic_update_index_in_dim(
        buf, value, jnp.mod(t, 2 * rate), axis=0
    )


def quantize_params_int8(params: Params, min_size: int = 65536) -> Params:
    """Per-output-channel symmetric int8 quantization of large weights.

    Batch-1 synthesis is weight-streaming bound: every generated sample
    re-reads the ~60M decoder parameters from HBM (BENCH_NOTES.md speed-of-
    light accounting: 147 us/sample floor in bf16, ~91% attained). Storing
    the large matrices as int8 + one f32 scale per output channel halves
    that floor; the matmuls up-convert in-register (operand fusion) and
    accumulate in f32, so only the 8-bit weight rounding (~0.4% relative)
    touches the logits.

    Tensors smaller than ``min_size`` elements (biases, cond maps, the
    1-channel startconv) stay in f32 — they are bandwidth-irrelevant.
    """

    def q(entry):
        w = entry["w"]
        if w.size < min_size:
            return entry
        scale = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1))) / 127.0
        scale = jnp.maximum(scale, 1e-12)
        w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
        return {"w_q": w_q, "w_scale": scale.astype(jnp.float32),
                "b": entry["b"]}

    return {name: q(entry) for name, entry in params.items()}


def _mm(x, entry, k: int = 0):
    """x @ w[k] for a plain or int8-quantized weight entry (no bias)."""
    if "w_q" in entry:
        w = entry["w_q"][k]
        y = jnp.dot(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        return y * entry["w_scale"]
    return x @ entry["w"][k]


def _linear(params, name, x):
    """1x1 'linear' op on [B, C] (reference utils.py:890-908)."""
    return _mm(x, params[name]) + params[name]["b"]


def _causal_step(params, name, buf, t, rate, x):
    """One step of a filter-3 dilated causal conv from cached taps
    (reference utils.py:838-887: w[0]@x[t-2r] + w[1]@x[t-r] + w[2]@x[t])."""
    entry = params[name]
    x_2r, x_r = _taps(buf, t, rate)
    y = _mm(x_2r, entry, 0) + _mm(x_r, entry, 1) + _mm(x, entry, 2) + entry["b"]
    new_buf = _push(buf, t, rate, x)
    return y, new_buf


def _precompute_cond(params, cfg, encodings):
    """Project every encoding frame through all cond_map layers ONCE.

    The conditioning input changes only every ``ae_hop_length`` samples
    (reference fastgen.py:197-203 re-feeds the same frame for the whole
    hop), yet the per-sample decoder step paid ``num_layers + 1`` tiny
    matmuls plus the ~2 MB/sample cond-weight HBM stream for it.
    Projecting the [B, F, z] frames outside the sample scan is the same
    matmul on the same rows (bit-identical logits, asserted by the
    teacher-forced oracle in tests/test_fastgen.py) and turns the
    per-step work into ONE frame-row gather.

    Returns a list of num_layers + 1 arrays ([B, F, 2 * width] per layer,
    [B, F, skip_width] for cond_map_out1), kept separate so each layer's
    per-step frame gather fuses next to that layer's gate add.
    """
    cond = [
        _linear(params, f"cond_map_{i}", encodings)
        for i in range(1, cfg.num_layers + 1)
    ]
    cond.append(_linear(params, "cond_map_out1", encodings))
    return cond


def _decoder_step(params, cfg, bufs, t, cond, enc_i, x_scaled):
    """One incremental decoder step from cached taps. ``cond`` is the
    ``_precompute_cond`` list; ``enc_i`` the conditioning frame index.
    Returns (logits, bufs)."""

    def cond_row(i):
        return jax.lax.dynamic_index_in_dim(
            cond[i], enc_i, axis=1, keepdims=False
        )

    new_bufs = {}
    l, new_bufs["startconv"] = _causal_step(
        params, "startconv", bufs["startconv"], t, 1, x_scaled
    )
    s = _linear(params, "skip_start", l)

    for i in range(1, cfg.num_layers + 1):
        rate = cfg.dilation(i - 1)
        name = f"dilatedconv_{i}"
        d, new_bufs[name] = _causal_step(params, name, bufs[name], t, rate, l)
        d = d + cond_row(i - 1)
        m = d.shape[-1] // 2
        d = jax.nn.sigmoid(d[:, :m]) * jnp.tanh(d[:, m:])
        l = l + _linear(params, f"res_{i}", d)
        s = s + _linear(params, f"skip_{i}", d)

    s = jax.nn.relu(s)
    s = _linear(params, "out1", s) + cond_row(cfg.num_layers)
    s = jax.nn.relu(s)
    return _linear(params, "logits", s), new_bufs


def incremental_logits(params: Params, x_quantized, encoding,
                       cfg: WaveNetAEConfig | None = None):
    """Teacher-forced incremental decode: scan the cached-state decoder over
    a known sequence. Must match models.decode_logits exactly — this is the
    correctness oracle for the rolling-buffer state (tests/test_fastgen.py).

    Args: x_quantized [B, T] (quantized space), encoding [B, T/hop, z].
    Returns logits [B, T, 256].
    """
    cfg = cfg or WaveNetAEConfig()
    b, t_total = x_quantized.shape
    x_scaled_seq = (x_quantized.astype(jnp.float32) / 128.0)[..., None]  # [B,T,1]
    # shift_right: the decoder consumes x[t-1] when predicting x[t]
    # (reference model.py:136).
    x_in = jnp.pad(x_scaled_seq, ((0, 0), (1, 0), (0, 0)))[:, :t_total]

    cond_all = _precompute_cond(params, cfg, encoding.astype(jnp.float32))

    def step(bufs, inputs):
        t, x_t = inputs
        enc_i = t // cfg.ae_hop_length
        logits, bufs = _decoder_step(params, cfg, bufs, t, cond_all, enc_i, x_t)
        return bufs, logits

    bufs = _init_buffers(cfg, b)
    _, logits = jax.lax.scan(
        step, bufs, (jnp.arange(t_total), jnp.swapaxes(x_in, 0, 1))
    )
    return jnp.swapaxes(logits, 0, 1)


def synthesize_jit(params: Params, encodings, rng, cfg: WaveNetAEConfig | None = None):
    """Generate audio for [B, enc_len, 16] encodings. Returns [B, T] audio.

    The whole sample loop is one ``lax.scan``; jit-compatible.
    """
    cfg = cfg or WaveNetAEConfig()
    batch_size, enc_length, _ = encodings.shape
    total_length = enc_length * cfg.ae_hop_length
    encodings = jnp.asarray(encodings, jnp.float32)

    cond_all = _precompute_cond(params, cfg, encodings)

    def step(carry, t):
        bufs, audio, key = carry
        key, sample_key = jax.random.split(key)

        # conditioning frame for this hop window (fastgen.py:197-203),
        # pre-projected through every cond_map outside the scan
        enc_i = t // cfg.ae_hop_length

        # continuous mu-law of the fed-back sample (FastGenerationConfig
        # build, reference nsynth/wavenet/model.py:55-57)
        x_scaled = mu_law(audio) / 128.0  # [B, 1]

        logits, new_bufs = _decoder_step(
            params, cfg, bufs, t, cond_all, enc_i, x_scaled
        )

        sample_bin = jax.random.categorical(sample_key, logits, axis=-1)  # [B]
        audio = inv_mu_law(sample_bin[:, None].astype(jnp.float32) - 128.0)
        return (new_bufs, audio, key), audio[:, 0]

    bufs = _init_buffers(cfg, batch_size)
    audio0 = jnp.zeros((batch_size, 1), jnp.float32)
    (_, _, _), samples = jax.lax.scan(
        step, (bufs, audio0, rng), jnp.arange(total_length)
    )
    return samples.T  # [B, T]


_synthesize_jitted = jax.jit(synthesize_jit, static_argnums=3)


def synthesize(
    encodings: np.ndarray,
    save_paths: list[str] | None = None,
    params: Params | None = None,
    cfg: WaveNetAEConfig | None = None,
    seed: int = 0,
    sr: int = 16000,
    dtype=None,
    quantize: str | None = None,
) -> np.ndarray:
    """Host wrapper mirroring reference fastgen.synthesize:160-212.

    ``dtype=jnp.bfloat16`` casts the decoder weights for ~2x faster
    generation (logit precision drops accordingly; sampling stays f32).
    ``quantize="int8"`` stores the large decoder matrices as int8 with
    per-channel scales instead — batch-1 generation is weight-streaming
    bound, so this halves the HBM floor again (see quantize_params_int8).
    """
    assert params is not None, "synthesize requires a params pytree"
    cfg = cfg or WaveNetAEConfig()
    if quantize is not None and dtype is not None:
        raise ValueError(
            f"dtype={dtype} and quantize={quantize!r} are mutually exclusive: "
            "int8 quantization fixes the storage format of the large decoder "
            "matrices itself (pass exactly one)"
        )
    if quantize == "int8":
        params = quantize_params_int8(params)
    elif quantize is not None:
        raise ValueError(f"unsupported quantize={quantize!r} (use 'int8')")
    elif dtype is not None:
        params = jax.tree.map(lambda v: v.astype(dtype), params)
    audio = np.asarray(_synthesize_jitted(
        params, jnp.asarray(encodings), jax.random.PRNGKey(seed), cfg
    ))
    if save_paths:
        save_batch(audio, save_paths, sr=sr)
    return audio


# --------------------------------------------------------------------- #
# Batch file helpers (reference fastgen.py:116-157)
# --------------------------------------------------------------------- #


def load_batch(files: list[str], sample_length: int = 64000) -> np.ndarray:
    """Load and zero-pad a batch of .wav or .npy files."""
    batch_data = []
    max_length = 0
    is_npy = os.path.splitext(files[0])[1] == ".npy"
    for f in files:
        data = np.load(f) if is_npy else load_audio_mono(f, sample_length, sr=16000)
        batch_data.append(data)
        max_length = max(max_length, data.shape[0])
    for i, data in enumerate(batch_data):
        if data.shape[0] < max_length:
            if is_npy:
                padded = np.zeros([max_length, data.shape[1]], data.dtype)
                padded[: data.shape[0], :] = data
            else:
                padded = np.zeros([max_length], data.dtype)
                padded[: data.shape[0]] = data
            batch_data[i] = padded
    return np.stack(batch_data)


def save_batch(batch_audio: np.ndarray, batch_save_paths: list[str], sr: int = 16000):
    for audio, name in zip(batch_audio, batch_save_paths):
        write_wav(name, audio, sr=sr)
