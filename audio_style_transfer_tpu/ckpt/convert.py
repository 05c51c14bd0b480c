"""TF1 checkpoint -> JAX pytree conversion (SURVEY.md hard-part #1).

The pretrained NSynth weights ship as a TF1 ``model.ckpt-200000`` bundle
(reference nsynth/README.md:29-33) with variables named by scope:
``ae_dilatedconv_5/W`` [1, 3, 128, 128], ``cond_map_out1/biases`` [256], ...
(naming established at reference masked.py:141-145 and nsynth/utils.py:871-876).

Conversion is a pure rename + squeeze: ``<layer>/W [1,F,Cin,Cout]`` becomes
``params[<layer>]['w'] [F,Cin,Cout]`` and ``<layer>/biases`` becomes ``['b']``.
Because our model layer names equal the TF scopes, no mapping table can
drift out of sync with the model code.

Reading the TF bundle uses TensorFlow's checkpoint reader when available
(this image bundles TF 2.x); converted weights are cached as a plain ``.npz``
so the runtime never needs TF again.
"""

from __future__ import annotations

import os
from typing import TYPE_CHECKING

import jax.numpy as jnp
import numpy as np

if TYPE_CHECKING:  # pragma: no cover
    from audio_style_transfer_tpu.models.wavenet_ae import Params


def _tf_checkpoint_reader(checkpoint_path: str):
    """Bundle reader: our pure-Python implementation, TF as fallback.

    Both expose get_variable_to_shape_map() / get_tensor(name).
    """
    try:
        from audio_style_transfer_tpu.ckpt.bundle_reader import BundleReader

        return BundleReader(checkpoint_path)
    except Exception:
        from tensorflow.python.training import py_checkpoint_reader

        return py_checkpoint_reader.NewCheckpointReader(checkpoint_path)


def convert_tf1_checkpoint(checkpoint_path: str, strict: bool = True) -> "Params":
    """Convert a TF1 NSynth WaveNet checkpoint to our params pytree.

    Args:
      checkpoint_path: path prefix of the TF checkpoint
        (e.g. ``.../wavenet-ckpt/model.ckpt-200000``).
      strict: require every model parameter to be present in the checkpoint.

    Returns:
      params: {layer_name: {'w': [F, Cin, Cout], 'b': [Cout]}}
    """
    from audio_style_transfer_tpu.models.wavenet_ae import (
        WaveNetAEConfig,
        _conv_shapes,
    )

    reader = _tf_checkpoint_reader(checkpoint_path)
    var_shapes = reader.get_variable_to_shape_map()

    cfg = WaveNetAEConfig()
    expected = _conv_shapes(cfg)
    params: Params = {}
    missing = []
    for name, (f, cin, cout) in expected.items():
        w_key, b_key = f"{name}/W", f"{name}/biases"
        if w_key not in var_shapes or b_key not in var_shapes:
            missing.append(name)
            continue
        w = np.asarray(reader.get_tensor(w_key))
        b = np.asarray(reader.get_tensor(b_key))
        # TF stores conv1d kernels as [1, filter, in, out] (masked.py:136).
        if w.ndim == 4:
            assert w.shape[0] == 1, f"{w_key}: unexpected shape {w.shape}"
            w = w[0]
        assert w.shape == (f, cin, cout), (
            f"{w_key}: got {w.shape}, expected {(f, cin, cout)}"
        )
        assert b.shape == (cout,), f"{b_key}: got {b.shape}, expected ({cout},)"
        params[name] = {
            "w": jnp.asarray(w, jnp.float32),
            "b": jnp.asarray(b, jnp.float32),
        }
    if missing and strict:
        raise KeyError(
            f"checkpoint {checkpoint_path} is missing variables for layers: "
            f"{missing[:8]}{'...' if len(missing) > 8 else ''}"
        )
    return params


def save_params(path: str, params: "Params") -> None:
    """Persist params as a flat .npz (keys ``<layer>/w``, ``<layer>/b``)."""
    flat = {}
    for layer, entry in params.items():
        for k, v in entry.items():
            flat[f"{layer}/{k}"] = np.asarray(v)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)


def load_params(path: str) -> "Params":
    """Inverse of :func:`save_params`."""
    with np.load(path) as data:
        params: Params = {}
        for key in data.files:
            layer, k = key.rsplit("/", 1)
            params.setdefault(layer, {})[k] = jnp.asarray(data[key])
    return params


def load_pretrained(checkpoint_path: str) -> "Params":
    """Load pretrained weights from either a converted .npz or a TF1 bundle.

    Accepts the reference's ``--ckpt_path`` argument unchanged: if a
    sibling ``<ckpt>.npz`` exists it is used (fast path, no TF import);
    otherwise the TF1 bundle is converted on the fly and the .npz cached.
    """
    npz_path = checkpoint_path + ".npz"
    if os.path.exists(npz_path):
        return load_params(npz_path)
    if os.path.exists(checkpoint_path) and checkpoint_path.endswith(".npz"):
        return load_params(checkpoint_path)
    params = convert_tf1_checkpoint(checkpoint_path)
    try:
        save_params(npz_path, params)
    except OSError:  # read-only checkpoint dir: skip the cache
        pass
    return params
