import numpy as np
import pytest

from audio_style_transfer_tpu.analysis.summaries import (
    form_image_grid,
    l2_metrics,
    softmax_metrics,
)
from audio_style_transfer_tpu.train.optimizers import get_optimizer


def test_get_optimizer_names():
    import optax

    for name in ["rmsprop", "adam", "adagrad", "mom", "sgd"]:
        opt = get_optimizer(1e-3, name=name)
        assert isinstance(opt, optax.GradientTransformation)
    with pytest.raises(KeyError):
        get_optimizer(1e-3, name="nope")


def test_get_optimizer_from_hparams():
    class HP:
        optimizer = "rmsprop"
        momentum = 0.8

    opt = get_optimizer(1e-3, HP())
    params = {"w": np.zeros(3, np.float32)}
    state = opt.init(params)
    updates, _ = opt.update({"w": np.ones(3, np.float32)}, state, params)
    assert np.all(np.isfinite(updates["w"]))


def test_form_image_grid():
    batch = np.arange(2 * 3 * 4 * 1, dtype=np.float32).reshape(2, 3, 4, 1)
    grid = form_image_grid(batch, [1, 2], [3, 4], 1)
    assert grid.shape == (1, 3, 8, 1)
    np.testing.assert_array_equal(grid[0, :, :4, 0], batch[0, :, :, 0])
    np.testing.assert_array_equal(grid[0, :, 4:, 0], batch[1, :, :, 0])
    with pytest.raises(ValueError):
        form_image_grid(batch, [2, 2], [3, 4], 1)


def test_softmax_metrics():
    logits = np.array([[10.0, 0.0, 0.0], [0.0, 10.0, 0.0]])
    labels = np.array([0, 1])
    m = softmax_metrics(logits, labels)
    assert m["precision@1"] == 1.0
    assert m["precision@5"] == 1.0
    assert m["loss"] < 0.01
    # one-hot labels accepted
    m2 = softmax_metrics(logits, np.eye(3)[labels])
    assert m2["precision@1"] == 1.0


def test_l2_metrics():
    m = l2_metrics(np.ones((4, 2)), np.zeros((4, 2)))
    assert m["loss"] == 1.0


def test_timestretch():
    from examples.interpolation import timestretch

    enc = np.arange(8, dtype=np.float32).reshape(1, 8, 1)
    out = timestretch(enc, 2.0)
    assert out.shape == (1, 16, 1)
    # endpoints preserved, interior monotone
    assert out[0, 0, 0] == 0.0
    assert out[0, -1, 0] == 7.0
    assert np.all(np.diff(out[0, :, 0]) >= 0)


def test_make_hybrid_mesh_single_slice():
    from audio_style_transfer_tpu.parallel.mesh import make_hybrid_mesh

    mesh = make_hybrid_mesh()
    assert mesh.axis_names == ("slice", "data")
    assert mesh.devices.shape[0] == 1  # one slice in this environment
    assert mesh.devices.size == 8


def test_specgram_summaries_writes_files(tmp_path):
    import jax.numpy as jnp

    from audio_style_transfer_tpu.analysis.summaries import specgram_summaries
    from audio_style_transfer_tpu.models.baseline_ae import BaselineHParams
    from audio_style_transfer_tpu.signal.specgram import specgram

    hp = BaselineHParams(n_fft=64, hop_length=32, mag_only=True)
    rng = np.random.RandomState(0)
    specs = np.stack(
        [
            np.asarray(specgram(jnp.asarray(rng.randn(512).astype(np.float32)),
                                n_fft=64, hop_length=32, mag_only=True))
            for _ in range(4)
        ]
    )
    specgram_summaries(specs, "recon", hp, str(tmp_path), rows=2, columns=2,
                       phase=False, audio=True)
    import os

    files = os.listdir(tmp_path)
    assert any(f.startswith("mag_recon") for f in files)
    assert any(f.endswith(".wav") for f in files)
