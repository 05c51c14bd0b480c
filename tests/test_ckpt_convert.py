"""TF1-checkpoint converter tests.

Builds a real TF V2-format checkpoint with reference-style variable names
(``<layer>/W`` as [1, F, Cin, Cout], ``<layer>/biases``) using
tf.compat.v1, then converts and checks values. Skipped when TF is absent.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from audio_style_transfer_tpu.ckpt import convert_tf1_checkpoint, load_pretrained
from audio_style_transfer_tpu.models import WaveNetAEConfig
from audio_style_transfer_tpu.models.wavenet_ae import _conv_shapes


@pytest.fixture(scope="module")
def tf1_checkpoint(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ckpt") / "model.ckpt-200000")
    rng = np.random.RandomState(0)
    shapes = _conv_shapes(WaveNetAEConfig())
    values = {}
    tf1 = tf.compat.v1
    graph = tf1.Graph()
    with graph.as_default():
        for name, (f, cin, cout) in shapes.items():
            w = rng.randn(1, f, cin, cout).astype(np.float32)
            b = rng.randn(cout).astype(np.float32)
            values[f"{name}/W"] = w
            values[f"{name}/biases"] = b
            tf1.get_variable(f"{name}/W", initializer=w)
            tf1.get_variable(f"{name}/biases", initializer=b)
        saver = tf1.train.Saver()
        with tf1.Session(graph=graph) as sess:
            sess.run(tf1.global_variables_initializer())
            saver.save(sess, path, write_meta_graph=False)
    return path, values


def test_convert_all_layers(tf1_checkpoint):
    path, values = tf1_checkpoint
    params = convert_tf1_checkpoint(path)
    shapes = _conv_shapes(WaveNetAEConfig())
    assert set(params) == set(shapes)
    for name, (f, cin, cout) in shapes.items():
        np.testing.assert_array_equal(
            np.asarray(params[name]["w"]), values[f"{name}/W"][0]
        )
        np.testing.assert_array_equal(
            np.asarray(params[name]["b"]), values[f"{name}/biases"]
        )


def test_load_pretrained_caches_npz(tf1_checkpoint, tmp_path):
    path, values = tf1_checkpoint
    params = load_pretrained(path)
    import os

    assert os.path.exists(path + ".npz")
    # Second load must take the npz fast path and agree.
    params2 = load_pretrained(path)
    np.testing.assert_array_equal(
        np.asarray(params["ae_startconv"]["w"]),
        np.asarray(params2["ae_startconv"]["w"]),
    )


def test_convert_missing_layer_raises(tmp_path):
    tf1 = tf.compat.v1
    path = str(tmp_path / "bad.ckpt")
    graph = tf1.Graph()
    with graph.as_default():
        tf1.get_variable("ae_startconv/W", initializer=np.zeros((1, 3, 1, 128), np.float32))
        tf1.get_variable("ae_startconv/biases", initializer=np.zeros(128, np.float32))
        saver = tf1.train.Saver()
        with tf1.Session(graph=graph) as sess:
            sess.run(tf1.global_variables_initializer())
            saver.save(sess, path, write_meta_graph=False)
    with pytest.raises(KeyError):
        convert_tf1_checkpoint(path)


def test_pure_python_bundle_reader_matches_tf(tf1_checkpoint):
    """Our TF-free bundle reader must read the real TF-written checkpoint."""
    from audio_style_transfer_tpu.ckpt.bundle_reader import BundleReader

    path, values = tf1_checkpoint
    reader = BundleReader(path)
    shapes = reader.get_variable_to_shape_map()
    # every saved variable is visible with the right shape and bytes
    for key, val in values.items():
        assert tuple(shapes[key]) == val.shape, key
        np.testing.assert_array_equal(reader.get_tensor(key), val)


def test_bundle_reader_missing_file(tmp_path):
    from audio_style_transfer_tpu.ckpt.bundle_reader import BundleReader

    with pytest.raises(FileNotFoundError):
        BundleReader(str(tmp_path / "nope.ckpt"))
