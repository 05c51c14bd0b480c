import numpy as np
import pytest

from audio_style_transfer_tpu.data import (
    NSynthDataset,
    build_example,
    parse_example,
    read_tfrecord,
    write_tfrecord,
)
from audio_style_transfer_tpu.data.tfrecord import crc32c, masked_crc32c


def test_crc32c_known_vectors():
    # RFC 3720 test vectors
    assert crc32c(b"") == 0
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"123456789") == 0xE3069283


def test_example_round_trip():
    ex = {
        "note_str": b"guitar_acoustic_010-060-100",
        "pitch": np.array([60], np.int64),
        "velocity": np.array([100], np.int64),
        "audio": np.linspace(-1, 1, 64, dtype=np.float32),
        "qualities": np.arange(10, dtype=np.int64),
    }
    parsed = parse_example(build_example(ex))
    assert parsed["note_str"][0] == ex["note_str"]
    np.testing.assert_array_equal(parsed["pitch"], ex["pitch"])
    np.testing.assert_allclose(parsed["audio"], ex["audio"], rtol=1e-6)
    np.testing.assert_array_equal(parsed["qualities"], ex["qualities"])


def test_example_matches_tensorflow_encoding():
    tf = pytest.importorskip("tensorflow")
    feats = {
        "pitch": tf.train.Feature(int64_list=tf.train.Int64List(value=[61])),
        "audio": tf.train.Feature(
            float_list=tf.train.FloatList(value=[0.1, -0.2, 0.3])
        ),
        "note_str": tf.train.Feature(
            bytes_list=tf.train.BytesList(value=[b"organ_001"])
        ),
    }
    ex = tf.train.Example(features=tf.train.Features(feature=feats))
    parsed = parse_example(ex.SerializeToString())
    assert parsed["pitch"][0] == 61
    np.testing.assert_allclose(parsed["audio"], [0.1, -0.2, 0.3], rtol=1e-6)
    assert parsed["note_str"][0] == b"organ_001"

    # and TF can parse what we build
    ours = build_example({"pitch": np.array([61], np.int64), "audio": [0.5, 0.25]})
    theirs = tf.train.Example.FromString(ours)
    assert theirs.features.feature["pitch"].int64_list.value[0] == 61


def test_tfrecord_round_trip(tmp_path):
    path = str(tmp_path / "data.tfrecord")
    records = [b"hello", b"world" * 100, b""]
    write_tfrecord(path, records)
    got = list(read_tfrecord(path, verify_crc=True))
    assert got == records


def test_tfrecord_readable_by_tensorflow(tmp_path):
    tf = pytest.importorskip("tensorflow")
    path = str(tmp_path / "data.tfrecord")
    write_tfrecord(path, [b"abc", b"defg"])
    ds = tf.data.TFRecordDataset(path)
    assert [r.numpy() for r in ds] == [b"abc", b"defg"]


def _make_dataset(tmp_path, n=12, seed=0):
    rng = np.random.RandomState(seed)
    records = []
    for i in range(n):
        records.append(
            build_example(
                {
                    "note_str": f"note-{i}".encode(),
                    "pitch": np.array([40 + i], np.int64),
                    "velocity": np.array([100], np.int64),
                    "audio": rng.randn(64000).astype(np.float32) * 0.1,
                    "qualities": np.zeros(10, np.int64),
                    "instrument_source": np.array([0], np.int64),
                    "instrument_family": np.array([i % 3], np.int64),
                }
            )
        )
    path = str(tmp_path / "nsynth.tfrecord")
    write_tfrecord(path, records)
    return path


def test_nsynth_wavenet_batch(tmp_path):
    path = _make_dataset(tmp_path)
    ds = NSynthDataset(path, is_training=True)
    batch = next(ds.get_wavenet_batch(4, length=6144, shuffle_buffer=8))
    assert batch["wav"].shape == (4, 6144)
    assert batch["pitch"].shape == (4,)
    assert batch["wav"].dtype == np.float32


def test_nsynth_eval_center_crop(tmp_path):
    path = _make_dataset(tmp_path, n=4)
    ds = NSynthDataset(path, is_training=False)
    batch = next(ds.get_wavenet_batch(2, length=6144))
    # center crop offset (64000 - 6144) // 2 = 28928 (reader.py:101)
    raw = list(ds.examples(repeat=False))
    expected = np.asarray(raw[0]["audio"], np.float32)[28928 : 28928 + 6144]
    np.testing.assert_allclose(batch["wav"][0], expected)


def test_int64_negative_round_trip():
    """Negative int64 features must fold back from the unsigned varint
    (round-5 review: int(2^64-1) previously overflowed the int64 cast)."""
    vals = np.array([-1, -(2**63), 2**62, 0, 7], np.int64)
    out = parse_example(build_example({"x": vals}))
    np.testing.assert_array_equal(out["x"], vals)


def test_nsynth_short_audio_padded(tmp_path):
    """Examples shorter than the crop length are zero-padded, and eval
    centers on the actual length (round-5 review: short audio crashed the
    random crop / ragged-stacked the eval batch)."""
    rng = np.random.RandomState(0)
    short = rng.randn(3000).astype(np.float32) * 0.1
    records = [
        build_example({
            "note_str": b"short-0",
            "pitch": np.array([60], np.int64),
            "velocity": np.array([100], np.int64),
            "audio": short,
            "qualities": np.zeros(10, np.int64),
            "instrument_source": np.array([0], np.int64),
            "instrument_family": np.array([0], np.int64),
        })
    ] * 4
    path = str(tmp_path / "short.tfrecord")
    write_tfrecord(path, records)

    train = next(NSynthDataset(path, is_training=True, use_native=False)
                 .get_wavenet_batch(2, length=6144, shuffle_buffer=0))
    assert train["wav"].shape == (2, 6144)
    np.testing.assert_allclose(train["wav"][0][:3000], short[:3000])
    assert np.all(train["wav"][0][3000:] == 0.0)

    ev = next(NSynthDataset(path, is_training=False, use_native=False)
              .get_wavenet_batch(2, length=2000))
    assert ev["wav"].shape == (2, 2000)
    # center crop of the ACTUAL 3000-sample wav: offset 500
    np.testing.assert_allclose(ev["wav"][0], short[500:2500])


def test_native_midstream_error_propagates(tmp_path, monkeypatch):
    """A native-reader failure after records have been yielded must raise,
    not silently restart from record 0 with the Python reader (round-5
    review: the fallback duplicated already-yielded examples)."""
    from audio_style_transfer_tpu.data import native as native_mod

    class Boom:
        def __init__(self, *a, **k):
            self.n = 0

        def __iter__(self):
            return self

        def __next__(self):
            if self.n >= 2:
                raise IOError("simulated mid-stream failure")
            self.n += 1
            return b"rec%d" % self.n

    monkeypatch.setattr(native_mod, "NativeTFRecordReader", Boom)
    monkeypatch.setattr(native_mod, "native_available", lambda: True)
    ds = NSynthDataset(str(tmp_path / "x.tfrecord"), use_native=True)
    it = ds._raw_records(repeat=False)
    assert next(it) == b"rec1" and next(it) == b"rec2"
    with pytest.raises(IOError, match="mid-stream"):
        next(it)
