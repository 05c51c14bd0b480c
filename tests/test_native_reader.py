import ctypes
import os

import numpy as np
import pytest

from audio_style_transfer_tpu.data import build_example, parse_example, write_tfrecord
from audio_style_transfer_tpu.data.tfrecord import masked_crc32c

native = pytest.importorskip("audio_style_transfer_tpu.data.native")
if not native.native_available():  # no g++ in this environment
    pytest.skip("native reader unavailable", allow_module_level=True)


def _records(n=20, payload=1000, seed=0):
    rng = np.random.RandomState(seed)
    return [
        build_example(
            {
                "pitch": np.array([i], np.int64),
                "audio": rng.rand(payload).astype(np.float32),
            }
        )
        for i in range(n)
    ]


def test_native_reads_all_records(tmp_path):
    path = str(tmp_path / "t.tfrecord")
    recs = _records()
    write_tfrecord(path, recs)
    got = list(native.NativeTFRecordReader(path, num_threads=2, verify_crc=True))
    assert sorted(got) == sorted(recs)


def test_native_multi_file(tmp_path):
    p1, p2 = str(tmp_path / "a.tfrecord"), str(tmp_path / "b.tfrecord")
    r1, r2 = _records(5, seed=1), _records(7, seed=2)
    write_tfrecord(p1, r1)
    write_tfrecord(p2, r2)
    got = list(native.NativeTFRecordReader([p1, p2], num_threads=2))
    assert len(got) == 12


def test_native_crc_matches_python():
    lib = native.load_library()
    for data in [b"", b"123456789", b"\x00" * 32, os.urandom(257)]:
        buf = (ctypes.c_uint8 * max(len(data), 1))(*data)
        assert lib.tfrec_masked_crc32c(buf, len(data)) == masked_crc32c(data)


def test_native_large_record_grows_buffer(tmp_path):
    path = str(tmp_path / "big.tfrecord")
    big = build_example({"audio": np.zeros(2_000_000, np.float32)})  # ~8 MB
    write_tfrecord(path, [big])
    got = list(native.NativeTFRecordReader(path))
    assert got == [big]


def test_native_payloads_parse(tmp_path):
    path = str(tmp_path / "t.tfrecord")
    write_tfrecord(path, _records(3))
    pitches = sorted(
        int(parse_example(r)["pitch"][0])
        for r in native.NativeTFRecordReader(path)
    )
    assert pitches == [0, 1, 2]


def test_native_empty_record_mid_file(tmp_path):
    """A zero-length record is a valid payload, not end-of-data (round-5
    review: the EOF sentinel 0 silently truncated everything after it);
    native and Python readers must agree on the same file."""
    from audio_style_transfer_tpu.data.native import NativeTFRecordReader
    from audio_style_transfer_tpu.data.tfrecord import read_tfrecord

    path = str(tmp_path / "e.tfrecord")
    write_tfrecord(path, [b"a", b"", b"cc"])
    got = list(NativeTFRecordReader(path))
    assert got == [b"a", b"", b"cc"]
    assert got == list(read_tfrecord(path))
