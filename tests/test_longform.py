import jax
import numpy as np
import pytest

from audio_style_transfer_tpu.models import WaveNetAEConfig, init_params
from audio_style_transfer_tpu.transfer import StyleTransfer, TransferSpec
from audio_style_transfer_tpu.transfer.longform import (
    chunk_audio,
    transfer_longform,
    _stitch,
)

SMALL = WaveNetAEConfig(
    num_layers=2,
    num_stages=2,
    width=8,
    skip_width=8,
    ae_num_layers=4,
    ae_num_stages=2,
    ae_width=8,
    ae_hop_length=64,
    ae_bottleneck_width=4,
)


def test_chunk_audio():
    x = np.arange(10, dtype=np.float32)
    w = chunk_audio(x, 4)
    assert w.shape == (2, 4)
    np.testing.assert_array_equal(w[1], [4, 5, 6, 7])


def test_stitch_crossfade():
    a = np.ones(100, np.float32)
    b = np.zeros(100, np.float32)
    out = _stitch([a, b], crossfade=10)
    assert out.shape == (190,)
    assert out[0] == 1.0 and out[-1] == 0.0
    seam = out[90:100]
    assert np.all(np.diff(seam) <= 0)  # monotone fade


@pytest.fixture()
def engine():
    params = init_params(jax.random.PRNGKey(0), SMALL)
    spec = TransferSpec(
        batch_size=4096,
        cont_lyr_ids=(3,),
        style_lyr_ids=(0, 1, 2, 3),
        nb_channels=8,
        cnt_channels=8,
        epochs=1,
        maxiter=4,
        early_stop_evals=0,
        write_artifacts=False,
    )
    return StyleTransfer(spec, params, model_cfg=SMALL)


def test_transfer_longform_chunked(engine):
    rng = np.random.RandomState(0)
    content = rng.uniform(-0.5, 0.5, 4096 * 3 + 100).astype(np.float32)
    style = rng.uniform(-0.5, 0.5, 4096 * 2).astype(np.float32)
    res = transfer_longform(engine, content, style, epochs=1, crossfade=64)
    assert res.audio.shape == (4096 * 3 - 2 * 64,)
    assert np.all(np.isfinite(res.audio))
    assert res.per_window["snapshots"].shape[0] == 3


def test_transfer_longform_with_ot(engine, capsys):
    rng = np.random.RandomState(1)
    content = rng.uniform(-0.5, 0.5, 4096 * 2).astype(np.float32)
    style = rng.uniform(-0.5, 0.5, 4096).astype(np.float32)
    res = transfer_longform(
        engine, content, style, epochs=1, ot_components=3, crossfade=0
    )
    assert res.audio.shape == (4096 * 2,)
    assert np.all(np.isfinite(res.audio))
    assert "OT transform" in capsys.readouterr().out


def test_transfer_longform_sharded_over_mesh(engine):
    """Windows sharded across the 8-device CPU mesh must match unsharded."""
    from audio_style_transfer_tpu.parallel import make_mesh

    rng = np.random.RandomState(2)
    content = rng.uniform(-0.5, 0.5, 4096 * 8).astype(np.float32)
    style = rng.uniform(-0.5, 0.5, 4096 * 2).astype(np.float32)
    mesh = make_mesh(8)
    res_sharded = transfer_longform(
        engine, content, style, epochs=1, crossfade=0, mesh=mesh
    )
    res_local = transfer_longform(engine, content, style, epochs=1, crossfade=0)
    # partitioned execution reorders reductions; agreement is to f32 noise
    np.testing.assert_allclose(
        res_sharded.audio, res_local.audio, rtol=2e-4, atol=1e-4
    )
