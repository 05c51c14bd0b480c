import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_style_transfer_tpu.models import WaveNetAEConfig, init_params
from audio_style_transfer_tpu.models.wavenet_ae import encoder_extracts
from audio_style_transfer_tpu.signal import mu_law_numpy
from audio_style_transfer_tpu.transfer import (
    StyleTransfer,
    TransferSpec,
    content_embeds,
    l2_normalize,
    select_style_layers,
    style_gram,
)
from audio_style_transfer_tpu.utils import write_wav

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


def test_select_style_layers():
    assert select_style_layers(30, stack=1) == list(range(10, 20))
    assert select_style_layers(30, stack=None) == list(range(30))
    assert select_style_layers(30, stack=2, style_lyr_ids=[1, 5]) == [1, 5]


def test_l2_normalize_matches_tf_semantics():
    rng = np.random.RandomState(0)
    x = rng.randn(4, 5, 5).astype(np.float32)
    got = np.asarray(l2_normalize(jnp.asarray(x), axes=(1, 2)))
    ref = x / np.sqrt(np.maximum((x**2).sum(axis=(1, 2), keepdims=True), 1e-12))
    np.testing.assert_allclose(got, ref, rtol=1e-5)
    np.testing.assert_allclose((got**2).sum(axis=(1, 2)), 1.0, rtol=1e-4)


def _extracts(seed=0, t=256):
    params = init_params(jax.random.PRNGKey(seed), SMALL)
    x = jnp.asarray(
        mu_law_numpy(np.random.RandomState(seed).uniform(-0.9, 0.9, (1, t))),
        jnp.float32,
    )
    extracts, _ = encoder_extracts(params, x, SMALL)
    return extracts


def test_style_gram_ours_shape_and_value():
    extracts = _extracts()
    ids = [0, 1, 2, 3]
    g = np.asarray(style_gram(extracts, ids, gatys=False))
    # ours: [C, L, L]
    assert g.shape == (8, 4, 4)
    stl = np.concatenate([np.asarray(extracts[i]) for i in ids], axis=0)  # [L,T,C]
    stl = stl.transpose(2, 0, 1)  # [C,L,T]
    ref = stl @ stl.transpose(0, 2, 1)
    ref = ref / np.sqrt(np.maximum((ref**2).sum(axis=(1, 2), keepdims=True), 1e-12))
    np.testing.assert_allclose(g, ref, rtol=1e-3, atol=1e-4)


def test_style_gram_gatys_shape():
    extracts = _extracts()
    g = np.asarray(style_gram(extracts, [0, 1], gatys=True))
    assert g.shape == (2, 8, 8)  # [L, C, C]


def test_style_gram_channel_slice():
    extracts = _extracts()
    g = np.asarray(style_gram(extracts, [0, 1], gatys=False, nb_channels=3))
    assert g.shape == (3, 2, 2)


def test_content_embeds_concat():
    extracts = _extracts()
    c = np.asarray(content_embeds(extracts, [1, 3], cnt_channels=4))
    assert c.shape == (256, 8)
    np.testing.assert_allclose(
        c[:, :4], np.asarray(extracts[1])[0, :, :4], rtol=1e-6
    )


@pytest.fixture()
def transfer_setup(tmp_path):
    params = init_params(jax.random.PRNGKey(42), SMALL)
    spec = TransferSpec(
        savepath=str(tmp_path / "out"),
        figdir=str(tmp_path / "fig"),
        batch_size=4096,
        cont_lyr_ids=(3,),
        style_lyr_ids=(0, 1, 2, 3),
        nb_channels=8,
        cnt_channels=8,
        epochs=2,
        maxiter=8,
        early_stop_evals=0,  # never early-stop in this test
        write_artifacts=True,
    )
    st = StyleTransfer(spec, params, model_cfg=SMALL)

    sr = 16000
    t = np.arange(sr * 2) / sr
    content = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    style = (0.4 * np.sign(np.sin(2 * np.pi * 330 * t))).astype(np.float32)
    cpath, spath = str(tmp_path / "content.wav"), str(tmp_path / "style.wav")
    write_wav(cpath, content, sr)
    write_wav(spath, style, sr)
    return st, cpath, spath, tmp_path


def test_end_to_end_transfer(transfer_setup):
    st, cpath, spath, tmp_path = transfer_setup
    audio = st.run(cpath, cpath, spath, epochs=2)
    assert audio.shape == (4096,)
    assert np.all(np.isfinite(audio))
    # artifacts
    out = tmp_path / "out"
    fig = tmp_path / "fig"
    assert (out / "ori.wav").exists()
    assert (out / "style.wav").exists()
    assert (out / "ep-0.wav").exists()
    assert (out / "ep-1.wav").exists()
    assert (fig / "ori-spec.png").exists()
    assert (fig / "gram-ep1.png").exists()


def test_optimize_decreases_loss(transfer_setup):
    st, cpath, spath, _ = transfer_setup
    rng = np.random.RandomState(0)
    aud = rng.uniform(-0.5, 0.5, 4096).astype(np.float32)
    saud = rng.uniform(-0.5, 0.5, 4096).astype(np.float32)
    phi_c = st.get_embeds(aud)
    phi_s = st.get_embeds(saud, is_content=False)
    result = st.optimize(phi_c, phi_s, epochs=2)
    assert result["epochs_done"] == 2
    losses = result["metrics"][:, 0]
    # loss after epoch 2 <= after epoch 1
    assert losses[-1] <= losses[0] + 1e-6

    # and optimization genuinely reduced the loss vs the initial point
    x0 = jnp.full((1, 4096), 1e-6, jnp.float32)
    from audio_style_transfer_tpu.transfer.losses import transfer_loss

    l0, _ = transfer_loss(
        st.params, x0, jnp.asarray(phi_c), jnp.asarray(phi_s), st.cfg, st.loss_spec
    )
    assert losses[-1] < float(l0)


def test_early_stop(transfer_setup):
    st, *_ = transfer_setup
    rng = np.random.RandomState(1)
    aud = rng.uniform(-0.1, 0.1, 4096).astype(np.float32)
    phi_c = st.get_embeds(aud)
    phi_s = st.get_embeds(aud, is_content=False)
    spec = dataclasses_replace(st.spec, early_stop_evals=10**6)
    st2 = StyleTransfer(spec, st.params, model_cfg=SMALL)
    result = st2.optimize(phi_c, phi_s, epochs=5)
    # every epoch trivially "converges" under the huge threshold -> 1 epoch
    assert result["epochs_done"] == 1


def dataclasses_replace(spec, **kw):
    import dataclasses

    return dataclasses.replace(spec, **kw)


def test_get_style_phi_chunking(transfer_setup):
    st, *_ = transfer_setup
    rng = np.random.RandomState(2)
    audio = rng.uniform(-0.5, 0.5, 4096 * 3).astype(np.float32)
    phi = st.get_style_phi(audio, max_examples=2)
    g1 = st.get_embeds(audio[:4096], is_content=False)
    g2 = st.get_embeds(audio[4096:8192], is_content=False)
    np.testing.assert_allclose(phi, (g1 + g2) / 2, rtol=1e-5, atol=1e-6)


def test_optimize_batch(transfer_setup):
    st, *_ = transfer_setup
    rng = np.random.RandomState(3)
    auds = rng.uniform(-0.5, 0.5, (3, 4096)).astype(np.float32)
    phi_c = np.stack([st.get_embeds(a) for a in auds])
    phi_s = np.stack([st.get_embeds(a, is_content=False) for a in auds[::-1]])
    result = st.optimize_batch(phi_c, phi_s, epochs=2)
    assert result["snapshots"].shape[0] == 3
    assert result["x"].shape == (3, 1, 4096)
    assert np.all(np.isfinite(result["x"]))
    # batched lane 0 must agree with a single-clip run on the same inputs
    single = st.optimize(phi_c[0], phi_s[0], epochs=2)
    np.testing.assert_allclose(
        result["metrics"][0, : single["epochs_done"], 0],
        single["metrics"][:, 0],
        rtol=2e-3,
    )


def test_short_audio_clear_errors(transfer_setup):
    st, cpath, spath, tmp_path = transfer_setup
    short = np.zeros(1000, np.float32)
    with pytest.raises(ValueError, match="batch_size"):
        st.get_style_phi(short)
    # content window falling off the end of the clip
    with pytest.raises(ValueError, match="content window"):
        st.run(cpath, cpath, spath, epochs=1, start=100.0)


def test_warm_start_matches_cold_final_loss(transfer_setup):
    """spec.warm_start carries the L-BFGS memory across epochs: the final
    loss must match the reference-faithful cold-restart mode within 1%
    (the parity budget) while spending fewer total evaluations once the
    run has epochs to amortize (here: 6 epochs at maxiter 8)."""
    import dataclasses

    st, *_ = transfer_setup
    rng = np.random.RandomState(11)
    aud_c = rng.uniform(-0.6, 0.6, 4096).astype(np.float32)
    aud_s = rng.uniform(-0.6, 0.6, 4096).astype(np.float32)
    phi_c = st.get_embeds(aud_c)
    phi_s = st.get_embeds(aud_s, is_content=False)

    cold = st.optimize(phi_c, phi_s, epochs=6)
    warm_engine = StyleTransfer(
        dataclasses.replace(st.spec, warm_start=True),
        init_params(jax.random.PRNGKey(42), SMALL),
        model_cfg=SMALL,
    )
    warm = warm_engine.optimize(phi_c, phi_s, epochs=6)

    f_cold = cold["metrics"][cold["epochs_done"] - 1, 0]
    f_warm = warm["metrics"][warm["epochs_done"] - 1, 0]
    assert abs(f_warm - f_cold) / abs(f_cold) < 0.01, (f_cold, f_warm)
    assert int(np.sum(warm["evals"])) <= int(np.sum(cold["evals"])), (
        warm["evals"], cold["evals"])
