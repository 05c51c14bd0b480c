"""On-device L-BFGS vs SciPy L-BFGS-B on the *actual transfer loss*.

The north star requires style/content losses within 1% of the TF reference,
whose optimizer is SciPy's Fortran L-BFGS-B (reference methods.py:133-137).
Here both optimizers minimize the identical transfer loss on a small model
and must land at final losses within 1% of each other.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.optimize

from audio_style_transfer_tpu.models import WaveNetAEConfig, init_params
from audio_style_transfer_tpu.signal import mu_law_numpy
from audio_style_transfer_tpu.transfer import LBFGSOptions, lbfgs_minimize
from audio_style_transfer_tpu.transfer.losses import LossSpec, transfer_embeds, transfer_loss

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

SPEC = LossSpec(
    cont_lyr_ids=(3,),
    style_layer_ids=(0, 1, 2, 3),
    cnt_channels=8,
    nb_channels=8,
    lambd=10.0,
    gamma=0.01,
)


@pytest.mark.parametrize("seed", [0, 1])
def test_final_loss_within_one_percent_of_scipy(seed):
    params = init_params(jax.random.PRNGKey(42), SMALL)
    rng = np.random.RandomState(seed)
    t = 2048

    aud_c = rng.uniform(-0.8, 0.8, (1, t))
    aud_s = rng.uniform(-0.8, 0.8, (1, t))
    xq_c = jnp.asarray(mu_law_numpy(aud_c), jnp.float32)
    xq_s = jnp.asarray(mu_law_numpy(aud_s), jnp.float32)
    phi_c, _ = transfer_embeds(params, xq_c, SMALL, SPEC)
    _, phi_s = transfer_embeds(params, xq_s, SMALL, SPEC)

    def loss(x):
        return transfer_loss(params, x, phi_c, phi_s, SMALL, SPEC)[0]

    vg = jax.jit(jax.value_and_grad(loss))
    x0 = jnp.full((1, t), 1e-6, jnp.float32)

    # ours: one fused epoch, maxiter 100 (reference epoch semantics)
    res = jax.jit(
        lambda x: lbfgs_minimize(vg, x, LBFGSOptions(maxiter=100))
    )(x0)
    ours = float(res.f)

    # scipy L-BFGS-B with identical settings
    def f_np(x64):
        v, g = vg(jnp.asarray(x64, jnp.float32).reshape(1, t))
        return float(v), np.asarray(g, np.float64).reshape(-1)

    sp = scipy.optimize.minimize(
        f_np,
        np.full(t, 1e-6),
        jac=True,
        method="L-BFGS-B",
        options={"maxiter": 100},
    )
    scipy_loss = float(sp.fun)

    l0 = float(loss(x0))
    # both must make real progress and agree within 1% relative to the
    # achieved reduction
    assert ours < 0.5 * l0
    assert scipy_loss < 0.5 * l0
    denom = max(abs(scipy_loss), 1e-3)
    assert abs(ours - scipy_loss) / denom < 0.01 or ours < scipy_loss, (
        f"ours={ours} scipy={scipy_loss} start={l0}"
    )
