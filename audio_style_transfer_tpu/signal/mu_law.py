"""Mu-law codecs.

The reference carries *two* mu-law encoders and the distinction matters
(SURVEY.md hard-part #1):

* ``mu_law_numpy`` — floor-quantizing encoder used to feed audio into the
  transfer graph (reference utils.py:79-82).  Output is a float in
  [-128, 128] that has been passed through ``floor``.
* ``mu_law`` — the *continuous* (differentiable) variant the fork patched
  into the vendored nsynth (reference nsynth/utils.py:88-102); no floor,
  used by the full-AE path on raw wav input.

Decoding is shared (reference utils.py:85-104 / nsynth/utils.py:105-136)
and comes in a gradient-safe flavour: ``safe_abs``/``safe_sign`` keep the
derivative finite at 0 exactly as the reference's ``utils.abs``/``utils.sign``
(reference utils.py:92-97), which the STFT regularizer differentiates
through.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_MU = 255.0


def mu_law_numpy(x, mu: float = _MU):
    """Floor-quantizing mu-law encode (host/numpy).

    Mirrors reference utils.py:79-82: companding followed by ``floor(out*128)``.
    Returns floats in [-128, 128].
    """
    x = np.asarray(x)
    out = np.sign(x) * np.log1p(mu * np.abs(x)) / np.log1p(mu)
    return np.floor(out * 128.0)


def mu_law_quantize(x, mu: float = _MU):
    """Floor-quantizing mu-law encode (device/JAX). Same math as mu_law_numpy."""
    out = jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / jnp.log1p(mu)
    return jnp.floor(out * 128.0)


def mu_law(x, mu: float = _MU):
    """Continuous (differentiable) mu-law encode.

    Mirrors the fork's patched nsynth/utils.py:88-102 — identical companding
    but *without* the floor, so gradients flow end-to-end.
    """
    return jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / jnp.log1p(mu) * 128.0


def safe_abs(x, eps: float = 1e-12):
    """Gradient-safe |x|: ``max(x, eps) + max(0, -x)`` (reference utils.py:92-93).

    Derivative is +1 for x > eps, -1 for x < 0, and 0-safe in between, so
    L-BFGS never sees a NaN from the kink at the origin.
    """
    return jnp.maximum(x, eps) + jnp.maximum(0.0, -x)


def safe_sign(x, eps: float = 1e-12):
    """Gradient-safe sign (reference utils.py:95-97): 0 inside |x|<=eps."""
    out = jnp.where(jnp.abs(x) <= eps, jnp.zeros_like(x), x)
    return out / safe_abs(x, eps)


def inv_mu_law(x, mu: float = _MU):
    """Gradient-safe inverse mu-law on quantized-space values (utils.py:99-104).

    Input lives in the [-128, 128] quantized space (the optimized waveform
    variable).  The +0.5 half-bin shift and the ``x == 0 -> 0`` special case
    replicate the reference exactly.
    """
    x = x.astype(jnp.float32)
    out = (x + 0.5) * 2.0 / (mu + 1.0)
    out = safe_sign(out) / mu * ((1.0 + mu) ** safe_abs(out) - 1.0)
    return jnp.where(x == 0, x, out)


def inv_mu_law_numpy(x, mu: float = _MU):
    """Host/numpy inverse mu-law (reference utils.py:85-90)."""
    x = np.asarray(x).astype(np.float32)
    out = (x + 0.5) * 2.0 / (mu + 1.0)
    out = np.sign(out) / mu * ((1.0 + mu) ** np.abs(out) - 1.0)
    return np.where(x == 0, x, out)
