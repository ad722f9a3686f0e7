"""Collision operators.

:func:`bgk` is the single-relaxation-time collision every reference model
shares (``D2Q9.cl:102-121``): ``f <- f (1 - omega) + omega feq``.
Reaction/noise source terms (Fisher growth, Milstein noise, Guo forcing) are
composed on top of this by the model step functions — the reference's
"registry of additional collision kernels"
(``porous_media/single_component.py:334-335``) survives here as plain
function composition inside one fused XLA program.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["bgk"]


def bgk(f: jnp.ndarray, feq: jnp.ndarray, omega) -> jnp.ndarray:
    """BGK relaxation toward equilibrium (``D2Q9.cl:119``).

    ``omega`` may be a python float, a scalar, or an ``[Q]``/``[fields]``
    broadcastable array (per-population omegas,
    ``D2Q9_multifield_fisher.cl:103``).
    """
    omega = jnp.asarray(omega, f.dtype)
    return f * (1.0 - omega) + omega * feq
