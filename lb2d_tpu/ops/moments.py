"""Hydrodynamic moments (density / momentum) from populations.

Reproduces the reference's ``update_hydro*`` kernels:

* :func:`hydro_compressible` — ``rho = sum_j f_j``, ``u = sum_j c_j f_j / rho``
  (``D2Q9.cl:67-100``).
* :func:`hydro_incompressible` — momentum not divided by density
  (``D2Q9i.cl:67-100``).
* :func:`density` — scalar models where hydro is density only
  (``D2Q9_diffusion.cl:41-68``).
* :func:`rho_poisson` — Chai-Shi recovery ``rho = (9/5) sum_{j>=1} f_j``
  (``D2Q9_poisson.cl:34-63``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.lattice import Lattice, D2Q9

__all__ = [
    "density",
    "momentum",
    "hydro_compressible",
    "hydro_incompressible",
    "rho_poisson",
]


def _c_consts(lattice: Lattice, dtype):
    cx = jnp.asarray(np.asarray(lattice.cx, dtype=dtype))[:, None, None]
    cy = jnp.asarray(np.asarray(lattice.cy, dtype=dtype))[:, None, None]
    return cx, cy


def density(f: jnp.ndarray) -> jnp.ndarray:
    """``rho = sum_j f_j`` over the direction axis."""
    return jnp.sum(f, axis=0)


def momentum(f: jnp.ndarray, lattice: Lattice = D2Q9):
    """``(sum_j cx_j f_j, sum_j cy_j f_j)``."""
    cx, cy = _c_consts(lattice, f.dtype)
    return jnp.sum(cx * f, axis=0), jnp.sum(cy * f, axis=0)


def hydro_compressible(f: jnp.ndarray, lattice: Lattice = D2Q9):
    """(rho, u, v) with velocity = momentum / density (``D2Q9.cl:92-97``)."""
    rho = density(f)
    jx, jy = momentum(f, lattice)
    inv = 1.0 / rho
    return rho, jx * inv, jy * inv


def hydro_incompressible(f: jnp.ndarray, lattice: Lattice = D2Q9):
    """(rho, u, v) with velocity = momentum (no density division;
    ``D2Q9i.cl:90-94``)."""
    rho = density(f)
    jx, jy = momentum(f, lattice)
    return rho, jx, jy


def rho_poisson(f: jnp.ndarray, lattice: Lattice = D2Q9) -> jnp.ndarray:
    """``rho = (1/(1-w_0)) * sum_{j>=1} f_j`` — for D2Q9 the prefactor is 9/5
    (``D2Q9_poisson.cl:59``)."""
    pref = 1.0 / (1.0 - lattice.w[0])
    return pref * jnp.sum(f[1:], axis=0)
