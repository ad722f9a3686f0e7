"""Equilibrium distributions (feq) for every model family.

Each variant reproduces one of the reference's ``update_feq*`` kernels:

* :func:`feq_quadratic` — standard compressible D2Q9 (``D2Q9.cl:45-62``;
  the Succi-rearranged form in ``python_dim.py:151-180`` is algebraically
  identical).
* :func:`feq_incompressible` — He-Luo incompressible variant
  (``D2Q9i.cl:45-62``).
* :func:`feq_linear` — advection-diffusion linear feq
  (``D2Q9_diffusion.cl:1-38``).
* :func:`feq_poisson` — Chai-Shi Poisson feq (``D2Q9_poisson.cl:1-31``).

All return ``[Q, ny, nx]`` given 2-D hydro fields; computation broadcasts the
per-direction constants so XLA fuses everything into a single VPU pass.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.lattice import Lattice, D2Q9

__all__ = [
    "feq_quadratic",
    "feq_incompressible",
    "feq_linear",
    "feq_poisson",
]


def _consts(lattice: Lattice, dtype):
    w = jnp.asarray(np.asarray(lattice.w, dtype=dtype))[:, None, None]
    cx = jnp.asarray(np.asarray(lattice.cx, dtype=dtype))[:, None, None]
    cy = jnp.asarray(np.asarray(lattice.cy, dtype=dtype))[:, None, None]
    return w, cx, cy


def feq_quadratic(rho, u, v, lattice: Lattice = D2Q9) -> jnp.ndarray:
    """``w_j rho (1 + c.u/cs2 + (c.u)^2/(2 cs4) - u^2/(2 cs2))``
    (``D2Q9.cl:55-60``)."""
    dtype = rho.dtype
    w, cx, cy = _consts(lattice, dtype)
    cs2 = jnp.asarray(lattice.cs2, dtype)
    cu = cx * u + cy * v
    usq = u * u + v * v
    inner = 1.0 + cu / cs2 + (cu * cu) / (2.0 * cs2 * cs2) - usq / (2.0 * cs2)
    return w * rho * inner


def feq_incompressible(rho, u, v, lattice: Lattice = D2Q9) -> jnp.ndarray:
    """He-Luo incompressible feq: ``w_j (rho + c.u/cs2 + (c.u)^2/(2 cs4)
    - u^2/(2 cs2))`` — density only multiplies the constant term
    (``D2Q9i.cl:55-60``)."""
    dtype = rho.dtype
    w, cx, cy = _consts(lattice, dtype)
    cs2 = jnp.asarray(lattice.cs2, dtype)
    cu = cx * u + cy * v
    usq = u * u + v * v
    inner = rho + cu / cs2 + (cu * cu) / (2.0 * cs2 * cs2) - usq / (2.0 * cs2)
    return w * inner


def feq_linear(rho, u, v, lattice: Lattice = D2Q9) -> jnp.ndarray:
    """Advection-diffusion feq, linear in velocity:
    ``w_j rho (1 + c.u/cs2)`` (``D2Q9_diffusion.cl:27-36``)."""
    dtype = rho.dtype
    w, cx, cy = _consts(lattice, dtype)
    cs2 = jnp.asarray(lattice.cs2, dtype)
    cu = cx * u + cy * v
    return w * rho * (1.0 + cu / cs2)


def feq_poisson(rho, lattice: Lattice = D2Q9) -> jnp.ndarray:
    """Chai-Shi Poisson-equation feq: ``(w_0 - 1) rho`` for the rest
    population, ``w_j rho`` otherwise (``D2Q9_poisson.cl:17-29``)."""
    dtype = rho.dtype
    w = jnp.asarray(np.asarray(lattice.w, dtype=dtype))[:, None, None]
    rest = jnp.zeros((lattice.q,), dtype).at[0].set(1.0)[:, None, None]
    return (w - rest) * rho
