"""Spectral screened-Poisson solver via ``jnp.fft`` (replaces gpyfft).

Rebuilds ``spectral_poisson/screened_poisson.py`` (``Screened_Poisson``):
solve ``(1 - lam^2 nabla^2) phi = charge`` in Fourier space with multiplier
``1 / (lam^2 k^2 + 1)`` (``screened_poisson.py:38``) and produce the two
gradient fields via spectral differentiation ``2 pi i k phi_hat``
(``screened_poisson.py:60-84``).

Frequency convention preserved exactly: ``k = L * fftfreq(n, d=dx)`` —
integer cycles-per-box (``screened_poisson.py:26-27``) — and the gradient
multiplier is ``2 pi i k`` *without* the 1/L factor
(``screened_poisson.py:70-71``); consumers absorb the scale
(``screened_poisson_waves.py:353-361``).

The reference runs three separate gpyfft plans with host-side event waits
per solve (``screened_poisson.py:50-88``); here the whole
solve-and-gradients pipeline is one jitted function, so coupled models can
fold it into their step (``jnp.fft`` shards over a mesh when inputs are
sharded).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ScreenedPoisson", "screened_poisson_solve"]


@partial(jax.jit, static_argnames=())
def _solve(charge, rescaling, kx2pi, ky2pi):
    chat = jnp.fft.fft2(charge) * rescaling
    phi = jnp.fft.ifft2(chat)
    xgrad = jnp.fft.ifft2(chat * kx2pi)
    ygrad = jnp.fft.ifft2(chat * ky2pi)
    return phi, xgrad, ygrad


def screened_poisson_solve(charge, lam=1.0, dx=1.0):
    """Functional one-shot solve: returns (phi, xgrad, ygrad) as complex
    arrays, ``charge`` indexed ``[y, x]``."""
    ny, nx = charge.shape
    fx = (nx * dx) * np.fft.fftfreq(nx, d=dx)
    fy = (ny * dx) * np.fft.fftfreq(ny, d=dx)
    KX = jnp.asarray(fx[None, :], jnp.complex64)
    KY = jnp.asarray(fy[:, None], jnp.complex64)
    rescaling = 1.0 / (lam**2 * (KX.real**2 + KY.real**2) + 1.0)
    return _solve(jnp.asarray(charge, jnp.complex64),
                  rescaling.astype(jnp.complex64),
                  (2j * np.pi) * KX, (2j * np.pi) * KY)


class ScreenedPoisson:
    """API mirror of ``Screened_Poisson``. ``charge`` is ``[ny, nx]``
    complex64 (the reference's is (nx, ny) x-major; pass ``xy=True`` to
    accept that layout)."""

    def __init__(self, charge_cpu, lam=1.0, dx=1.0, xy=False):
        c = np.asarray(charge_cpu)
        if xy:
            c = c.T
        self.lam = lam
        self.dx = dx
        self.charge = jnp.asarray(c, jnp.complex64)
        ny, nx = self.charge.shape
        fx = (nx * dx) * np.fft.fftfreq(nx, d=dx)
        fy = (ny * dx) * np.fft.fftfreq(ny, d=dx)
        self._KX = jnp.asarray(fx[None, :] + 0 * fy[:, None], jnp.float32)
        self._KY = jnp.asarray(fy[:, None] + 0 * fx[None, :], jnp.float32)
        self.rescaling = (1.0 / (lam**2 * (self._KX**2 + self._KY**2) + 1.0)
                          ).astype(jnp.complex64)
        self.xgrad_rescale = (2j * np.pi * self._KX).astype(jnp.complex64)
        self.ygrad_rescale = (2j * np.pi * self._KY).astype(jnp.complex64)
        self.xgrad = None
        self.ygrad = None

    # -- reference API ---------------------------------------------------------
    def create_grad_fields(self):
        self.xgrad = self.charge + 0
        self.ygrad = self.charge + 0

    def fft_and_screen(self):
        """In the reference this leaves ``charge`` holding the *screened
        spectrum* (``screened_poisson.py:50-55``)."""
        self.charge = jnp.fft.fft2(self.charge) * self.rescaling

    def inverse_fft(self):
        self.charge = jnp.fft.ifft2(self.charge)

    def update_grad_fields(self):
        """Requires :meth:`fft_and_screen` first (charge = screened spectrum)."""
        self.xgrad = jnp.fft.ifft2(self.charge * self.xgrad_rescale)
        self.ygrad = jnp.fft.ifft2(self.charge * self.ygrad_rescale)

    def solve_and_update_grad_fields(self):
        self.fft_and_screen()
        self.update_grad_fields()

    def set_charge(self, charge, xy=False):
        c = jnp.asarray(charge)
        if xy:
            c = c.T
        self.charge = c.astype(jnp.complex64)
