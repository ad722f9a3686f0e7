"""Base machinery shared by every simulation model.

The reference drives 5-6 blocking kernel launches per step from the host
(``opencl_dim.py:372-387``). Here a model is a pure ``step(state) -> state``
function compiled once; ``run(n)`` executes ``n`` steps on-device inside a
single ``lax.fori_loop`` with the state buffer donated, so the host is never
in the loop and XLA fuses the whole step into a handful of HBM passes.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["LBModel"]


class LBModel:
    """Owns a state pytree and a compiled multi-step runner.

    Subclasses must set ``self.state`` (a pytree of device arrays) and
    implement :meth:`make_step` returning a pure ``step(state) -> state``.
    """

    def __init__(self):
        self._step = self.make_step()
        if getattr(self._step, "carried", False):
            # density-emit steps carry (f, rho): the kernel's second
            # output feeds the next step's solve; the carry seeds from one
            # roll pass per run() call (amortized), and `f`'s only
            # consumer inside the loop is the aliased in-place kernel
            self._run_compiled = jax.jit(
                partial(_run_carried_loop, self._step, self._step.init_carry),
                donate_argnums=0)
        else:
            self._run_compiled = jax.jit(
                partial(_run_loop, self._step), donate_argnums=0
            )
        self.steps_taken = 0
        self.last_mlups = None

    @property
    def _remainder_step(self):
        """Single-LB-step function for leftover iterations when the main step
        advances more than one (temporal blocking). Subclasses with
        ``steps_per_call > 1`` must set ``self._single_step``."""
        if not hasattr(self, "_single_step_jit"):
            one = self._single_step
            if getattr(one, "carried", False):
                ic = one.init_carry
                self._single_step_jit = jax.jit(lambda f: one(ic(f))[0])
            else:
                self._single_step_jit = jax.jit(one)
        return self._single_step_jit

    # -- to be provided by subclasses ---------------------------------------
    def make_step(self):
        raise NotImplementedError

    @property
    def num_cells(self) -> int:
        raise NotImplementedError

    # -- execution ------------------------------------------------------------
    def run(self, num_iterations: int, *, timed: bool = False):
        """Advance the simulation ``num_iterations`` steps on-device.

        Mirrors ``Pipe_Flow.run`` (``opencl_dim.py:372-387``). With
        ``timed=True`` blocks until done and records throughput in
        ``self.last_mlups`` (million lattice-site updates per second, the
        reference's benchmark metric).
        """
        # temporal-blocked steps advance `steps_per_call` LB steps per call;
        # the remainder falls back to the single-step function
        spc = getattr(self, "steps_per_call", 1)
        n_calls, rem = divmod(num_iterations, spc)
        if timed and not getattr(self, "_warm", False):
            # compile outside the timed region (a 0-step call builds the same
            # executable: the iteration count is a traced argument)
            self.state = self._run_compiled(self.state, jnp.int32(0))
            if rem:
                # AOT-compile the remainder step without executing it
                self._remainder_step.lower(self.state).compile()
            _force_completion(self.state)
            self._warm = True
        t0 = time.perf_counter() if timed else None
        self.state = self._run_compiled(self.state, jnp.int32(n_calls))
        for _ in range(rem):
            self.state = self._remainder_step(self.state)
        if timed:
            _force_completion(self.state)
            dt = time.perf_counter() - t0
            self.last_mlups = self.num_cells * num_iterations / dt / 1e6
        self.steps_taken += num_iterations
        return self

    def block_until_ready(self):
        jax.block_until_ready(self.state)
        return self

    # -- device-side field access (for rendering without host round-trips) ----
    def device_field(self, name):
        """Return one 2-D field as a device array [ny, nx], or None if the
        model doesn't support device-side extraction (renderer falls back to
        ``get_fields``)."""
        return None

    # -- helpers ---------------------------------------------------------------
    @staticmethod
    def _to_host_xy(arr) -> np.ndarray:
        """Device ``[..., ny, nx]`` -> host ``[..., nx, ny]`` to match the
        reference's (x, y)-indexed field arrays (``opencl_dim.py:390-415``)."""
        a = np.asarray(arr)
        return np.swapaxes(a, -1, -2)


def _run_loop(step, state, n):
    return jax.lax.fori_loop(0, n, lambda i, s: step(s), state)


def _run_carried_loop(step, init_carry, state, n):
    return jax.lax.fori_loop(0, n, lambda i, s: step(s),
                             init_carry(state))[0]


def _force_completion(state):
    """Reliable completion barrier: a tiny device->host readback.

    ``jax.block_until_ready`` can return before remote execution finishes on
    tunneled backends when outputs alias donated inputs; reading a value back
    cannot."""
    leaf = jax.tree_util.tree_leaves(state)[0]
    float(jnp.sum(jnp.ravel(leaf)[:8]))
