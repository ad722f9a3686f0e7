"""Multi-chip domain decomposition for the flow family.

Shards ``f[9, ny, nx]`` over a 2-D device mesh (axes ``("y", "x")``) and runs
the full stream -> BC -> hydro -> feq -> collide step inside ``shard_map``:
streaming reads come from a 1-cell ``ppermute`` halo exchange
(:mod:`lb2d_tpu.parallel.halo`), boundary conditions are applied with
global-coordinate masks (shared tile math with the fused Pallas kernel), and
everything else is shard-local. This is the scaling answer the reference
lacks entirely (single device, ``opencl_dim.py:239-240``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.lattice import Lattice, D2Q9
from ..ops.fused import _moments_feq_collide, _zou_he_tile
from .halo import extend_with_halo

__all__ = ["make_sharded_pipe_step", "make_mesh", "ShardedPipeFlow"]


def make_mesh(n_devices: int | None = None, shape: tuple[int, int] | None = None,
              devices=None) -> Mesh:
    """Build a ``("y", "x")`` mesh from the first ``n_devices`` devices,
    factored as square as possible unless ``shape`` is given."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if shape is None:
        my = int(np.floor(np.sqrt(n)))
        while n % my:
            my -= 1
        shape = (my, n // my)
    assert shape[0] * shape[1] == n
    return Mesh(np.asarray(devices).reshape(shape), ("y", "x"))


def make_sharded_pipe_step(
    *,
    mesh: Mesh,
    ny: int,
    nx: int,
    omega: float,
    inlet_rho: float,
    outlet_rho: float,
    equilibrium: str = "compressible",
    has_obstacle: bool = False,
    lattice: Lattice = D2Q9,
    dtype=jnp.float32,
):
    """Build a sharded ``step(f [, mask]) -> f`` (and the matching sharding).

    The returned step is a ``shard_map``-wrapped pure function; jit it (or
    fold it into ``lax.fori_loop``) with ``f`` placed on
    ``NamedSharding(mesh, P(None, "y", "x"))``.
    """
    my, mx = mesh.shape["y"], mesh.shape["x"]
    assert ny % my == 0 and nx % mx == 0, (
        f"grid {ny}x{nx} must divide mesh {my}x{mx}")
    H, W = ny // my, nx // mx
    q = lattice.q
    incompressible = equilibrium == "incompressible"
    w_inlet = np.asarray(inlet_rho, dtype)
    w_outlet = np.asarray(outlet_rho, dtype)
    w_omega = np.asarray(omega, dtype)
    cxs, cys = lattice.cx, lattice.cy

    y_axis = "y" if my > 1 else None
    x_axis = "x" if mx > 1 else None

    def local_step(f_loc, mask_loc):
        ext = extend_with_halo(f_loc, y_axis, x_axis)  # [q, H+2, W+2]
        st = []
        for j in range(q):
            oy, ox = 1 - cys[j], 1 - cxs[j]
            st.append(ext[j, oy:oy + H, ox:ox + W])

        y0 = jax.lax.axis_index("y") * H if my > 1 else 0
        x0 = jax.lax.axis_index("x") * W if mx > 1 else 0
        rowid = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) + y0
        laneid = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1) + x0

        st = _zou_he_tile(st, rowid, laneid, ny, nx, w_inlet, w_outlet,
                          incompressible)
        mask = (mask_loc != 0) if has_obstacle else None
        res = _moments_feq_collide(st, mask, w_omega, lattice, incompressible,
                                   zero_vel_in_obstacle=incompressible)
        return jnp.stack(res)

    f_spec = P(None, "y", "x")
    m_spec = P("y", "x")
    f_sharding = NamedSharding(mesh, f_spec)

    if has_obstacle:
        step = jax.shard_map(
            local_step, mesh=mesh, in_specs=(f_spec, m_spec),
            out_specs=f_spec)
    else:
        step = jax.shard_map(
            lambda f: local_step(f, None), mesh=mesh, in_specs=(f_spec,),
            out_specs=f_spec)

    return step, f_sharding


class ShardedPipeFlow:
    """Pipe flow sharded over a TPU mesh — API mirrors
    :class:`lb2d_tpu.models.pipe_flow.PipeFlow` (same physics, nondim, and
    getters) with the grid domain-decomposed over ``mesh``."""

    def __init__(self, mesh: Mesh | None = None, **kwargs):
        from ..models.pipe_flow import PipeFlow

        self.mesh = mesh if mesh is not None else make_mesh()
        # Build single-device model for config/state init (XLA backend; the
        # state is then resharded over the mesh).
        base = PipeFlow(backend="xla", **kwargs)
        self.base = base
        self.units = base.units
        self.nx, self.ny = base.nx, base.ny
        self.omega = base.omega
        self.inlet_rho, self.outlet_rho = base.inlet_rho, base.outlet_rho
        self.num_cells = base.num_cells

        step, sharding = make_sharded_pipe_step(
            mesh=self.mesh, ny=self.ny, nx=self.nx, omega=self.omega,
            inlet_rho=self.inlet_rho, outlet_rho=self.outlet_rho,
            equilibrium=base.equilibrium,
            has_obstacle=base.obstacle_mask is not None,
            dtype=base.dtype,
        )
        self._sharding = sharding
        self.state = jax.device_put(base.state, sharding)
        if base.obstacle_mask is not None:
            mask = base.obstacle_mask.astype(jnp.int32)
            self.obstacle_mask = jax.device_put(
                mask, NamedSharding(self.mesh, P("y", "x")))
            self._step = lambda f: step(f, self.obstacle_mask)
        else:
            self.obstacle_mask = None
            self._step = step
        self._run = jax.jit(
            lambda f, n: jax.lax.fori_loop(0, n, lambda i, s: self._step(s), f),
            donate_argnums=0)

    def run(self, num_iterations: int):
        self.state = self._run(self.state, jnp.int32(num_iterations))
        return self

    def block_until_ready(self):
        jax.block_until_ready(self.state)
        return self

    def get_fields(self):
        self.base.state = jax.device_put(self.state, jax.devices()[0])
        return self.base.get_fields()
