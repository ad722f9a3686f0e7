"""Multi-host (multi-process) runtime initialization.

The reference is strictly single-process/single-device
(``opencl_dim.py:229-240`` picks ``devices[0]``); SURVEY.md §2.4 names
``jax.distributed`` + ICI/DCN collectives as the TPU-native scaling answer
beyond one host. This module is that entry point: initialize the JAX
distributed runtime, build a global ``("y", "x")`` mesh over every chip in
the job, and hand back the same mesh object every sharded surface in
:mod:`lb2d_tpu.parallel.sharded` already consumes — the shard_map programs
are SPMD over *global* devices, so nothing else changes between one host
and many (halo ppermutes ride ICI within a slice and DCN across slices).

Single-process environments (including the CI dry run) use
``num_processes=1``, which skips the coordinator handshake entirely.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["init_distributed", "global_mesh", "is_initialized"]

_initialized = False


def is_initialized() -> bool:
    return _initialized


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None,
                     local_device_ids=None) -> None:
    """Initialize the multi-process JAX runtime (no-op for 1 process).

    Mirrors ``jax.distributed.initialize``: every process in the job calls
    this before any computation, with the same ``coordinator_address``
    (host:port of process 0) and its own ``process_id``. On TPU pods the
    arguments are usually inferable from the environment and may be left
    None. After this, ``jax.devices()`` enumerates every chip in the job
    and the sharded models run unchanged over a :func:`global_mesh`.
    """
    global _initialized
    if num_processes in (None, 1) and coordinator_address is None:
        # single-process: nothing to coordinate; mark initialized so
        # callers can treat the two paths uniformly
        _initialized = True
        return
    try:
        # CPU multi-process jobs (CI, the 2-process parity test) need a
        # real cross-process collectives backend; gloo ships with jaxlib.
        # TPU jobs never enter here (platforms is unset / "tpu").
        if "cpu" in str(getattr(jax.config, "jax_platforms", "") or ""):
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True


def global_mesh(shape: tuple[int, int] | None = None,
                contiguous_y: bool = True) -> Mesh:
    """A ``("y", "x")`` mesh over every device in the (possibly
    multi-process) job.

    With ``contiguous_y`` (default) devices keep enumeration order along y
    first, so each process's addressable shards are contiguous grid rows —
    y-halo ppermutes cross process boundaries only at shard seams (DCN
    traffic is one CH-row chunk per seam per sweep; everything interior
    rides ICI).
    """
    devices = jax.devices()
    n = len(devices)
    if shape is None:
        my = int(np.floor(np.sqrt(n)))
        while n % my:
            my -= 1
        shape = (n // my, my) if contiguous_y else (my, n // my)
        # prefer the taller mesh: y-decomposition is the kernel fast path
        if shape[0] < shape[1]:
            shape = (shape[1], shape[0])
    assert shape[0] * shape[1] == n, (shape, n)
    return Mesh(np.asarray(devices).reshape(shape), ("y", "x"))
