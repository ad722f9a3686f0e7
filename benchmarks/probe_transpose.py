"""Probe: in-kernel Mosaic 2-D transpose of a [tw, n] tile -> [n, tw].

Times a Pallas kernel that reads row tiles of A [W, n], transposes each in
VMEM, and writes column tiles of A^T [n, W] — the building block for
transpose-free DFT passes. Compares against the XLA transpose.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass


def make_tr(W, n, tw=128):
    def kernel(x_ref, o_ref):
        o_ref[:] = jnp.transpose(x_ref[:], (1, 0))

    return pl.pallas_call(
        kernel,
        grid=(W // tw,),
        in_specs=[pl.BlockSpec((tw, n), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((n, tw), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((n, W), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


def _time(fn, x, iters=20, reps=5, label=""):
    run = jax.jit(lambda x0: jax.lax.fori_loop(
        0, iters, lambda i, v: fn(v).T * 0.5 + 0.5 * v, x0))
    y = run(x)
    float(jnp.sum(jnp.ravel(y)[:4]))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        y = run(x)
        float(jnp.sum(jnp.ravel(y)[:4]))
        ts.append((time.perf_counter() - t0) / iters)
    ms = 1e3 * np.median(ts)
    print(f"{label:40s} {ms:8.2f} ms (min {1e3*min(ts):.2f})", flush=True)


def main(W=4224, n=8192):
    x = jax.random.uniform(jax.random.PRNGKey(0), (W, n), jnp.float32)
    tr = make_tr(W, n)
    y = tr(x)
    np.testing.assert_array_equal(np.asarray(y[:4, :4]),
                                  np.asarray(x[:4, :4].T))
    print("correct", flush=True)
    # NOTE: the .T in the harness adds an XLA transpose back — both
    # branches carry it, so the DIFFERENCE isolates kernel vs XLA cost.
    _time(tr, x, label=f"pallas transpose [{W},{n}]")
    _time(lambda v: v.T, x, label=f"XLA transpose [{W},{n}]")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:3])) if len(sys.argv) > 1 else main()
