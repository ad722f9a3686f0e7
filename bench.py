"""Headline benchmark: MLUPS at 4096^2 D2Q9 pressure-driven pipe flow.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = 325 MLUPS, the reference pyOpenCL implementation on a GTX Titan
Black (reference README.md:6-7 / python_cython_opencl_comparison.ipynb).
"""

import json
import os
import time
from functools import partial

import jax
import jax.numpy as jnp

# Persistent compilation cache: the 4096^2 K=8 Mosaic compile takes minutes
# cold; cached it loads in seconds, keeping the whole benchmark well under
# typical harness timeouts. Warm with `python bench.py` once.
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass  # older jax: run uncached

BASELINE_MLUPS = 325.0

# Nominal calibration ranges for a healthy, uncontended v5e session
# (samples: r4 298.3 GB/s / 87.4 TF; r5 fresh-session 232.6 / 73.9 —
# see benchmarks/RESULTS.md "Calibration baseline"). The midpoints below
# anchor the >10% deviation annotation; a "calib_note" in the JSON means
# the session's device was slow/contended and the headline should be read
# against same-session controls, not across rounds.
NOMINAL_CALIB = {"copy_gbps": 298.0, "mxu_tflops": 87.0}


def _calibrate():
    """Environment-context probes (VERDICT r3 #9): a copy-bound and an
    MXU-bound microkernel timed the same way as the benchmark. Their
    throughputs pin the session's effective HBM bandwidth and matmul rate,
    so cross-session spread in the headline number is attributable (a slow
    `calib` means a slow/contended device, not a code regression)."""
    import numpy as np

    @partial(jax.jit, donate_argnums=0)
    def copy_loop(x, n):
        return jax.lax.fori_loop(0, n, lambda i, v: v * 0.999 + 1e-9, x)

    @jax.jit
    def mm_loop(a, n):
        def body(i, v):
            return jnp.dot(v, v, preferred_element_type=jnp.bfloat16)
        return jax.lax.fori_loop(0, n, body, a)

    out = {}
    try:
        x = jnp.ones((4096, 4096), jnp.float32)
        x = copy_loop(x, jnp.int32(2))
        float(jnp.sum(x[0, :8]))
        iters = 100
        t0 = time.perf_counter()
        x = copy_loop(x, jnp.int32(iters))
        float(jnp.sum(x[0, :8]))
        dt = time.perf_counter() - t0
        out["copy_gbps"] = round(2 * x.size * 4 * iters / dt / 1e9, 1)

        a = jnp.full((4096, 4096), 1e-6, jnp.bfloat16)
        a = mm_loop(a, jnp.int32(2))
        float(jnp.sum(a.astype(jnp.float32)[0, :8]))
        iters = 30
        t0 = time.perf_counter()
        a = mm_loop(a, jnp.int32(iters))
        float(jnp.sum(a.astype(jnp.float32)[0, :8]))
        dt = time.perf_counter() - t0
        out["mxu_tflops"] = round(2 * 4096**3 * iters / dt / 1e12, 1)
    except Exception as e:  # calibration must never sink the benchmark
        out["error"] = str(e)[:120]
    return out


def main():
    from lb2d_tpu.models.pipe_flow import PipeFlow
    from lb2d_tpu.ops.fused import (
        make_pipelined_pipe_step,
        make_temporal_pipe_step,
        supports_pipelined,
        supports_temporal,
    )

    sim = PipeFlow(diameter=1.0, rho=1.0, viscosity=0.1, pressure_grad=-0.01,
                   pipe_length=1.0, N=4095, backend="xla")
    ny, nx = sim.ny, sim.nx
    kw = dict(ny=ny, nx=nx, omega=sim.omega,
              inlet_rho=sim.inlet_rho, outlet_rho=sim.outlet_rho)

    on_tpu = jax.default_backend() == "tpu"
    steps_per_call = 1
    if on_tpu and supports_temporal(ny, nx, 8):
        step = make_temporal_pipe_step(k_steps=8, **kw)  # 8 LB steps/sweep
        steps_per_call = 8
    elif on_tpu and supports_pipelined(ny, nx):
        step = make_pipelined_pipe_step(**kw)
    else:
        step = sim.make_step()

    @partial(jax.jit, donate_argnums=0)
    def run_n(f, n):
        return jax.lax.fori_loop(0, n, lambda i, f: step(f), f)

    def sync(f):
        # On the axon-tunneled backend, block_until_ready can ack before
        # remote execution finishes (donated buffers alias and report ready);
        # a device->host readback is the only reliable completion barrier.
        return float(jnp.sum(f[0, 0, :8]))

    # Measurement protocol: warm (compile + remainder paths) outside the
    # timed region, then >= 5 timed repeats; report the MEDIAN with min/max
    # dispersion so a container-noise outlier can't masquerade as a
    # regression (or an improvement).
    n_warm, n_meas, reps = (5, 40, 7) if on_tpu else (2, 2, 3)
    f = run_n(sim.state, jnp.int32(n_warm))
    sync(f)
    rates = []
    for _ in range(reps):
        t0 = time.perf_counter()
        f = run_n(f, jnp.int32(n_meas))
        sync(f)
        dt = time.perf_counter() - t0
        rates.append(ny * nx * n_meas * steps_per_call / dt / 1e6)
    assert bool(jnp.isfinite(f).all()), "non-finite state after benchmark"

    rates.sort()
    mlups = rates[len(rates) // 2]
    calib = _calibrate() if on_tpu else {"skipped": "not on tpu"}
    devs = {k: calib[k] / NOMINAL_CALIB[k] - 1.0
            for k in NOMINAL_CALIB if k in calib}
    if any(abs(d) > 0.10 for d in devs.values()):
        calib["note"] = ("device at " + ", ".join(
            f"{k} {100 * (1 + d):.0f}% of nominal" for k, d in devs.items())
            + " — compare against same-session controls")
    print(json.dumps({
        "metric": "MLUPS@4096^2 D2Q9 pipe flow",
        "value": round(mlups, 1),
        "unit": "MLUPS",
        "vs_baseline": round(mlups / BASELINE_MLUPS, 2),
        "spread": {"min": round(rates[0], 1), "max": round(rates[-1], 1),
                   "reps": reps, "steps_per_rep": n_meas * steps_per_call},
        "calib": calib,
    }))


if __name__ == "__main__":
    main()
