"""Aux subsystem tests: metrics, checkpoint/resume, device-side rendering,
matmul-DFT equivalence."""

import os
import tempfile

import numpy as np
import pytest

from lb2d_tpu.models.pipe_flow import PipeFlow
from lb2d_tpu.utils.checkpoint import load_state, restore_model, save_model, save_state
from lb2d_tpu.utils.metrics import MachWatchdog, conservation_report, mach_number
from lb2d_tpu.utils.render import FieldAnimator, colormap_lut, render_field

PARAMS = dict(diameter=1.5, rho=10.0, viscosity=5.0, pressure_grad=-100.0,
              pipe_length=3.0, N=10)


def test_mach_watchdog():
    import jax.numpy as jnp

    u = jnp.full((4, 4), 0.01)
    v = jnp.zeros((4, 4))
    assert mach_number(u, v) == pytest.approx(0.01 * np.sqrt(3), rel=1e-5)
    with pytest.warns(UserWarning, match="Mach"):
        MachWatchdog(tolerance=0.1).check(jnp.full((4, 4), 0.2), v)


def test_conservation_report():
    sim = PipeFlow(**PARAMS)
    rep0 = conservation_report(sim.state)
    sim.run(50)
    rep1 = conservation_report(sim.state)
    # pressure BCs exchange mass through the ends; sums stay finite & close
    assert np.isfinite(rep1["sum_f"])
    assert abs(rep1["sum_f"] - rep0["sum_f"]) < 0.05 * abs(rep0["sum_f"])


def test_checkpoint_roundtrip_plain_state():
    sim = PipeFlow(**PARAMS)
    sim.run(20)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.npz")
        save_model(path, sim)
        before = np.asarray(sim.state)
        sim.run(10)  # diverge
        restore_model(path, sim)
        np.testing.assert_array_equal(np.asarray(sim.state), before)
        # resumed run is deterministic: matches an uninterrupted run
        sim.run(10)
        resumed = np.asarray(sim.state)
        sim2 = PipeFlow(**PARAMS)
        sim2.run(30)
        np.testing.assert_allclose(resumed, np.asarray(sim2.state),
                                   rtol=1e-6, atol=1e-7)


def test_checkpoint_tuple_state():
    from lb2d_tpu.models.diffusion import ReactionAdvectionDiffusionStochastic

    sim = ReactionAdvectionDiffusionStochastic(
        N=15, g=1.0, Dg=1e-4, z=0.1, D=1.0, vx=0.0, vy=0.0, vc=1.0,
        Lx=0.3, Ly=0.3)
    sim.run(10)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.npz")
        save_state(path, sim.state)
        f0 = np.asarray(sim.state[0])
        restored = load_state(path, like=sim.state)
        np.testing.assert_array_equal(np.asarray(restored[0]), f0)
        np.testing.assert_array_equal(np.asarray(restored[1]),
                                      np.asarray(sim.state[1]))


def test_render_field():
    lut = colormap_lut("magma")
    assert lut.shape == (256, 3) and lut.dtype == np.uint8
    field = np.linspace(0, 1, 64 * 32).reshape(64, 32)
    img = np.asarray(render_field(field))
    assert img.shape == (64, 32, 3) and img.dtype == np.uint8
    np.testing.assert_array_equal(img[0, 0], lut[0])
    np.testing.assert_array_equal(img[-1, -1], lut[255])
    # clim clamps like the reference shader
    img2 = np.asarray(render_field(field, clim=(0.25, 0.75)))
    np.testing.assert_array_equal(img2[0, 0], lut[0])
    np.testing.assert_array_equal(img2[-1, -1], lut[255])


def test_field_animator():
    sim = PipeFlow(**PARAMS)
    anim = FieldAnimator(sim, field="u", steps_per_frame=5)
    frame = anim.frame()
    assert frame.shape[-1] == 3 and frame.dtype == np.uint8
    assert sim.steps_taken == 5


def test_matmul_dft_matches_fft():
    from lb2d_tpu.models.spectral import screened_poisson_solve

    c = np.random.RandomState(3).randn(24, 40).astype(np.float32)
    p1, x1, y1 = screened_poisson_solve(c, lam=1.3, dx=0.5, method="fft")
    p2, x2, y2 = screened_poisson_solve(c, lam=1.3, dx=0.5, method="matmul")
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


def test_time_steps_profiling():
    from lb2d_tpu.utils.profiling import time_steps

    sim = PipeFlow(**PARAMS)
    res = time_steps(sim, num_steps=10, repeats=2)
    assert len(res) == 2 and all(r["mlups"] > 0 for r in res)


def test_run_zero_steps_is_noop():
    from lb2d_tpu.models import PipeFlow

    sim = PipeFlow(N=31, pipe_length=1.0, diameter=1.0, rho=1.0,
                   viscosity=1.0, pressure_grad=-10.0)
    before = np.asarray(sim.state).copy()
    sim.run(0)
    np.testing.assert_array_equal(before, np.asarray(sim.state))
    sim.run(0, timed=True)  # timed path handles n=0 too
    assert sim.steps_taken == 0


def test_run_below_steps_per_call_uses_remainder_path():
    """A temporal-blocked model asked for fewer steps than one sweep must
    fall back to single XLA steps and match a plain-XLA twin exactly."""
    from lb2d_tpu.models.diffusion import Diffusion

    sim = Diffusion(Lx=0.21, Ly=0.21, z=0.1, N=63)
    sim.steps_per_call = 4
    sim._single_step = sim._make_xla_step()
    sim._step = sim._make_temporal_step(
        4, __import__("lb2d_tpu.ops.fused", fromlist=["x"])
        .make_temporal_pipe_step, interpret=True)
    import jax
    from functools import partial
    from lb2d_tpu.models.base import _run_loop
    sim._run_compiled = jax.jit(partial(_run_loop, sim._step),
                                donate_argnums=0)
    twin = Diffusion(Lx=0.21, Ly=0.21, z=0.1, N=63)
    step = twin._make_xla_step()
    ref = twin.state
    for _ in range(3):
        ref = step(ref)
    sim.run(3)  # 3 < steps_per_call: pure remainder path
    d = float(np.abs(np.asarray(sim.state) - np.asarray(ref)).max())
    assert d < 1e-6, d


def test_field_animator_multifield():
    """FieldAnimator falls back to get_fields for models without
    device_field and renders a uint8 frame."""
    from lb2d_tpu.models.multifield import FisherExpansion
    from lb2d_tpu.utils.render import FieldAnimator

    sim = FisherExpansion(Lx=4.0, Ly=4.0, mu_standard=1.0, mu_list=[1.0],
                          D_standard=1.0, D_list=[1.0], N=10,
                          initial_frac_widths=[1.0],
                          initial_frac_indices=[0])
    anim = FieldAnimator(sim, field="rho", steps_per_frame=5)
    frame = anim.frame()
    assert frame.dtype == np.uint8
    assert frame.ndim == 3 and frame.shape[-1] in (3, 4)
    assert sim.steps_taken == 5


def test_checkpoint_self_describing_no_template():
    """load_state(path) with NO `like` template reconstructs the full
    pytree structure (nested tuple/dict/None) from the file itself."""
    from lb2d_tpu.utils.checkpoint import load_state, save_state

    state = (np.arange(6, dtype=np.float32).reshape(2, 3),
             {"key": np.asarray([1, 2], np.int32),
              "aux": (np.float32(3.5), None)})
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.npz")
        save_state(path, state)
        out = load_state(path)
    assert isinstance(out, tuple) and isinstance(out[1], dict)
    np.testing.assert_array_equal(out[0], state[0])
    np.testing.assert_array_equal(out[1]["key"], state[1]["key"])
    assert float(out[1]["aux"][0]) == 3.5
    assert out[1]["aux"][1] is None


def test_checkpoint_model_roundtrip_no_template():
    from lb2d_tpu.models.diffusion import ReactionAdvectionDiffusionStochastic
    from lb2d_tpu.utils.checkpoint import load_state, save_state

    sim = ReactionAdvectionDiffusionStochastic(
        N=15, g=1.0, Dg=1e-4, z=0.1, D=1.0, vx=0.0, vy=0.0, vc=1.0,
        Lx=0.3, Ly=0.3)
    sim.run(5)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.npz")
        save_state(path, sim.state)
        out = load_state(path)
    assert isinstance(out, tuple) and len(out) == len(sim.state)
    np.testing.assert_array_equal(out[0], np.asarray(sim.state[0]))


def test_live_view_terminal_and_html(tmp_path):
    """Live viewer (the vispy-window counterpart): ANSI frames to a TTY
    and a self-contained HTML animation."""
    import io
    from lb2d_tpu.utils.render import LiveView

    sim = PipeFlow(**PARAMS)
    lv = LiveView(sim, steps_per_frame=2)
    buf = io.StringIO()
    lv.to_terminal(num_frames=2, max_cols=32, out=buf)
    out = buf.getvalue()
    assert "▀" in out and "frame 2/2" in out
    path = lv.to_html(str(tmp_path / "live.html"), num_frames=2, fps=5)
    html = open(path).read()
    assert html.startswith("<!doctype html>")
    import base64, re
    m = re.search(r"F=\['([A-Za-z0-9+/=]+)'", html)
    assert base64.b64decode(m.group(1))[:8] == b"\x89PNG\r\n\x1a\n"


def test_accumulated_sum_f64_mode():
    """fp64-grade accumulation for the conservation diagnostics
    (VERDICT r3 #7): matches a host float64 ground truth to ~1e-12
    relative where the naive f32 sum is orders looser, and plumbs
    through conservation_report."""
    import jax.numpy as jnp
    from lb2d_tpu.utils.metrics import accumulated_sum, conservation_report

    rs = np.random.RandomState(3)
    # homogeneous-magnitude cells — the conservation-field regime the
    # mode is specified for (docstring: within-window dynamic range is
    # not defended)
    x = (0.5 + rs.rand(512, 512)).astype(np.float32)
    truth = float(np.sum(x.astype(np.float64)))
    xd = jnp.asarray(x)
    f64 = accumulated_sum(xd, "f64")
    assert abs(f64 - truth) / abs(truth) < 3e-9
    # f32 mode still works (and is what it is)
    f32 = accumulated_sum(xd, "f32")
    assert abs(f32 - truth) / abs(truth) < 1e-4
    rep = conservation_report(jnp.stack([xd] * 3), rho=xd, accumulate="f64")
    assert abs(rep["sum_rho"] - truth) / abs(truth) < 3e-9
    assert abs(rep["sum_f"] - 3 * truth) / abs(truth) < 3e-9
