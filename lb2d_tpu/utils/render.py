"""Device-side field rendering (the vispy visualizer, TPU-style).

The reference's ``Field_Visualizer_Canvas`` round-trips every frame through
the host: ``sim.run(k)`` -> ``field.get()`` (GPU->CPU) -> texture re-upload
-> GLSL colormap with clamping (``field_visualizer.py:31-58, 146-161``).
Here the colormap lookup happens **on device**: normalize with clim, index a
256-entry LUT, emit uint8 RGB — only the final small image crosses to the
host. :class:`FieldAnimator` reproduces the run-k-steps-per-frame loop and
optional PNG capture (``field_visualizer.py:61-161``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["colormap_lut", "render_field", "FieldAnimator"]


def colormap_lut(name: str = "magma") -> np.ndarray:
    """256x3 uint8 LUT. Uses matplotlib's colormaps (the reference uses
    ``cm.magma``, ``field_visualizer.py:109-116``)."""
    import matplotlib

    cmap = matplotlib.colormaps[name]
    return (np.asarray(cmap(np.linspace(0, 1, 256)))[:, :3] * 255).astype(
        np.uint8)


def render_field(field, clim=None, lut=None) -> jnp.ndarray:
    """Colormap a 2-D field on device -> uint8 RGB image [H, W, 3].

    ``clim=(lo, hi)`` clamps exactly like the reference's fragment shader
    (``field_visualizer.py:41-52``); defaults to the field's min/max.
    """
    if lut is None:
        lut = colormap_lut()
    lut = jnp.asarray(lut)
    f = jnp.asarray(field)
    if clim is None:
        lo, hi = jnp.min(f), jnp.max(f)
    else:
        lo, hi = clim
    t = jnp.clip((f - lo) / jnp.maximum(hi - lo, 1e-30), 0.0, 1.0)
    idx = jnp.clip((t * 255.0).astype(jnp.int32), 0, 255)
    return lut[idx]


class FieldAnimator:
    """Run a model ``steps_per_frame`` at a time and yield rendered frames —
    the ``Field_Visualizer_Canvas`` loop without the host round-trip per
    frame."""

    def __init__(self, model, field: str = "rho", steps_per_frame: int = 10,
                 clim=None, cmap: str = "magma"):
        self.model = model
        self.field = field
        self.steps_per_frame = steps_per_frame
        self.clim = clim
        self._lut = jnp.asarray(colormap_lut(cmap))
        self._render = jax.jit(
            lambda f: render_field(f, clim=self.clim, lut=self._lut))

    def frame(self) -> np.ndarray:
        """Advance and return the next frame as a host uint8 array.

        When the model supports device-side field extraction, the whole
        sim->colormap pipeline stays on device and only the uint8 image
        crosses to the host (the reference round-trips the full float field
        every frame, ``field_visualizer.py:146-157``)."""
        self.model.run(self.steps_per_frame)
        field = None
        if hasattr(self.model, "device_field"):
            field = self.model.device_field(self.field)
        if field is None:
            field = jnp.asarray(self.model.get_fields()[self.field])
            if field.ndim == 3:  # reference layout [nx, ny, F]: show field 0
                field = field[..., 0].T
        img = self._render(field)
        return np.asarray(img)

    def save_png(self, path: str) -> None:
        """Optional screenshot capture (``field_visualizer.py:159-161``)."""
        import matplotlib.pyplot as plt

        plt.imsave(path, self.frame())
