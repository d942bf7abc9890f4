"""Device mesh helpers."""

from __future__ import annotations

import jax
import numpy as np


def make_mesh(shape: tuple[int, ...] | None = None,
              axis_names: tuple[str, ...] = ("dsp",),
              devices=None) -> jax.sharding.Mesh:
    """Create a named mesh over the available devices.

    Default: one axis named "dsp" spanning all devices — the axis used for
    shift/time sharding by the parallel ops.
    """
    if devices is None:
        devices = jax.devices()
    if shape is None:
        shape = (len(devices),)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, "
                         f"have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(shape)
    return jax.sharding.Mesh(arr, axis_names)


def default_mesh() -> jax.sharding.Mesh:
    return make_mesh()
