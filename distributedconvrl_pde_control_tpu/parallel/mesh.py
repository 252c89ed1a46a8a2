"""Device-mesh helpers."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_dp_sp_mesh(n_devices: int | None = None, sp: int | None = None) -> Mesh:
    """A ('dp', 'sp') mesh over the first `n_devices` devices.

    `sp` defaults to the largest power-of-two divisor of n_devices capped at
    4 — enough spatial shards to exercise the transpose-FFT path while
    keeping a dp axis for the env batch.
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    if sp is None:
        sp = 1
        while sp < 4 and n % (sp * 2) == 0:
            sp *= 2
    assert n % sp == 0
    arr = np.asarray(devices[:n]).reshape(n // sp, sp)
    return Mesh(arr, axis_names=("dp", "sp"))
