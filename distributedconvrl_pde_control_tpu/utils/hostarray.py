"""Host-transfer helpers.

Some TPU runtimes (the axon PJRT backend) cannot transfer complex device
arrays to host memory; `to_numpy` splits complex arrays into two real
transfers and recombines on the host.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def to_numpy(x) -> np.ndarray:
    if hasattr(x, "dtype") and jnp.iscomplexobj(x):
        return np.asarray(jnp.real(x)) + 1j * np.asarray(jnp.imag(x))
    return np.asarray(x)
