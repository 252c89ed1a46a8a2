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


def start_host_copies(tree) -> None:
    """Kick off async device->host copies for every array in a pytree.

    The chunked training drivers consume per-chunk records one chunk late
    (software pipeline); each record array read is otherwise a SYNCHRONOUS
    ~20 ms RPC through the axon tunnel — latency-bound, since the arrays
    are tiny. Starting the copies at dispatch time lets that latency overlap
    the next chunk's device compute, so the deferred `np.asarray` reads find
    the bytes already on host. Best-effort: backends without
    `copy_to_host_async` just fall back to the synchronous read later."""
    import jax

    def _start(x):
        start = getattr(x, "copy_to_host_async", None)
        if start is not None:
            start()

    jax.tree.map(_start, tree)
