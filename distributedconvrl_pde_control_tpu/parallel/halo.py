"""Halo exchange for stencil operators on spatially sharded fields.

`ppermute`-based ghost-cell exchange over a mesh axis — the TPU-native
replacement for the locality the reference gets from windowed observations
(SURVEY.md §2.3 / §5.7). Used by finite-difference solvers (Keller–Segel)
when the 1D grid is sharded, and available for any future real-space stencil.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def halo_exchange_1d(block: jnp.ndarray, axis_name: str, halo: int = 1,
                     periodic: bool = True) -> jnp.ndarray:
    """Pad a locally sharded axis(-1) block with `halo` ghost cells from the
    ring neighbors: returns (..., halo + n_local + halo).

    With `periodic=False` the outermost blocks get clamped (edge-replicated)
    ghosts, matching the reference Keller–Segel boundary fix
    (KellerSegelSetup.jl:221-224).
    """
    n_dev = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    right_edge = block[..., -halo:]
    left_edge = block[..., :halo]
    # send my right edge to my right neighbor (it becomes their left ghost)
    perm_fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    perm_bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    left_ghost = jax.lax.ppermute(right_edge, axis_name, perm_fwd)
    right_ghost = jax.lax.ppermute(left_edge, axis_name, perm_bwd)
    if not periodic:
        # clamp at the global domain ends
        left_ghost = jnp.where(idx == 0, jnp.broadcast_to(block[..., :1], left_ghost.shape),
                               left_ghost)
        right_ghost = jnp.where(idx == n_dev - 1,
                                jnp.broadcast_to(block[..., -1:], right_ghost.shape),
                                right_ghost)
    return jnp.concatenate([left_ghost, block, right_ghost], axis=-1)
