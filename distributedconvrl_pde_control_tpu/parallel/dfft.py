"""Distributed 2D FFT (transpose method) for spatially sharded fields.

Layout convention over a sharding axis `sp` of size S:
  * real space  — "y-pencil": block (ny/S, nx), rows sharded;
  * wave space  — "x-pencil": block (ny, nx/S), columns sharded.

dfft2:  local FFT along x (rows are complete) -> all_to_all transpose over
ICI -> local FFT along y. difft2 is the exact inverse. Elementwise spectral
operators (k^2 multiplies, dealias masks) stay in x-pencil layout, so one
solver substep costs exactly two all_to_all transposes per FFT pair — the
standard pencil-decomposition FFT, expressed with `shard_map` collectives
(SURVEY.md §5.7's "TPU-native equivalent" of the reference's spatial scaling
story).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from distributedconvrl_pde_control_tpu.ops import fourier


def dfft2(x_block: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """y-pencil real-space block (ny/S, nx) -> x-pencil spectrum (ny, nx/S)."""
    xh = fourier.fft(x_block, axis=-1)
    xh = jax.lax.all_to_all(xh, axis_name, split_axis=xh.ndim - 1,
                            concat_axis=xh.ndim - 2, tiled=True)
    return fourier.fft(xh, axis=-2)


def difft2(w_block: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """x-pencil spectrum (ny, nx/S) -> y-pencil complex field (ny/S, nx).

    Take `.real` at the call site for real fields.
    """
    x = fourier.ifft(w_block, axis=-2)
    x = jax.lax.all_to_all(x, axis_name, split_axis=x.ndim - 2,
                           concat_axis=x.ndim - 1, tiled=True)
    return fourier.ifft(x, axis=-1)
