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


# --------------------------------------------------------- (re, im) variants
# Real-TPU runtimes handle complex poorly (see ops.fourier); the sharded
# solvers therefore use split-component transforms: local DFTs via
# ops.fourier (backend-adaptive), one all_to_all per transpose with the two
# components stacked on a leading axis.
from distributedconvrl_pde_control_tpu.ops import fourier  # noqa: E402


def _transpose_ri(xr, xi, axis_name, split_axis, concat_axis):
    z = jnp.stack([xr, xi])
    z = jax.lax.all_to_all(z, axis_name, split_axis=split_axis + 1,
                           concat_axis=concat_axis + 1, tiled=True)
    return z[0], z[1]


def dfft2_ri(xr, xi, axis_name: str, mode: str = "auto"):
    """y-pencil (re, im) blocks (.., ny/S, nx) -> x-pencil spectra (.., ny, nx/S)."""
    if xi is None:
        xi = jnp.zeros_like(xr)
    xr, xi = fourier._fft_ri_axis(xr, xi, -1, -1.0, mode)
    xr, xi = _transpose_ri(xr, xi, axis_name, xr.ndim - 1, xr.ndim - 2)
    return fourier._fft_ri_axis(xr, xi, -2, -1.0, mode)


def difft2_ri(wr, wi, axis_name: str, mode: str = "auto"):
    """x-pencil spectra -> y-pencil (re, im) field blocks."""
    wr, wi = fourier._fft_ri_axis(wr, wi, -2, 1.0, mode)
    wr, wi = _transpose_ri(wr, wi, axis_name, wr.ndim - 2, wr.ndim - 1)
    return fourier._fft_ri_axis(wr, wi, -1, 1.0, mode)


def difft2_ri_real(wr, wi, axis_name: str, mode: str = "auto"):
    re, _ = difft2_ri(wr, wi, axis_name, mode)
    return re
