"""Spectral helpers: wavenumber grids and 3/2-rule pad/chop re-gridding.

Wavenumber conventions follow the reference solvers:
  * KS (1D): integer wavenumbers with the Nyquist mode of the *derivative*
    operator zeroed (reference `scripts/KS/setup/KSSetup.jl:115-118` builds
    `kx = [0:nx/2-1, 0, -nx/2+1:-1]`).
  * Navier–Stokes (2D): full wavenumbers including a signed Nyquist
    (`scripts/Fluid/setup/FluidSetup.jl:106-118`).

We use real FFTs (`rfft`) for 1D real fields — exactly equivalent to the
reference's complex in-place FFT plans for real data, at half the bandwidth —
and complex 2D FFTs for the vorticity solver whose state is spectral.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def ks_rfft_operators(nx: int, lx: float):
    """1D wavenumber operators on the rfft half-spectrum (length nx//2+1).

    Returns (alpha, d_op, lin_op):
      alpha  — real wavenumbers 2*pi*k/Lx with the Nyquist entry zeroed,
               mirroring the reference's `kx = [0:nx/2-1, 0, -nx/2+1:-1]`
               (KSSetup.jl:115-116);
      d_op   — d/dx in Fourier space, `1im*alpha` (KSSetup.jl:117);
      lin_op — the KS linear operator `alpha^2 - alpha^4` = -D^2 - D^4
               (KSSetup.jl:118).
    """
    k = np.arange(nx // 2 + 1, dtype=np.float64)
    k[-1] = 0.0  # zero the Nyquist mode, as the reference does
    alpha = 2.0 * np.pi * k / lx
    d_op = 1j * alpha
    lin_op = alpha**2 - alpha**4
    # NumPy (host) arrays: solver __post_init__ composes these further, and
    # some TPU runtimes (axon) cannot transfer complex device arrays to host.
    return (
        alpha.astype(np.float32),
        d_op.astype(np.complex64),
        lin_op.astype(np.float32),
    )


def fft_wavenumbers(n: int, length: float) -> np.ndarray:
    """Full-spectrum wavenumbers [0..n/2, -n/2+1..-1] * 2*pi/length.

    Matches `kx = [0:(nx/2); (-nx/2+1):(-1)]/Lx*2*pi` at FluidSetup.jl:106
    (signed Nyquist kept, unlike the KS operator above).
    """
    k = np.concatenate([np.arange(0, n // 2 + 1), np.arange(-n // 2 + 1, 0)])
    return k * 2.0 * np.pi / length


def pad_32(f: jnp.ndarray, nyp: int, nxp: int) -> jnp.ndarray:
    """3/2-rule zero padding in 2D wavespace (semantics of fluid_rk4.jl:192-210).

    Copies the four low-frequency quadrants of the (ny, nx) spectrum into a
    (nyp, nxp) spectrum whose high-frequency band is zero.
    """
    ny, nx = f.shape
    ny2, nx2 = ny // 2, nx // 2
    fp = jnp.zeros((nyp, nxp), dtype=f.dtype)
    fp = fp.at[: ny2 + 1, : nx2 + 1].set(f[: ny2 + 1, : nx2 + 1])
    fp = fp.at[: ny2 + 1, nxp - nx2 + 1 :].set(f[: ny2 + 1, nx2 + 1 :])
    fp = fp.at[nyp - ny2 + 1 :, : nx2 + 1].set(f[ny2 + 1 :, : nx2 + 1])
    fp = fp.at[nyp - ny2 + 1 :, nxp - nx2 + 1 :].set(f[ny2 + 1 :, nx2 + 1 :])
    return fp


def chop_32(fp: jnp.ndarray, ny: int, nx: int) -> jnp.ndarray:
    """Inverse of `pad_32`: drop the high-frequency band (fluid_rk4.jl:212-229)."""
    nyp, nxp = fp.shape
    ny2, nx2 = ny // 2, nx // 2
    f = jnp.zeros((ny, nx), dtype=fp.dtype)
    f = f.at[: ny2 + 1, : nx2 + 1].set(fp[: ny2 + 1, : nx2 + 1])
    f = f.at[: ny2 + 1, nx2 + 1 :].set(fp[: ny2 + 1, nxp - nx2 + 1 :])
    f = f.at[ny2 + 1 :, : nx2 + 1].set(fp[nyp - ny2 + 1 :, : nx2 + 1])
    f = f.at[ny2 + 1 :, nx2 + 1 :].set(fp[nyp - ny2 + 1 :, nxp - nx2 + 1 :])
    return f


def pad_32_half(f: jnp.ndarray, nyp: int, nxp: int) -> jnp.ndarray:
    """3/2-rule padding for HALF spectra (real-field rfft2 layout).

    f: (..., ny, nx//2+1) -> (..., nyp, nxp//2+1). The x axis holds only
    non-negative wavenumbers, so padding is a plain right-extension with
    zeros; the y axis splits into the usual low-frequency quadrants
    (semantics of `pad_32` / fluid_rk4.jl:192-210 restricted to kx >= 0).
    """
    ny, nxh = f.shape[-2], f.shape[-1]
    ny2 = ny // 2
    out_shape = f.shape[:-2] + (nyp, nxp // 2 + 1)
    fp = jnp.zeros(out_shape, dtype=f.dtype)
    fp = fp.at[..., : ny2 + 1, :nxh].set(f[..., : ny2 + 1, :])
    fp = fp.at[..., nyp - ny2 + 1 :, :nxh].set(f[..., ny2 + 1 :, :])
    return fp


def chop_32_half(fp: jnp.ndarray, ny: int, nx: int) -> jnp.ndarray:
    """Inverse of `pad_32_half`: (..., nyp, nxp//2+1) -> (..., ny, nx//2+1)."""
    nyp = fp.shape[-2]
    ny2 = ny // 2
    nxh = nx // 2 + 1
    out_shape = fp.shape[:-2] + (ny, nxh)
    f = jnp.zeros(out_shape, dtype=fp.dtype)
    f = f.at[..., : ny2 + 1, :].set(fp[..., : ny2 + 1, :nxh])
    f = f.at[..., ny2 + 1 :, :].set(fp[..., nyp - ny2 + 1 :, :nxh])
    return f
