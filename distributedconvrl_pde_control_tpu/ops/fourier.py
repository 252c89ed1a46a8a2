"""Backend-adaptive Fourier transforms: XLA FFT or MXU matmul-DFT.

The spectral solvers are FFT-bound. On backends with a native FFT lowering
(CPU/GPU, standard TPU runtimes) we use `jnp.fft.*`. On TPU runtimes without
an FFT kernel (e.g. the axon PJRT backend in this image) — and as an
MXU-friendly option in general — every transform is expressed as dense
DFT-matrix contractions in float32 at HIGHEST precision:

    rfft:   Re = y @ C,  Im = -y @ S           (two real matmuls)
    fft2:   left/right complex-matrix products, 4 real matmuls per axis

For this framework's grid sizes (192..600 points in 1D, 128^2..256^2 in 2D)
the O(n^2) systolic-array DFT is bandwidth- and latency-competitive with an
O(n log n) FFT: the DFT matrices live in VMEM across the fused solver scan
and the contraction runs at MXU rates, while batched envs amortize the
matrix loads. This is the "keep the FLOPs on the MXU" rule of the TPU
programming model applied to spectral methods.

DFT matrices are cached per length and embedded as jit constants.
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

_FORCE = os.environ.get("DCRL_FFT_MODE", "auto")  # auto | matmul | native


def use_matmul_dft(mode: str = "auto") -> bool:
    """Resolve the transform implementation at trace time.

    `mode` overrides per call site ("matmul" | "matmul_fast" | "native");
    "auto" defers to the DCRL_FFT_MODE env var, then to the backend (matmul
    on TPU runtimes). "matmul_fast" runs the DFT contractions at DEFAULT
    precision (bf16 passes on the MXU) instead of HIGHEST — only appropriate
    where the scheme's own accuracy floor is loose (the reference's fluid
    path integrates at tol 1e0, FluidSetup.jl:179).
    """
    if mode != "auto":
        return mode in ("matmul", "matmul_fast", "matmul_hi")
    if _FORCE == "matmul":
        return True
    if _FORCE == "native":
        return False
    return jax.default_backend() in ("tpu", "axon")


def _prec(mode: str):
    if mode == "matmul_fast":
        return jax.lax.Precision.DEFAULT  # 1-pass bf16
    if mode == "matmul_hi":
        return jax.lax.Precision.HIGH  # 3-pass bf16 (~f32-grade, ~2x cheaper)
    return _P


_P = jax.lax.Precision.HIGHEST


@lru_cache(maxsize=None)
def _dft_mats_np(n: int):
    """cos/sin DFT matrices: C[j,k] = cos(2*pi*j*k/n), S[j,k] = sin(...).

    Cached as NumPy (device constants are materialized per trace — caching
    jnp arrays would leak tracers across jit scopes)."""
    jk = np.outer(np.arange(n), np.arange(n)) * (2.0 * np.pi / n)
    return np.cos(jk).astype(np.float32), np.sin(jk).astype(np.float32)


def _dft_mats(n: int):
    c, s = _dft_mats_np(n)
    return jnp.asarray(c), jnp.asarray(s)


@lru_cache(maxsize=None)
def _rdft_mats_np(n: int):
    """Real-input forward matrices to the half spectrum (n//2+1 bins)."""
    nf = n // 2 + 1
    jk = np.outer(np.arange(n), np.arange(nf)) * (2.0 * np.pi / n)
    return np.cos(jk).astype(np.float32), np.sin(jk).astype(np.float32)


def _rdft_mats(n: int):
    c, s = _rdft_mats_np(n)
    return jnp.asarray(c), jnp.asarray(s)


@lru_cache(maxsize=None)
def _irdft_mats_np(n: int):
    """Half-spectrum -> real signal synthesis matrices with Hermitian
    doubling weights (w=1 for DC/Nyquist, 2 otherwise, all /n)."""
    nf = n // 2 + 1
    kj = np.outer(np.arange(nf), np.arange(n)) * (2.0 * np.pi / n)
    w = np.full((nf, 1), 2.0 / n)
    w[0] = 1.0 / n
    if n % 2 == 0:
        w[-1] = 1.0 / n
    return (np.cos(kj) * w).astype(np.float32), (np.sin(kj) * w).astype(np.float32)


def _irdft_mats(n: int):
    c, s = _irdft_mats_np(n)
    return jnp.asarray(c), jnp.asarray(s)


# ------------------------------------------------------------------ 1D real
def rfft(y: jnp.ndarray, axis: int = -1, mode: str = "auto") -> jnp.ndarray:
    if not use_matmul_dft(mode):
        return jnp.fft.rfft(y, axis=axis)
    y = jnp.moveaxis(y, axis, -1)
    n = y.shape[-1]
    c, s = _rdft_mats(n)
    re = jnp.matmul(y, c, precision=_prec(mode))
    im = -jnp.matmul(y, s, precision=_prec(mode))
    return jnp.moveaxis(jax.lax.complex(re, im), -1, axis)


def irfft(h: jnp.ndarray, n: int, axis: int = -1, mode: str = "auto") -> jnp.ndarray:
    if not use_matmul_dft(mode):
        return jnp.fft.irfft(h, n=n, axis=axis)
    h = jnp.moveaxis(h, axis, -1)
    ci, si = _irdft_mats(n)
    y = jnp.matmul(h.real, ci, precision=_prec(mode)) - jnp.matmul(h.imag, si, precision=_prec(mode))
    return jnp.moveaxis(y, -1, axis)


# --------------------------------------------------------------- 1D complex
def _cmatmul_right(xr, xi, c, s, sign: float, precision=None):
    """(xr + i xi) @ (C + i*sign*S) split into real matmuls."""
    precision = precision or _P
    zr = jnp.matmul(xr, c, precision=precision) - sign * jnp.matmul(xi, s, precision=precision)
    zi = jnp.matmul(xi, c, precision=precision) + sign * jnp.matmul(xr, s, precision=precision)
    return zr, zi


def fft(x: jnp.ndarray, axis: int = -1, mode: str = "auto") -> jnp.ndarray:
    if not use_matmul_dft(mode):
        return jnp.fft.fft(x, axis=axis)
    x = jnp.moveaxis(x, axis, -1)
    c, s = _dft_mats(x.shape[-1])
    xr, xi = jnp.real(x).astype(jnp.float32), jnp.imag(x).astype(jnp.float32)
    zr, zi = _cmatmul_right(xr, xi, c, s, sign=-1.0, precision=_prec(mode))  # F = C - iS
    return jnp.moveaxis(jax.lax.complex(zr, zi), -1, axis)


def ifft(x: jnp.ndarray, axis: int = -1, mode: str = "auto") -> jnp.ndarray:
    if not use_matmul_dft(mode):
        return jnp.fft.ifft(x, axis=axis)
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    c, s = _dft_mats(n)
    xr, xi = jnp.real(x).astype(jnp.float32), jnp.imag(x).astype(jnp.float32)
    zr, zi = _cmatmul_right(xr, xi, c, s, sign=1.0, precision=_prec(mode))  # F^-1 = (C + iS)/n
    return jnp.moveaxis(jax.lax.complex(zr / n, zi / n), -1, axis)


# ----------------------------------------------------------------------- 2D
def fft2(x: jnp.ndarray, mode: str = "auto") -> jnp.ndarray:
    if not use_matmul_dft(mode):
        return jnp.fft.fft2(x)
    m = mode if mode in ("matmul_fast", "matmul_hi") else "matmul"
    return fft(fft(x, axis=-1, mode=m), axis=-2, mode=m)


def ifft2(x: jnp.ndarray, mode: str = "auto") -> jnp.ndarray:
    if not use_matmul_dft(mode):
        return jnp.fft.ifft2(x)
    m = mode if mode in ("matmul_fast", "matmul_hi") else "matmul"
    return ifft(ifft(x, axis=-1, mode=m), axis=-2, mode=m)


# ----------------------------------------------------- real/imag split API
# Complex dtypes are emulated on TPU and some runtimes (axon) fail to
# compile or transfer them at all; the solvers' hot paths therefore carry
# spectra as (re, im) float32 pairs. In native mode these wrappers still
# call the complex FFT internally (CPU/GPU), so callers have one code path.

def rfft_ri(y: jnp.ndarray, mode: str = "auto"):
    """Real signal -> (re, im) half-spectrum along axis -1."""
    if not use_matmul_dft(mode):
        h = jnp.fft.rfft(y, axis=-1)
        return jnp.real(h), jnp.imag(h)
    c, s = _rdft_mats(y.shape[-1])
    return jnp.matmul(y, c, precision=_prec(mode)), -jnp.matmul(y, s, precision=_prec(mode))


def irfft_ri(re: jnp.ndarray, im: jnp.ndarray, n: int, mode: str = "auto") -> jnp.ndarray:
    """(re, im) half-spectrum -> real signal of length n along axis -1."""
    if not use_matmul_dft(mode):
        return jnp.fft.irfft(jax.lax.complex(re, im), n=n, axis=-1)
    ci, si = _irdft_mats(n)
    return jnp.matmul(re, ci, precision=_prec(mode)) - jnp.matmul(im, si, precision=_prec(mode))


def _fft_ri_axis(xr, xi, axis: int, sign: float, mode: str):
    """(xr + i xi) transformed along `axis`; sign=-1 forward, +1 inverse
    (inverse includes the 1/n scale)."""
    if not use_matmul_dft(mode):
        z = jax.lax.complex(xr, xi)
        z = jnp.fft.fft(z, axis=axis) if sign < 0 else jnp.fft.ifft(z, axis=axis)
        return jnp.real(z), jnp.imag(z)
    xr = jnp.moveaxis(xr, axis, -1)
    xi = jnp.moveaxis(xi, axis, -1)
    n = xr.shape[-1]
    c, s = _dft_mats(n)
    zr, zi = _cmatmul_right(xr, xi, c, s, sign=sign, precision=_prec(mode))
    if sign > 0:
        zr, zi = zr / n, zi / n
    return jnp.moveaxis(zr, -1, axis), jnp.moveaxis(zi, -1, axis)


def fft2_ri(xr: jnp.ndarray, xi=None, mode: str = "auto"):
    """2D forward transform of xr + i xi (xi None = real input)."""
    if xi is None:
        xi = jnp.zeros_like(xr)
    xr, xi = _fft_ri_axis(xr, xi, -1, -1.0, mode)
    return _fft_ri_axis(xr, xi, -2, -1.0, mode)


def ifft2_ri(xr: jnp.ndarray, xi: jnp.ndarray, mode: str = "auto"):
    xr, xi = _fft_ri_axis(xr, xi, -1, 1.0, mode)
    return _fft_ri_axis(xr, xi, -2, 1.0, mode)


def ifft2_ri_real(xr: jnp.ndarray, xi: jnp.ndarray, mode: str = "auto") -> jnp.ndarray:
    """Real part of the 2D inverse transform (for Hermitian spectra)."""
    re, _ = ifft2_ri(xr, xi, mode)
    return re


# ------------------------------------------------- 2D real (half-spectrum)
# Real 2D fields have Hermitian spectra; keeping only the non-negative-kx
# half (nx//2+1 columns) halves every downstream elementwise op and the
# y-axis transforms. Shapes: real (..., ny, nx) <-> half spectrum
# (..., ny, nx//2+1) as (re, im) pairs.

def rfft2_ri(x: jnp.ndarray, mode: str = "auto"):
    """Real field -> (re, im) half-spectrum: rfft along -1, full fft along -2."""
    if not use_matmul_dft(mode):
        h = jnp.fft.rfft2(x)
        return jnp.real(h), jnp.imag(h)
    c, s = _rdft_mats(x.shape[-1])
    re = jnp.matmul(x, c, precision=_prec(mode))
    im = -jnp.matmul(x, s, precision=_prec(mode))
    return _fft_ri_axis(re, im, -2, -1.0, mode)


def irfft2_ri_real(re: jnp.ndarray, im: jnp.ndarray, nx: int, mode: str = "auto") -> jnp.ndarray:
    """(re, im) half-spectrum -> real field (ifft along -2, irfft along -1)."""
    if not use_matmul_dft(mode):
        return jnp.fft.irfft2(jax.lax.complex(re, im), s=(re.shape[-2], nx))
    re, im = _fft_ri_axis(re, im, -2, 1.0, mode)
    ci, si = _irdft_mats(nx)
    return jnp.matmul(re, ci, precision=_prec(mode)) - jnp.matmul(im, si, precision=_prec(mode))
