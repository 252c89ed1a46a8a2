"""Keller–Segel chemotaxis: two coupled fields (u = cell density, v = chemo-
attractant) on a 1D grid, finite-difference RHS + RK4 time stepping.

Re-derivation of `scripts/Keller-Segel/setup/KellerSegelSetup.jl:213-239`:

    v_t = v_xx - v + u + forcing
    u_t = u_xx + u - 5.6 * u_x * v_x - 5.6 * u * v_xx - u^2

with central-difference stencils on a periodic roll that is *clamped* at the
two ends (the reference overwrites the wrapped ghost values with the boundary
values, KellerSegelSetup.jl:221-224), i.e. effectively one-sided differences
at the boundary.

The reference steps this with an adaptive RK4 at tol 1e-8; on TPU we use
fixed-step RK4 with `oversampling` substeps (static shapes, no host-side
adaptivity) — at the reference's dt=0.006 and oversampling=50 the substep is
1.2e-4, well inside the stability/accuracy region of this stiff-ish system.
An adaptive variant is available via ops.integrators.rk4_adaptive.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


def _clamped_shifts(w: jnp.ndarray):
    """(w[i-1], w[i+1]) with boundary clamping per KellerSegelSetup.jl:221-224."""
    wm = jnp.roll(w, 1).at[0].set(w[0])
    wp = jnp.roll(w, -1).at[-1].set(w[-1])
    return wm, wp


@dataclasses.dataclass(frozen=True)
class KellerSegelSolver:
    """FD Keller–Segel solver for one (nx, Lx) config."""

    nx: int
    lx: float
    chi: float = 5.6  # chemotactic sensitivity (the literal 5.6 of :228-229)

    @property
    def dx(self) -> float:
        return self.lx / self.nx

    def rhs(self, y: jnp.ndarray, forcing: jnp.ndarray) -> jnp.ndarray:
        """dy/dt for y of shape (2, nx): rows (u, v). KellerSegelSetup.jl:213-232."""
        u, v = y[0], y[1]
        dx = self.dx
        um, up = _clamped_shifts(u)
        vm, vp = _clamped_shifts(v)
        du1 = (up - um) / (2.0 * dx)
        du2 = (um - 2.0 * u + up) / (dx * dx)
        dv1 = (vp - vm) / (2.0 * dx)
        dv2 = (vm - 2.0 * v + vp) / (dx * dx)
        dv = dv2 - v + u + forcing
        du = du2 + u - self.chi * du1 * dv1 - self.chi * u * dv2 - u * u
        return jnp.stack([du, dv])

    @partial(jax.jit, static_argnums=(0, 4))
    def step(self, y, forcing, dt, oversampling: int):
        """One env step = `oversampling` classic-RK4 substeps."""
        dt_os = dt / oversampling

        def sub(y, _):
            k1 = self.rhs(y, forcing)
            k2 = self.rhs(y + 0.5 * dt_os * k1, forcing)
            k3 = self.rhs(y + 0.5 * dt_os * k2, forcing)
            k4 = self.rhs(y + dt_os * k3, forcing)
            return y + dt_os / 6.0 * (k1 + 2.0 * (k2 + k3) + k4), None

        y, _ = jax.lax.scan(sub, y, None, length=oversampling)
        return y


@dataclasses.dataclass(frozen=True)
class KellerSegelSpectralLegacy:
    """Legacy spectral CNAB2 stepper kept for cross-checking, mirroring the
    reference's `do_step_wrong` (KellerSegelSetup.jl:143-211) which it
    retains alongside the FD path as a comparison artifact (SURVEY.md §4).

    Semi-implicit CNAB2 on both fields with linear operators
    Lu = 1 - k^2 (for u_t = u_xx + u + ...) and Lv = ... the reference uses
    Lv = 1 + k^2 — reproduced verbatim, including the boundary zeroing of
    derivative endpoints. Marked "wrong" by the reference authors because
    the spectral treatment of the clamped boundary is inconsistent; use
    `KellerSegelSolver` for physics.
    """

    nx: int
    lx: float
    chi: float = 5.6
    fft_mode: str = "auto"

    def step(self, y, forcing, dt, oversampling: int):
        import numpy as _np
        from distributedconvrl_pde_control_tpu.ops import fourier

        mode = self.fft_mode
        nx, lx = self.nx, self.lx
        k = _np.concatenate([_np.arange(0, nx // 2), [0], _np.arange(-nx // 2 + 1, 0)])
        alpha = (2 * _np.pi * k / lx).astype(_np.float32)
        alpha_r = _np.abs(alpha[: nx // 2 + 1]).astype(_np.float32)
        alpha_r[-1] = 0.0
        lu = (1.0 - alpha_r**2)
        lv = (1.0 + alpha_r**2)
        dt_os = dt / oversampling
        dt2, dt32 = dt_os / 2, 3 * dt_os / 2
        au_inv = jnp.asarray(1.0 / (1.0 - dt2 * lu), jnp.float32)
        av_inv = jnp.asarray(1.0 / (1.0 - dt2 * lv), jnp.float32)
        bu = jnp.asarray(1.0 + dt2 * lu, jnp.float32)
        bv = jnp.asarray(1.0 + dt2 * lv, jnp.float32)
        ka = jnp.asarray(alpha_r, jnp.float32)

        def d1_ri(zr, zi):  # i*alpha multiply
            return -ka * zi, ka * zr

        def d2_ri(zr, zi):  # -alpha^2 multiply
            return -(ka**2) * zr, -(ka**2) * zi

        def nonlin_u(ur, ui, vr, vi):
            u_real = fourier.irfft_ri(ur, ui, nx, mode=mode)
            d1ur, d1ui = d1_ri(ur, ui)
            d1vr, d1vi = d1_ri(vr, vi)
            d2vr, d2vi = d2_ri(vr, vi)
            u1 = fourier.irfft_ri(d1ur, d1ui, nx, mode=mode).at[0].set(0.0)
            v1 = fourier.irfft_ri(d1vr, d1vi, nx, mode=mode).at[-1].set(0.0)
            v2 = fourier.irfft_ri(d2vr, d2vi, nx, mode=mode)
            nn = self.chi * u1 * v1 - self.chi * u_real * v2 - u_real * u_real
            return fourier.rfft_ri(nn, mode=mode)

        u0, v0 = y[0], y[1]
        ur, ui = fourier.rfft_ri(u0, mode=mode)
        vr, vi = fourier.rfft_ri(v0, mode=mode)
        nur, nui = nonlin_u(ur, ui, vr, vi)
        nvr, nvi = ur, ui  # Nn_v = u (KellerSegelSetup.jl:175)
        fr, fi = fourier.rfft_ri(forcing, mode=mode)

        def sub(c, _):
            ur, ui, vr, vi, nur, nui, nvr, nvi = c
            n1ur, n1ui, n1vr, n1vi = nur, nui, nvr, nvi
            nur, nui = nonlin_u(ur, ui, vr, vi)
            nvr, nvi = ur, ui
            ur = au_inv * (bu * ur + dt32 * nur - dt2 * n1ur)
            ui = au_inv * (bu * ui + dt32 * nui - dt2 * n1ui)
            vr = av_inv * (bv * vr + dt32 * nvr - dt2 * n1vr + dt_os * fr)
            vi = av_inv * (bv * vi + dt32 * nvi - dt2 * n1vi + dt_os * fi)
            return (ur, ui, vr, vi, nur, nui, nvr, nvi), None

        (ur, ui, vr, vi, *_), _ = jax.lax.scan(
            sub, (ur, ui, vr, vi, nur, nui, nvr, nvi), None, length=oversampling
        )
        return jnp.stack([
            fourier.irfft_ri(ur, ui, nx, mode=mode),
            fourier.irfft_ri(vr, vi, nx, mode=mode),
        ])
