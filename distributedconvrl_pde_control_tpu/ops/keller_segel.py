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
