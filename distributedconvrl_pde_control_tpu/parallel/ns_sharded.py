"""Spatially sharded 2D Navier–Stokes vorticity solver.

The single-chip solver (`ops.navier_stokes`) becomes, under a mesh axis `sp`:
  * wave space in x-pencil layout (ny, nx/S) per device;
  * real space in y-pencil layout (ny/S, nx);
  * FFTs via the transpose method (`parallel.dfft`), collectives over ICI;
  * de-aliasing via the 2/3-rule spectral mask instead of the reference's
    3/2-rule padding (fluid_rk4.jl:145-190) — the padded re-gridding would
    change the shard layout mid-substep, while the truncation mask is
    elementwise and therefore shards for free. Both remove the same aliased
    triad interactions.

All methods operate on LOCAL blocks inside a `shard_map` over `sp`; the
operator slices (`ShardedOps`) are passed in pre-sharded with
PartitionSpec(None, 'sp').
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
from flax import struct

from distributedconvrl_pde_control_tpu.ops.spectral import fft_wavenumbers
from distributedconvrl_pde_control_tpu.parallel.dfft import dfft2, difft2


@struct.dataclass
class ShardedOps:
    """Spectral operator arrays in full (ny, nx) shape; shard with
    PartitionSpec(None, 'sp') so each device holds its x-pencil columns."""

    kx: jnp.ndarray
    ky: jnp.ndarray
    k2: jnp.ndarray
    inv_k2: jnp.ndarray
    mask23: jnp.ndarray  # 2/3-rule de-alias mask


def make_sharded_ops(nx: int, ny: int, lx: float = 1.0, ly: float = 1.0) -> ShardedOps:
    kx = fft_wavenumbers(nx, lx)
    ky = fft_wavenumbers(ny, ly)
    kx_row = np.broadcast_to(kx[None, :], (ny, nx)).astype(np.float32)
    ky_col = np.broadcast_to(ky[:, None], (ny, nx)).astype(np.float32)
    k2 = ky_col**2 + kx_row**2
    inv_k2 = 1.0 / np.where(k2 == 0.0, 1.0, k2)
    inv_k2[0, 0] = 0.0
    # 2/3 rule: zero wavenumbers with |k_int| > n/3
    ix = np.abs(np.fft.fftfreq(nx) * nx)
    iy = np.abs(np.fft.fftfreq(ny) * ny)
    mask = ((iy[:, None] <= ny // 3) & (ix[None, :] <= nx // 3)).astype(np.float32)
    return ShardedOps(
        kx=jnp.asarray(kx_row), ky=jnp.asarray(ky_col), k2=jnp.asarray(k2),
        inv_k2=jnp.asarray(inv_k2), mask23=jnp.asarray(mask),
    )


@dataclasses.dataclass(frozen=True)
class NSShardedSolver:
    """RK4 vorticity stepper on local x-pencil blocks (semantics of
    ops.navier_stokes.NSSolver, distributed per the module docstring)."""

    nu: float
    sp_axis: str

    def advection(self, w, ops: ShardedOps):
        psih = w * ops.inv_k2
        domgdx = 1j * w * ops.kx
        domgdy = 1j * w * ops.ky
        vh = -1j * psih * ops.kx
        uh = 1j * psih * ops.ky
        u = difft2(uh, self.sp_axis).real
        v = difft2(vh, self.sp_axis).real
        dwdx = difft2(domgdx, self.sp_axis).real
        dwdy = difft2(domgdy, self.sp_axis).real
        nonlin = dfft2(-u * dwdx - v * dwdy, self.sp_axis)
        return nonlin * ops.mask23

    def rhs(self, w, forcing_hat, ops: ShardedOps):
        return -self.nu * (ops.k2 * w) + self.advection(w, ops) + forcing_hat

    def rk4_substep(self, w, forcing_hat, ops, dt):
        k1 = self.rhs(w, forcing_hat, ops)
        k2 = self.rhs(w + 0.5 * dt * k1, forcing_hat, ops)
        k3 = self.rhs(w + 0.5 * dt * k2, forcing_hat, ops)
        k4 = self.rhs(w + dt * k3, forcing_hat, ops)
        return w + dt / 6.0 * (k1 + 2.0 * (k2 + k3) + k4)

    def step(self, w, forcing_hat, ops, dt, oversampling: int):
        import jax

        dt_os = dt / oversampling

        def sub(w, _):
            return self.rk4_substep(w, forcing_hat, ops, dt_os), None

        w, _ = jax.lax.scan(sub, w, None, length=oversampling)
        return w


@dataclasses.dataclass(frozen=True)
class NSShardedSolverRI:
    """Complex-free sharded solver: same scheme as NSShardedSolver but on
    (re, im) float32 component pairs with split-component transpose FFTs —
    the variant that runs on TPU runtimes without complex support
    (see ops.fourier docstring)."""

    nu: float
    sp_axis: str
    fft_mode: str = "auto"
    # Advection-only transform tier (error enters scaled by dt_os), the
    # sharded twin of NSSolver.nl_fft_mode (ops/navier_stokes.py).
    nl_fft_mode: str | None = None

    def _advection_ri(self, wr, wi, ops: ShardedOps):
        from distributedconvrl_pde_control_tpu.parallel.dfft import (
            dfft2_ri,
            difft2_ri_real,
        )

        nl = self.nl_fft_mode or self.fft_mode
        pr, pi = ops.inv_k2 * wr, ops.inv_k2 * wi
        dxr, dxi = -ops.kx * wi, ops.kx * wr
        dyr, dyi = -ops.ky * wi, ops.ky * wr
        vr, vi = ops.kx * pi, -ops.kx * pr
        ur, ui = -ops.ky * pi, ops.ky * pr
        u = difft2_ri_real(ur, ui, self.sp_axis, nl)
        v = difft2_ri_real(vr, vi, self.sp_axis, nl)
        dwdx = difft2_ri_real(dxr, dxi, self.sp_axis, nl)
        dwdy = difft2_ri_real(dyr, dyi, self.sp_axis, nl)
        nr, ni = dfft2_ri(-u * dwdx - v * dwdy, None, self.sp_axis, nl)
        return nr * ops.mask23, ni * ops.mask23

    def _rhs_ri(self, wr, wi, fr, fi, ops):
        ar, ai = self._advection_ri(wr, wi, ops)
        return -self.nu * ops.k2 * wr + ar + fr, -self.nu * ops.k2 * wi + ai + fi

    def step_real(self, omg_local, forcing_local, ops: ShardedOps, dt, oversampling: int):
        """REAL y-pencil field block -> advanced real block.

        omg_local/forcing_local: (..., ny/S, nx)."""
        import jax

        from distributedconvrl_pde_control_tpu.parallel.dfft import (
            dfft2_ri,
            difft2_ri_real,
        )

        dt_os = dt / oversampling
        wr, wi = dfft2_ri(omg_local, None, self.sp_axis, self.fft_mode)
        fr, fi = dfft2_ri(forcing_local, None, self.sp_axis, self.fft_mode)

        def sub(c, _):
            wr, wi = c
            k1r, k1i = self._rhs_ri(wr, wi, fr, fi, ops)
            k2r, k2i = self._rhs_ri(wr + 0.5 * dt_os * k1r, wi + 0.5 * dt_os * k1i, fr, fi, ops)
            k3r, k3i = self._rhs_ri(wr + 0.5 * dt_os * k2r, wi + 0.5 * dt_os * k2i, fr, fi, ops)
            k4r, k4i = self._rhs_ri(wr + dt_os * k3r, wi + dt_os * k3i, fr, fi, ops)
            wr = wr + dt_os / 6.0 * (k1r + 2.0 * (k2r + k3r) + k4r)
            wi = wi + dt_os / 6.0 * (k1i + 2.0 * (k2i + k3i) + k4i)
            return (wr, wi), None

        (wr, wi), _ = jax.lax.scan(sub, (wr, wi), None, length=oversampling)
        return difft2_ri_real(wr, wi, self.sp_axis, self.fft_mode)

    def step_real_if(self, omg_local, forcing_local, ops: ShardedOps, dt,
                     oversampling: int):
        """IF-RK4 fast tier on local shards (the sharded twin of
        `ops.navier_stokes.NSSolver.step_real_if`): the viscous diagonal is
        integrated exactly by elementwise exp factors — which shard over sp
        like every other operator array — so the substep count is set by the
        advective CFL limit alone, not the reference's 16*nx*dt heuristic
        (FluidSetup.jl:47). Accuracy ladder: PERFORMANCE.md."""
        import jax

        from distributedconvrl_pde_control_tpu.parallel.dfft import (
            dfft2_ri,
            difft2_ri_real,
        )

        dt_os = dt / oversampling
        e_half = jnp.exp(-self.nu * ops.k2 * (dt_os / 2.0))
        e_full = e_half * e_half
        wr, wi = dfft2_ri(omg_local, None, self.sp_axis, self.fft_mode)
        fr, fi = dfft2_ri(forcing_local, None, self.sp_axis, self.fft_mode)

        def n_of(zr, zi):
            ar, ai = self._advection_ri(zr, zi, ops)
            return ar + fr, ai + fi

        def sub(c, _):
            wr, wi = c
            k1r, k1i = n_of(wr, wi)
            ar_, ai_ = e_half * (wr + 0.5 * dt_os * k1r), e_half * (wi + 0.5 * dt_os * k1i)
            k2r, k2i = n_of(ar_, ai_)
            br_, bi_ = e_half * wr + 0.5 * dt_os * k2r, e_half * wi + 0.5 * dt_os * k2i
            k3r, k3i = n_of(br_, bi_)
            cr_, ci_ = e_full * wr + dt_os * e_half * k3r, e_full * wi + dt_os * e_half * k3i
            k4r, k4i = n_of(cr_, ci_)
            wr = e_full * wr + dt_os / 6.0 * (e_full * k1r + 2.0 * e_half * (k2r + k3r) + k4r)
            wi = e_full * wi + dt_os / 6.0 * (e_full * k1i + 2.0 * e_half * (k2i + k3i) + k4i)
            return (wr, wi), None

        (wr, wi), _ = jax.lax.scan(sub, (wr, wi), None, length=oversampling)
        return difft2_ri_real(wr, wi, self.sp_axis, self.fft_mode)

    def step_real_adaptive(self, omg_local, forcing_local, ops: ShardedOps, dt,
                           rtol: float = 1.0, atol: float = 1.0,
                           max_steps: int = 256):
        """Sharded do_step2: step-doubling adaptive RK4 (the semantics of
        `ops.integrators.rk4_adaptive` = FluidSetup.jl:181-186) on local
        shards. The acceptance test's error norm is `pmax`'d over sp every
        iteration so the `while_loop` trip count — and therefore the
        collective schedule inside the advection transforms — stays uniform
        across the mesh; (t, h) are then replicated by construction. One
        extra scalar collective per trial step, against ~36 transform
        all_to_alls: noise. Closes the round-2 ROADMAP gap #2 (the sharded
        trainer previously forced fixed-step even for adaptive presets)."""
        import jax

        from distributedconvrl_pde_control_tpu.parallel.dfft import (
            dfft2_ri,
            difft2_ri_real,
        )

        wr, wi = dfft2_ri(omg_local, None, self.sp_axis, self.fft_mode)
        fr, fi = dfft2_ri(forcing_local, None, self.sp_axis, self.fft_mode)
        w = jnp.stack([wr, wi])

        def rhs(z):
            rr, ri_ = self._rhs_ri(z[0], z[1], fr, fi, ops)
            return jnp.stack([rr, ri_])

        def rk4(y, h):
            k1 = rhs(y)
            k2 = rhs(y + 0.5 * h * k1)
            k3 = rhs(y + 0.5 * h * k2)
            k4 = rhs(y + h * k3)
            return y + h / 6.0 * (k1 + 2.0 * (k2 + k3) + k4)

        def cond(state):
            t, _, h, n = state
            return jnp.logical_and(t < dt * (1 - 1e-12), n < max_steps)

        def body(state):
            t, y, h, n = state
            h = jnp.minimum(h, dt - t)
            y_full = rk4(y, h)
            y_half = rk4(y, h / 2.0)
            y_two = rk4(y_half, h / 2.0)
            err_local = jnp.max(jnp.abs(y_two - y_full) / (atol + rtol * jnp.abs(y_two)))
            err = jax.lax.pmax(err_local, self.sp_axis)
            err = jnp.maximum(err, 1e-12)
            accept = err <= 15.0  # RK4 step-doubling factor (2^4 - 1)
            y_new = jnp.where(accept, y_two + (y_two - y_full) / 15.0, y)
            t_new = jnp.where(accept, t + h, t)
            h_new = h * jnp.clip(0.9 * (15.0 / err) ** 0.2, 0.2, 5.0)
            return (t_new, y_new, h_new, n + 1)

        _, w, _, _ = jax.lax.while_loop(
            cond, body,
            (jnp.asarray(0.0, jnp.float32), w, jnp.asarray(dt / 16.0, jnp.float32), 0),
        )
        return difft2_ri_real(w[0], w[1], self.sp_axis, self.fft_mode)
