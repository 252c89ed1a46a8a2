"""2D incompressible Navier–Stokes vorticity-transport solver (pseudo-spectral).

Re-derivation of the reference's `src/fluid_rk4.jl`: the state is the spectral
vorticity omega_hat on a periodic [0,Lx]x[0,Ly] box; RK4 in time
(fluid_rk4.jl:122-132); the advection term is computed by solving for the
streamfunction and forming -u*dw/dx - v*dw/dy by collocation, optionally with
3/2-rule zero-padding de-aliasing (fluid_rk4.jl:145-190).

TPU-native notes: all FFTs are XLA batched 2D FFTs; the RK4 substep loop is a
`lax.scan`; the de-aliased path does 4 padded inverse FFTs + 1 padded forward
FFT per RHS evaluation, all at static (3/2 nx) shapes so XLA tiles them once.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from distributedconvrl_pde_control_tpu.ops import fourier
from distributedconvrl_pde_control_tpu.ops.spectral import (
    chop_32,
    chop_32_half,
    fft_wavenumbers,
    pad_32,
    pad_32_half,
)


@dataclasses.dataclass(frozen=True)
class NSSolver:
    """Precomputed wavenumber arrays for one (nx, ny, Lx, Ly, nu) config.

    Mirrors the module-level grid setup at FluidSetup.jl:106-124.
    `dealias=True` is the reference's `ifpad=1` (FluidSetup.jl:101).
    """

    nx: int
    ny: int
    lx: float = 1.0
    ly: float = 1.0
    nu: float = 5e-5
    dealias: bool = True
    fft_mode: str = "auto"  # part of the jit key
    # Transform tier for the ADVECTION evaluations inside the RK stages
    # (the 5-transform collocation in `_advection_ri`; the boundary
    # transforms — initial/forcing forward, final inverse — keep
    # `fft_mode`). Every stage result is multiplied by O(dt_os) RK weights
    # before it reaches the state, so a cheaper tier's error enters scaled
    # by dt_os — the 2D analog of the KS ETDRK4 `nl_fft_mode`
    # (ops/ks.py; accuracy ladder in PERFORMANCE.md). None = fft_mode.
    nl_fft_mode: str | None = None
    # Hermitian half-spectrum (kx >= 0) halves flops in exact arithmetic but
    # LOSES on TPU at these sizes: nx//2+1 is odd, so every (ny, nxh) tensor
    # pads to the 128-lane tile anyway and the savings evaporate while the
    # pad/chop scatters add work (measured 23 vs 27 steps/s at 128^2).
    # Full-spectrum split-ri stays the TPU default.
    half_spectrum: bool = False

    kx_row: jnp.ndarray = dataclasses.field(init=False, repr=False, compare=False)
    ky_col: jnp.ndarray = dataclasses.field(init=False, repr=False, compare=False)
    k2: jnp.ndarray = dataclasses.field(init=False, repr=False, compare=False)
    inv_k2: jnp.ndarray = dataclasses.field(init=False, repr=False, compare=False)

    def __post_init__(self):
        kx = fft_wavenumbers(self.nx, self.lx)
        ky = fft_wavenumbers(self.ny, self.ly)
        # kx varies along columns (axis 1), ky along rows (axis 0), matching
        # kx_repeat / ky_repeat at FluidSetup.jl:117-118.
        kx_row = np.broadcast_to(kx[None, :], (self.ny, self.nx))
        ky_col = np.broadcast_to(ky[:, None], (self.ny, self.nx))
        k2 = ky_col**2 + kx_row**2  # FluidSetup.jl:116
        inv_k2 = np.empty_like(k2)
        inv_k2[:] = 1.0 / np.where(k2 == 0.0, 1.0, k2)
        inv_k2[0, 0] = 0.0  # psihat[1,1] = 0 (fluid_rk4.jl:153)
        object.__setattr__(self, "kx_row", jnp.asarray(kx_row, dtype=jnp.float32))
        object.__setattr__(self, "ky_col", jnp.asarray(ky_col, dtype=jnp.float32))
        object.__setattr__(self, "k2", jnp.asarray(k2, dtype=jnp.float32))
        object.__setattr__(self, "inv_k2", jnp.asarray(inv_k2, dtype=jnp.float32))

    def _f2(self, x):
        return fourier.fft2(x, mode=self.fft_mode)

    def _if2(self, x):
        return fourier.ifft2(x, mode=self.fft_mode)

    # ---------------------------------------------------------------- rhs
    def advection(self, omghat: jnp.ndarray) -> jnp.ndarray:
        """Nonlinear advection term in wavespace (fluid_rk4.jl:145-190)."""
        psihat = omghat * self.inv_k2
        domgdx = 1j * omghat * self.kx_row
        domgdy = 1j * omghat * self.ky_col
        vhat = -1j * psihat * self.kx_row
        uhat = 1j * psihat * self.ky_col

        if self.dealias:
            nxp, nyp = 3 * self.nx // 2, 3 * self.ny // 2
            up = self._if2(pad_32(uhat, nyp, nxp)).real
            vp = self._if2(pad_32(vhat, nyp, nxp)).real
            dwdxp = self._if2(pad_32(domgdx, nyp, nxp)).real
            dwdyp = self._if2(pad_32(domgdy, nyp, nxp)).real
            temp = self._f2(-up * dwdxp - vp * dwdyp)
            # * 1.5 * 1.5 rescales the padded-grid FFT normalization
            # (fluid_rk4.jl:176)
            return chop_32(temp, self.ny, self.nx) * 2.25
        u = self._if2(uhat).real
        v = self._if2(vhat).real
        dwdx = self._if2(domgdx).real
        dwdy = self._if2(domgdy).real
        return self._f2(-u * dwdx - v * dwdy)

    def rhs(self, omghat: jnp.ndarray, forcing_hat: jnp.ndarray) -> jnp.ndarray:
        """d(omega_hat)/dt = -nu*k^2*omega_hat + advection + forcing
        (fluid_rk4.jl:134-143)."""
        return -self.nu * (self.k2 * omghat) + self.advection(omghat) + forcing_hat

    def rk4_substep(self, omghat, forcing_hat, dt):
        """Classic RK4 (fluid_rk4.jl:122-132)."""
        k1 = self.rhs(omghat, forcing_hat)
        k2 = self.rhs(omghat + 0.5 * dt * k1, forcing_hat)
        k3 = self.rhs(omghat + 0.5 * dt * k2, forcing_hat)
        k4 = self.rhs(omghat + dt * k3, forcing_hat)
        return omghat + dt / 6.0 * (k1 + 2.0 * (k2 + k3) + k4)

    @partial(jax.jit, static_argnums=(0, 4))
    def step(self, omghat, forcing_hat, dt, oversampling: int):
        """One env step = `oversampling` RK4 substeps at dt/oversampling,
        the reference's fixed-step `do_step` (FluidSetup.jl:163-172)."""
        dt_os = dt / oversampling

        def sub(w, _):
            return self.rk4_substep(w, forcing_hat, dt_os), None

        w, _ = jax.lax.scan(sub, omghat, None, length=oversampling)
        return w

    # --------------------------------------------- integrating-factor RK4
    # TPU-first integrator EXTENSION (not in the reference; its do_step is
    # plain RK4 with oversampling = 16*nx*dt substeps, FluidSetup.jl:47,163).
    # Substituting v = exp(nu*k^2*t) * omega_hat integrates the viscous term
    # EXACTLY (the exp factors are cheap elementwise arrays); RK4 acts on
    # the advection nonlinearity alone, so the substep count is set by the
    # advective CFL limit, not the reference's conservative heuristic.
    # Classic IF-RK4 weights (reduces to plain RK4 when nu = 0).
    def ifrk4_substep(self, omghat, forcing_hat, dt):
        e_half = jnp.exp(-self.nu * self.k2 * (dt / 2.0))
        e_full = e_half * e_half

        def n_of(w):
            return self.advection(w) + forcing_hat

        k1 = n_of(omghat)
        a = e_half * (omghat + 0.5 * dt * k1)
        k2 = n_of(a)
        b = e_half * omghat + 0.5 * dt * k2
        k3 = n_of(b)
        c = e_full * omghat + dt * e_half * k3
        k4 = n_of(c)
        return (e_full * omghat
                + dt / 6.0 * (e_full * k1 + 2.0 * e_half * (k2 + k3) + k4))

    @partial(jax.jit, static_argnums=(0, 4))
    def step_if(self, omghat, forcing_hat, dt, oversampling: int):
        """One env step = `oversampling` IF-RK4 substeps (complex path; the
        CPU reference for `step_real_if`)."""
        dt_os = dt / oversampling

        def sub(w, _):
            return self.ifrk4_substep(w, forcing_hat, dt_os), None

        w, _ = jax.lax.scan(sub, omghat, None, length=oversampling)
        return w


    # ----------------------------------------------- real/imag split path
    # Complex dtypes are emulated on TPU (and untransferable on some
    # runtimes); production env configs keep the vorticity as a REAL field
    # and run the spectral substeps on (re, im) float32 pairs over the
    # HALF spectrum (kx >= 0 — Hermitian symmetry of real fields), which
    # halves all elementwise work and the y-axis transforms.
    @property
    def _ri_ops(self):
        if self.half_spectrum:
            nxh = self.nx // 2 + 1
            return (self.kx_row[:, :nxh], self.ky_col[:, :nxh],
                    self.k2[:, :nxh], self.inv_k2[:, :nxh])
        return (self.kx_row, self.ky_col, self.k2, self.inv_k2)

    def _fwd_ri(self, x_real, mode: str | None = None):
        mode = mode or self.fft_mode
        if self.half_spectrum:
            return fourier.rfft2_ri(x_real, mode=mode)
        return fourier.fft2_ri(x_real, None, mode=mode)

    def _inv_ri_real(self, zr, zi, nx, mode: str | None = None):
        mode = mode or self.fft_mode
        if self.half_spectrum:
            return fourier.irfft2_ri_real(zr, zi, nx, mode=mode)
        return fourier.ifft2_ri_real(zr, zi, mode=mode)

    def _pad(self, z, nyp, nxp):
        return pad_32_half(z, nyp, nxp) if self.half_spectrum else pad_32(z, nyp, nxp)

    def _chop(self, z):
        if self.half_spectrum:
            return chop_32_half(z, self.ny, self.nx)
        return chop_32(z, self.ny, self.nx)

    def _advection_ri(self, wr, wi):
        """Split-ri advection; wr/wi: (..., ny, nx) or half-spectrum."""
        kx, ky, _, inv_k2 = self._ri_ops
        pr, pi = inv_k2 * wr, inv_k2 * wi
        # d/dx = i*kx, d/dy = i*ky: i*(a+ib) = (-b, a)
        dxr, dxi = -kx * wi, kx * wr
        dyr, dyi = -ky * wi, ky * wr
        # vhat = -i*kx*psi, uhat = i*ky*psi
        vr, vi = kx * pi, -kx * pr
        ur, ui = -ky * pi, ky * pr

        nl = self.nl_fft_mode or self.fft_mode
        if self.dealias:
            nxp, nyp = 3 * self.nx // 2, 3 * self.ny // 2

            def to_padded_real(ar, ai):
                return self._inv_ri_real(self._pad(ar, nyp, nxp),
                                         self._pad(ai, nyp, nxp), nxp, mode=nl)

            up = to_padded_real(ur, ui)
            vp = to_padded_real(vr, vi)
            dwdxp = to_padded_real(dxr, dxi)
            dwdyp = to_padded_real(dyr, dyi)
            tr, ti = self._fwd_ri(-up * dwdxp - vp * dwdyp, mode=nl)
            return self._chop(tr) * 2.25, self._chop(ti) * 2.25
        u = self._inv_ri_real(ur, ui, self.nx, mode=nl)
        v = self._inv_ri_real(vr, vi, self.nx, mode=nl)
        dwdx = self._inv_ri_real(dxr, dxi, self.nx, mode=nl)
        dwdy = self._inv_ri_real(dyr, dyi, self.nx, mode=nl)
        return self._fwd_ri(-u * dwdx - v * dwdy, mode=nl)

    def _rhs_ri(self, wr, wi, fr, fi):
        k2h = self._ri_ops[2]
        ar, ai = self._advection_ri(wr, wi)
        return -self.nu * k2h * wr + ar + fr, -self.nu * k2h * wi + ai + fi

    @partial(jax.jit, static_argnums=(0, 4))
    def step_real(self, omg: jnp.ndarray, forcing: jnp.ndarray, dt, oversampling: int):
        """One env step on a REAL vorticity field with real forcing.

        Same scheme as `step` (RK4 x oversampling, fluid_rk4.jl:122-132) but
        the spectrum is carried as float32 component pairs; one extra
        transform pair per env step versus keeping spectral state — noise
        against the ~5 transforms per RHS evaluation.
        """
        dt_os = dt / oversampling
        wr, wi = self._fwd_ri(omg.astype(jnp.float32))
        fr, fi = self._fwd_ri(forcing.astype(jnp.float32))

        def sub(c, _):
            wr, wi = c
            k1r, k1i = self._rhs_ri(wr, wi, fr, fi)
            k2r, k2i = self._rhs_ri(wr + 0.5 * dt_os * k1r, wi + 0.5 * dt_os * k1i, fr, fi)
            k3r, k3i = self._rhs_ri(wr + 0.5 * dt_os * k2r, wi + 0.5 * dt_os * k2i, fr, fi)
            k4r, k4i = self._rhs_ri(wr + dt_os * k3r, wi + dt_os * k3i, fr, fi)
            wr = wr + dt_os / 6.0 * (k1r + 2.0 * (k2r + k3r) + k4r)
            wi = wi + dt_os / 6.0 * (k1i + 2.0 * (k2i + k3i) + k4i)
            return (wr, wi), None

        (wr, wi), _ = jax.lax.scan(sub, (wr, wi), None, length=oversampling)
        return self._inv_ri_real(wr, wi, self.nx)

    @partial(jax.jit, static_argnums=(0, 4))
    def step_real_if(self, omg: jnp.ndarray, forcing: jnp.ndarray, dt, oversampling: int):
        """One env step on a REAL vorticity field via IF-RK4 (see
        `ifrk4_substep`) on split (re, im) spectra. The exp factors are real
        diagonal operators, so they scale both components identically.

        Validated-equal-accuracy fast tier: at the tolerance the reference
        itself accepts (its installed stepper is adaptive RK4 at tol 1e0,
        FluidSetup.jl:333,179) a handful of IF-RK4 substeps match the
        40-substep fixed path — see tests/test_ns_solver.py and
        PERFORMANCE.md for the measured error/throughput ladder."""
        k2h = self._ri_ops[2]
        dt_os = dt / oversampling
        e_half = jnp.exp(-self.nu * k2h * (dt_os / 2.0))
        e_full = e_half * e_half
        wr, wi = self._fwd_ri(omg.astype(jnp.float32))
        fr, fi = self._fwd_ri(forcing.astype(jnp.float32))

        def n_of(zr, zi):
            ar, ai = self._advection_ri(zr, zi)
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
        return self._inv_ri_real(wr, wi, self.nx)

    # ------------------------------------------------------------ diagnostics
    def omg2vel(self, omghat):
        """(u, v, omega, psi) in real space from spectral vorticity
        (fluid_rk4.jl:20-52)."""
        psihat = omghat * self.inv_k2
        # NB fluid_rk4.jl:35 divides by k^2 (no zero guard beyond [1,1]); the
        # inv_k2 table encodes the same convention.
        uhat = 1j * self.ky_col * psihat
        vhat = -1j * self.kx_row * psihat
        omg = self._if2(omghat).real
        psi = self._if2(psihat).real
        u = self._if2(uhat).real
        v = self._if2(vhat).real
        return u, v, omg, psi


# --------------------------------------------------------------- initial data
def meshgrid_xy(nx, ny, lx, ly):
    """Collocation grid (xx[r,c] = x[c], yy[r,c] = y[r]), matching
    fluid_rk4.jl:10-15 + FluidSetup.jl:127-133 (endpoint dropped)."""
    x = np.linspace(0.0, lx, nx + 1)[:nx]
    y = np.linspace(0.0, ly, ny + 1)[:ny]
    xx = np.broadcast_to(x[None, :], (ny, nx))
    yy = np.broadcast_to(y[:, None], (ny, nx))
    return xx, yy


def taylor_vortex(xx, yy, x0, y0, a0, u_max, lx, ly):
    """Taylor-vortex vorticity bump with 3x3 periodic images, in real space
    (fluid_rk4.jl:54-69 computes the same then ffts it)."""
    omg = np.zeros_like(xx)
    for i in (-1, 0, 1):
        for j in (-1, 0, 1):
            r2 = (xx - x0 - i * lx) ** 2 + (yy - y0 - j * ly) ** 2
            omg = omg + u_max / a0 * (2.0 - r2 / a0**2) * np.exp(0.5 * (1.0 - r2 / a0**2))
    return omg


def taylorvtx_hat(xx, yy, x0, y0, a0, u_max, lx, ly):
    """Spectral Taylor vortex, matching fluid_rk4.jl:54-69."""
    return np.fft.fft2(taylor_vortex(xx, yy, x0, y0, a0, u_max, lx, ly))


def initial_condition(caseno: int, nx, ny, lx, ly, rng: np.random.Generator):
    """Initial spectral vorticity fields, cases 1-4 of fluid_rk4.jl:72-120.

    1: one Taylor vortex; 2: two co-rotating; 3: 30 random vortices;
    4: 50 random vortices with randomized radii.
    """
    xx, yy = meshgrid_xy(nx, ny, lx, ly)
    if caseno == 1:
        return taylorvtx_hat(xx, yy, lx / 2, ly / 2, lx / 8, 1.0, lx, ly)
    if caseno == 2:
        w = taylorvtx_hat(xx, yy, lx / 2, 0.4 * ly, lx / 10.0, 1.0, lx, ly)
        return w + taylorvtx_hat(xx, yy, lx / 2, 0.6 * ly, lx / 10.0, 1.0, lx, ly)
    if caseno in (3, 4):
        nv = 30 if caseno == 3 else 50
        omg = np.zeros((ny, nx))
        for _ in range(nv):
            x0 = rng.uniform(0, lx)
            y0 = rng.uniform(0, ly)
            a0 = lx / 20.0 if caseno == 3 else lx / 20.0 * (0.5 + rng.uniform())
            umax = rng.uniform(-1.0, 1.0)
            omg = omg + taylor_vortex(xx, yy, x0, y0, a0, umax, lx, ly)
        return np.fft.fft2(omg)
    raise ValueError(f"unknown IC case {caseno}")
