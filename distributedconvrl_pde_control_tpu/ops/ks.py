"""Kuramoto–Sivashinsky spectral CNAB2 stepper.

Solves u_t = -u*u_x - u_xx - u_xxxx + forcing (+ mu*cos(...) disturbance) on a
periodic domain, semantics matching the reference's `do_step`
(`scripts/KS/setup/KSSetup.jl:130-160`): Crank–Nicolson for the linear term,
2nd-order Adams–Bashforth for the nonlinear term, `oversampling` substeps per
environment step.

TPU-native design: the whole substep loop is a `lax.scan` over precomputed
diagonal spectral operators on the rfft half-spectrum, with the spectrum
carried as a **(re, im) float32 pair** — complex dtypes are emulated on TPU
(and unsupported for transfer on some runtimes), while the split form maps
every operation onto plain VPU/MXU float math:

    G = -0.5i*alpha  =>  G*z = (0.5*alpha*zi, -0.5*alpha*zr)
    A_inv, B real    =>  componentwise scaling

One transform pair per substep (the u^2 collocation); everything else is
fused elementwise work. On runtimes without an FFT kernel the transforms are
MXU matmul-DFTs (ops.fourier).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from distributedconvrl_pde_control_tpu.ops import fourier
from distributedconvrl_pde_control_tpu.ops.spectral import ks_rfft_operators


@dataclasses.dataclass(frozen=True)
class KSSolver:
    """Precomputed CNAB2 operators for one (nx, Lx, dt, oversampling) config.

    Mirrors the reference's module-level operator setup (KSSetup.jl:115-125)
    plus the per-call A_inv/B rebuild at the oversampled dt
    (KSSetup.jl:131-135). `mu` adds the inhomogeneous disturbance term of
    KSSetup.jl:155: `dt_os * fft(mu * cos(2 + pi + x/(Lx/2)))`.
    """

    nx: int
    lx: float
    dt: float
    oversampling: int
    mu: float = 0.0
    fft_mode: str = "auto"  # "auto" | "matmul" | "native" (part of the jit key)

    # derived spectral operators (all REAL arrays; complex arithmetic is
    # expressed on (re, im) components)
    g_alpha: jnp.ndarray = dataclasses.field(init=False, repr=False, compare=False)
    a_inv: jnp.ndarray = dataclasses.field(init=False, repr=False, compare=False)
    b_op: jnp.ndarray = dataclasses.field(init=False, repr=False, compare=False)
    dist_re: jnp.ndarray = dataclasses.field(init=False, repr=False, compare=False)
    dist_im: jnp.ndarray = dataclasses.field(init=False, repr=False, compare=False)

    def __post_init__(self):
        alpha, _, lin_op = ks_rfft_operators(self.nx, self.lx)
        dt_os = self.dt / self.oversampling
        dt2 = dt_os / 2.0
        # G = -0.5*D = -0.5i*alpha (KSSetup.jl:119); stored as the real
        # factor 0.5*alpha with the i folded into the component swap.
        g_alpha = 0.5 * np.asarray(alpha, np.float64)
        lin = np.asarray(lin_op, dtype=np.float64)
        a_inv = 1.0 / (1.0 - dt2 * lin)
        b_op = 1.0 + dt2 * lin
        # disturbance mu*cos(2 + pi + x/(Lx/2)) (KSSetup.jl:155), transformed
        # once; added *outside* the A_inv solve, exactly as the reference.
        dx = self.lx / self.nx
        x = np.arange(1, self.nx + 1) * dx
        dist = self.mu * np.cos(2.0 + np.pi + x / (self.lx / 2.0))
        dist_hat = np.fft.rfft(dist) * dt_os
        object.__setattr__(self, "g_alpha", jnp.asarray(g_alpha, dtype=jnp.float32))
        object.__setattr__(self, "a_inv", jnp.asarray(a_inv, dtype=jnp.float32))
        object.__setattr__(self, "b_op", jnp.asarray(b_op, dtype=jnp.float32))
        object.__setattr__(self, "dist_re", jnp.asarray(dist_hat.real, dtype=jnp.float32))
        object.__setattr__(self, "dist_im", jnp.asarray(dist_hat.imag, dtype=jnp.float32))

    def _apply_g(self, zr, zi):
        """(re, im) of G*z with G = -0.5i*alpha."""
        return self.g_alpha * zi, -self.g_alpha * zr

    @partial(jax.jit, static_argnums=0)
    def step(self, y: jnp.ndarray, forcing: jnp.ndarray) -> jnp.ndarray:
        """Advance the real field y by one env step (= `oversampling` substeps).

        `forcing` is the real-space forcing field p(x) (constant over the env
        step, as in the reference where env.p is fixed between agent actions).
        Semantics of KSSetup.jl:130-160. Supports leading batch dims.
        """
        dt_os = self.dt / self.oversampling
        dt2 = dt_os / 2.0
        dt32 = 3.0 * dt_os / 2.0
        mode = self.fft_mode

        y = y.astype(jnp.float32)
        ur0, ui0 = fourier.rfft_ri(y, mode=mode)
        # initial nonlinear term from the real field (KSSetup.jl:140-141)
        n2r, n2i = fourier.rfft_ri(y * y, mode=mode)
        nr0, ni0 = self._apply_g(n2r, n2i)
        fr, fi = fourier.rfft_ri(forcing.astype(jnp.float32), mode=mode)
        fr, fi = fr * dt_os, fi * dt_os

        def substep(carry, _):
            ur, ui, nr, ni = carry
            n1r, n1i = nr, ni
            u_real = fourier.irfft_ri(ur, ui, self.nx, mode=mode)
            sqr, sqi = fourier.rfft_ri(u_real * u_real, mode=mode)
            nr, ni = self._apply_g(sqr, sqi)
            ur = self.a_inv * (self.b_op * ur + dt32 * nr - dt2 * n1r + fr) + self.dist_re
            ui = self.a_inv * (self.b_op * ui + dt32 * ni - dt2 * n1i + fi) + self.dist_im
            return (ur, ui, nr, ni), None

        (ur, ui, _, _), _ = jax.lax.scan(
            substep, (ur0, ui0, nr0, ni0), None, length=self.oversampling
        )
        return fourier.irfft_ri(ur, ui, self.nx, mode=mode)


@dataclasses.dataclass(frozen=True)
class KSSolverETDRK4:
    """ETDRK4 stepper for the same KS equation — the TPU-first integrator
    EXTENSION (not in the reference; its do_step is CNAB2 with 30 substeps,
    KSSetup.jl:130-160).

    Exponential time differencing treats the stiff linear operator
    exp(h(k^2 - k^4)) EXACTLY, so the step size is limited only by the
    advection nonlinearity: one h=dt step (4 nonlinear evaluations = 8
    transforms) replaces CNAB2's 30 substeps (60 transforms) — 7.5x fewer
    MXU transforms per env step at BETTER accuracy (validated against a
    fine-step oracle in tests/test_ks_solver.py). phi-function weights are
    computed host-side in float64 via the Kassam-Trefethen (2005) contour
    integral, the standard cure for the cancellation in (e^z - 1)/z.

    Drop-in `.step(y, forcing)` interface; fidelity presets keep CNAB2
    (reference parity), throughput mode opts in via
    KSConfig(stepper="etdrk4")."""

    nx: int
    lx: float
    dt: float
    oversampling: int = 1  # substeps per env step (1 suffices for KS22)
    mu: float = 0.0
    fft_mode: str = "auto"
    # Transform tier for the NONLINEAR evaluations only (the 8 transforms
    # per substep inside `nonlin`; the 3 boundary transforms keep
    # `fft_mode`). ETDRK4 multiplies every nonlinear result by the O(h)
    # phi-weights (q_w/f1..f3), so a cheaper tier's error enters the state
    # scaled by h*phi instead of raw — "matmul_fast" (1-pass bf16) here is
    # the measured next lever after the 3-pass matmul_hi roofline
    # (PERFORMANCE.md). None = same as fft_mode.
    nl_fft_mode: str | None = None

    e_full: jnp.ndarray = dataclasses.field(init=False, repr=False, compare=False)
    e_half: jnp.ndarray = dataclasses.field(init=False, repr=False, compare=False)
    q_w: jnp.ndarray = dataclasses.field(init=False, repr=False, compare=False)
    f1_w: jnp.ndarray = dataclasses.field(init=False, repr=False, compare=False)
    f2_w: jnp.ndarray = dataclasses.field(init=False, repr=False, compare=False)
    f3_w: jnp.ndarray = dataclasses.field(init=False, repr=False, compare=False)
    g_alpha: jnp.ndarray = dataclasses.field(init=False, repr=False, compare=False)
    dist_re: jnp.ndarray = dataclasses.field(init=False, repr=False, compare=False)
    dist_im: jnp.ndarray = dataclasses.field(init=False, repr=False, compare=False)

    def __post_init__(self):
        from distributedconvrl_pde_control_tpu.ops.spectral import ks_rfft_operators

        alpha, _, lin = ks_rfft_operators(self.nx, self.lx)
        lin = np.asarray(lin, np.float64)
        h = self.dt / self.oversampling
        e_full = np.exp(h * lin)
        e_half = np.exp(h * lin / 2.0)
        # Kassam-Trefethen contour quadrature for the phi weights
        m = 32
        r = np.exp(1j * np.pi * (np.arange(1, m + 1) - 0.5) / m)
        lr = h * lin[:, None] + r[None, :]
        elr = np.exp(lr)
        q = h * np.real(np.mean((np.exp(lr / 2.0) - 1.0) / lr, axis=1))
        f1 = h * np.real(np.mean(
            (-4.0 - lr + elr * (4.0 - 3.0 * lr + lr**2)) / lr**3, axis=1))
        f2 = h * np.real(np.mean(
            (2.0 + lr + elr * (-2.0 + lr)) / lr**3, axis=1))
        f3 = h * np.real(np.mean(
            (-4.0 - 3.0 * lr - lr**2 + elr * (4.0 - lr)) / lr**3, axis=1))
        g_alpha = 0.5 * np.asarray(alpha, np.float64)
        dx = self.lx / self.nx
        x = np.arange(1, self.nx + 1) * dx
        dist_hat = np.fft.rfft(self.mu * np.cos(2.0 + np.pi + x / (self.lx / 2.0)))
        for name, arr in (("e_full", e_full), ("e_half", e_half), ("q_w", q),
                          ("f1_w", f1), ("f2_w", f2), ("f3_w", f3),
                          ("g_alpha", g_alpha),
                          ("dist_re", dist_hat.real), ("dist_im", dist_hat.imag)):
            object.__setattr__(self, name, jnp.asarray(arr, jnp.float32))

    @partial(jax.jit, static_argnums=0)
    def step(self, y: jnp.ndarray, forcing: jnp.ndarray) -> jnp.ndarray:
        """One env step (= `oversampling` ETDRK4 steps). Forcing (+ the
        mu-disturbance) is constant over the env step and enters the
        nonlinear term additively, like the reference's CNAB2 treats it."""
        mode = self.fft_mode
        y = y.astype(jnp.float32)
        vr, vi = fourier.rfft_ri(y, mode=mode)
        fr, fi = fourier.rfft_ri(forcing.astype(jnp.float32), mode=mode)
        (vr, vi), y = self._advance((vr, vi), fr, fi)
        return y

    def init_carry(self, y: jnp.ndarray):
        """Spectral-carry API: the half-spectrum (re, im) pair of `y`, to be
        threaded through `step_spectral` across env steps (configs/ks.py
        spectral_carry tier)."""
        return fourier.rfft_ri(y.astype(jnp.float32), mode=self.fft_mode)

    @partial(jax.jit, static_argnums=0)
    def step_spectral(self, carry, fr: jnp.ndarray, fi: jnp.ndarray):
        """One env step on the SPECTRAL carry: `(vr, vi), y' = step(...)`.

        Same math as `step` minus the two boundary analysis transforms —
        the state stays in spectral space between env steps (no per-step
        `rfft(y)`: the carry already IS the spectrum the previous step
        synthesized from), and the forcing arrives as a half-spectrum pair
        computed directly from the actions via pre-transformed actuator
        kernels (no per-step `rfft(forcing)`; exact, since the forcing is
        a linear combination of fixed kernels — KSSetup.jl:231-245). Only
        the ONE synthesis transform per env step remains, feeding
        featurize/reward/blow-up termination their real-space field
        unchanged. Numerically this REMOVES the per-step rfft∘irfft
        round-trip of the real-carry path (equivalence bounded in
        tests/test_ks_solver.py)."""
        (vr, vi), y = self._advance(carry, fr, fi)
        return (vr, vi), y

    @partial(jax.jit, static_argnums=0)
    def step_spectral_only(self, carry, fr: jnp.ndarray, fi: jnp.ndarray):
        """`step_spectral` minus the final synthesis transform — for the
        spectral-featurize tier (configs/ks.py `spectral_featurize`), where
        featurize/reward/blow-up termination consume the carried
        half-spectrum directly (sensor readouts are linear in y,
        KSSetup.jl:190-229, so ⟨y, g_i⟩ is an exact Parseval dot against
        pre-transformed kernels). ZERO full-tier transforms remain in the
        env step."""
        return self._advance_spectral(carry, fr, fi)

    def _advance(self, carry, fr, fi):
        """`oversampling` ETDRK4 substeps from spectral state + spectral
        forcing; returns (new_carry, real-space field)."""
        (vr, vi) = self._advance_spectral(carry, fr, fi)
        return (vr, vi), fourier.irfft_ri(vr, vi, self.nx, mode=self.fft_mode)

    def _advance_spectral(self, carry, fr, fi):
        """The spectral-state advance shared by step/step_spectral[_only]."""
        mode = self.fft_mode
        nl_mode = self.nl_fft_mode or mode
        vr, vi = carry
        fr = fr + self.dist_re
        fi = fi + self.dist_im

        def nonlin(zr, zi):
            u = fourier.irfft_ri(zr, zi, self.nx, mode=nl_mode)
            sr, si = fourier.rfft_ri(u * u, mode=nl_mode)
            # G*s with G = -0.5 i alpha, plus the constant forcing
            return self.g_alpha * si + fr, -self.g_alpha * sr + fi

        def substep(carry, _):
            vr, vi = carry
            nvr, nvi = nonlin(vr, vi)
            ar, ai = self.e_half * vr + self.q_w * nvr, self.e_half * vi + self.q_w * nvi
            nar, nai = nonlin(ar, ai)
            br, bi = self.e_half * vr + self.q_w * nar, self.e_half * vi + self.q_w * nai
            nbr, nbi = nonlin(br, bi)
            cr = self.e_half * ar + self.q_w * (2.0 * nbr - nvr)
            ci = self.e_half * ai + self.q_w * (2.0 * nbi - nvi)
            ncr, nci = nonlin(cr, ci)
            vr = (self.e_full * vr + self.f1_w * nvr
                  + 2.0 * self.f2_w * (nar + nbr) + self.f3_w * ncr)
            vi = (self.e_full * vi + self.f1_w * nvi
                  + 2.0 * self.f2_w * (nai + nbi) + self.f3_w * nci)
            return (vr, vi), None

        (vr, vi), _ = jax.lax.scan(substep, (vr, vi), None, length=self.oversampling)
        return (vr, vi)
