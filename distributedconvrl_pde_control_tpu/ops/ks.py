"""Kuramoto–Sivashinsky spectral CNAB2 stepper.

Solves u_t = -u*u_x - u_xx - u_xxxx + forcing (+ mu*cos(...) disturbance) on a
periodic domain, semantics matching the reference's `do_step`
(`scripts/KS/setup/KSSetup.jl:130-160`): Crank–Nicolson for the linear term,
2nd-order Adams–Bashforth for the nonlinear term, `oversampling` substeps per
environment step.

TPU-native design: the whole substep loop is a `lax.scan` over precomputed
diagonal spectral operators on the rfft half-spectrum; one rfft/irfft pair per
substep (the u^2 collocation), everything else is fused elementwise work.
The environment-step forcing is transformed once outside the scan.
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

    # derived spectral operators (filled in __post_init__)
    g_op: jnp.ndarray = dataclasses.field(init=False, repr=False, compare=False)
    a_inv: jnp.ndarray = dataclasses.field(init=False, repr=False, compare=False)
    b_op: jnp.ndarray = dataclasses.field(init=False, repr=False, compare=False)
    dist_hat: jnp.ndarray = dataclasses.field(init=False, repr=False, compare=False)

    def __post_init__(self):
        _, d_op, lin_op = ks_rfft_operators(self.nx, self.lx)
        dt_os = self.dt / self.oversampling
        dt2 = dt_os / 2.0
        # G = -0.5 * D (KSSetup.jl:119); A_inv/B at the oversampled dt
        # (KSSetup.jl:134-135).
        g_op = (-0.5 * np.asarray(d_op)).astype(np.complex64)
        lin = np.asarray(lin_op, dtype=np.float64)
        a_inv = 1.0 / (1.0 - dt2 * lin)
        b_op = 1.0 + dt2 * lin
        # disturbance mu*cos(2 + pi + x/(Lx/2)) (KSSetup.jl:155), transformed
        # once; added *outside* the A_inv solve, exactly as the reference does.
        dx = self.lx / self.nx
        x = np.arange(1, self.nx + 1) * dx
        dist = self.mu * np.cos(2.0 + np.pi + x / (self.lx / 2.0))
        dist_hat = np.fft.rfft(dist) * dt_os
        object.__setattr__(self, "g_op", jnp.asarray(g_op))
        object.__setattr__(self, "a_inv", jnp.asarray(a_inv, dtype=jnp.float32))
        object.__setattr__(self, "b_op", jnp.asarray(b_op, dtype=jnp.float32))
        object.__setattr__(self, "dist_hat", jnp.asarray(dist_hat, dtype=jnp.complex64))

    @partial(jax.jit, static_argnums=0)
    def step(self, y: jnp.ndarray, forcing: jnp.ndarray) -> jnp.ndarray:
        """Advance the real field y by one env step (= `oversampling` substeps).

        `forcing` is the real-space forcing field p(x) (constant over the env
        step, as in the reference where env.p is fixed between agent actions).
        Semantics of KSSetup.jl:130-160.
        """
        dt_os = self.dt / self.oversampling
        dt2 = dt_os / 2.0
        dt32 = 3.0 * dt_os / 2.0

        u = fourier.rfft(y.astype(jnp.float32), mode=self.fft_mode)
        # initial nonlinear term from the real field (KSSetup.jl:140-141)
        nn = self.g_op * fourier.rfft(y * y, mode=self.fft_mode)
        f_hat = fourier.rfft(forcing.astype(jnp.float32), mode=self.fft_mode) * dt_os

        def substep(carry, _):
            u, nn = carry
            nn1 = nn
            ur = fourier.irfft(u, self.nx, mode=self.fft_mode)
            nn = self.g_op * fourier.rfft(ur * ur, mode=self.fft_mode)
            u = self.a_inv * (self.b_op * u + dt32 * nn - dt2 * nn1 + f_hat) + self.dist_hat
            return (u, nn), None

        (u, _), _ = jax.lax.scan(substep, (u, nn), None, length=self.oversampling)
        return fourier.irfft(u, self.nx, mode=self.fft_mode)
