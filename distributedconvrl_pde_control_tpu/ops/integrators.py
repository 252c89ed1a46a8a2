"""Generic fixed-step and adaptive integrators for user-supplied RHS functions.

These replace the reference's fallback paths when no bespoke `do_step` is
given (`src/PDEenv.jl:201-218`):

  * `midpoint_oversampled` — the reference's default two-stage scheme
    (PDEenv.jl:208-214): y <- y_old + dt*f(y_old + dt/2 * f(y_old)).
  * `rk4_oversampled`      — classic RK4, fixed substeps.
  * `rk4_adaptive`         — step-doubling adaptive RK4 inside a
    `lax.while_loop` (static max iterations), the TPU-friendly stand-in for
    the reference's host-side adaptive solvers (RadauIIA5 at PDEenv.jl:203-206
    and adaptive RK4 at FluidSetup.jl:181-186 / KellerSegelSetup.jl:234-239).
  * `implicit_trapezoid`   — fixed-point Crank–Nicolson for stiff problems,
    the fixed-iteration replacement for RadauIIA5.

All integrators take `f(y, forcing) -> dy/dt` (time-autonomous within an env
step, like the reference where env.p is frozen between agent actions) and are
jit/scan-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def midpoint_oversampled(f, y, forcing, dt, oversampling: int):
    """Reference default stepper, PDEenv.jl:208-214 (midpoint RK2)."""
    dt_os = dt / oversampling

    def sub(y, _):
        y_mid = y + 0.5 * dt_os * f(y, forcing)
        return y + dt_os * f(y_mid, forcing), None

    y, _ = jax.lax.scan(sub, y, None, length=oversampling)
    return y


def _rk4_step(f, y, forcing, dt):
    k1 = f(y, forcing)
    k2 = f(y + 0.5 * dt * k1, forcing)
    k3 = f(y + 0.5 * dt * k2, forcing)
    k4 = f(y + dt * k3, forcing)
    return y + dt / 6.0 * (k1 + 2.0 * (k2 + k3) + k4)


def rk4_oversampled(f, y, forcing, dt, oversampling: int):
    dt_os = dt / oversampling

    def sub(y, _):
        return _rk4_step(f, y, forcing, dt_os), None

    y, _ = jax.lax.scan(sub, y, None, length=oversampling)
    return y


def rk4_adaptive(f, y, forcing, dt, rtol=1e-8, atol=1e-8, max_steps: int = 4096):
    """Step-doubling adaptive RK4 over one env step of length `dt`.

    Error estimate: one full step vs two half steps (classic Richardson).
    Runs as a `lax.while_loop` with a static iteration cap so it stays a
    single compiled program — no host round-trips, unlike the reference's
    DifferentialEquations.jl solves.
    """

    def cond(state):
        t, _, h, n = state
        return jnp.logical_and(t < dt * (1 - 1e-12), n < max_steps)

    def body(state):
        t, y, h, n = state
        h = jnp.minimum(h, dt - t)
        y_full = _rk4_step(f, y, forcing, h)
        y_half = _rk4_step(f, y, forcing, h / 2.0)
        y_two = _rk4_step(f, y_half, forcing, h / 2.0)
        err = jnp.max(jnp.abs(y_two - y_full) / (atol + rtol * jnp.abs(y_two)))
        err = jnp.maximum(err, 1e-12)
        accept = err <= 15.0  # RK4 step-doubling tolerance factor (2^4 - 1)
        y_new = jnp.where(accept, y_two + (y_two - y_full) / 15.0, y)
        t_new = jnp.where(accept, t + h, t)
        h_new = h * jnp.clip(0.9 * (15.0 / err) ** 0.2, 0.2, 5.0)
        return (t_new, y_new, h_new, n + 1)

    _, y, _, _ = jax.lax.while_loop(cond, body, (jnp.asarray(0.0, y.real.dtype), y, jnp.asarray(dt / 16.0, y.real.dtype), 0))
    return y


def implicit_trapezoid(f, y, forcing, dt, oversampling: int, n_iters: int = 4):
    """Newton-iterated Crank–Nicolson: solve y1 = y0 + dt/2*(f(y0)+f(y1)).

    A-stable, 2nd order — the fixed-cost stiff integrator replacing the
    reference's host-side RadauIIA5 solve (PDEenv.jl:203-206). The Jacobian
    comes from `jax.jacfwd` on the flattened state and each Newton step is a
    dense solve, so this targets the reference's actual RadauIIA5 domain
    (small 1D systems; every shipped 2D setup supplies an explicit
    `do_step`). `n_iters` Newton iterations per substep, static under jit.
    """
    dt_os = dt / oversampling
    shape = y.shape
    n = y.size

    def f_flat(yf):
        return f(yf.reshape(shape), forcing).reshape(-1)

    eye = jnp.eye(n, dtype=y.dtype)

    def sub(y0f, _):
        f0 = f_flat(y0f)

        def newton(y1f, _):
            # residual r(y1) = y1 - y0 - dt/2 (f0 + f(y1))
            r = y1f - y0f - 0.5 * dt_os * (f0 + f_flat(y1f))
            jac = eye - 0.5 * dt_os * jax.jacfwd(f_flat)(y1f)
            return y1f - jnp.linalg.solve(jac, r), None

        y1f, _ = jax.lax.scan(newton, y0f + dt_os * f0, None, length=n_iters)
        return y1f, None

    yf, _ = jax.lax.scan(sub, y.reshape(-1), None, length=oversampling)
    return yf.reshape(shape)
