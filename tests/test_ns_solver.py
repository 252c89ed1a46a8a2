"""2D Navier–Stokes vorticity solver tests.

Taylor–Green vortex gives an exact solution (advection vanishes identically),
so the solver's linear + spectral plumbing can be checked to tight tolerance;
pad/chop roundtrips and dealias consistency cover the 3/2-rule path.
"""

import numpy as np
import jax.numpy as jnp

from distributedconvrl_pde_control_tpu.ops.navier_stokes import (
    NSSolver,
    initial_condition,
    meshgrid_xy,
    taylorvtx_hat,
)
from distributedconvrl_pde_control_tpu.ops.spectral import chop_32, pad_32


def test_taylor_green_exact_decay():
    nx = ny = 64
    lx = ly = 1.0
    nu = 5e-4
    solver = NSSolver(nx=nx, ny=ny, lx=lx, ly=ly, nu=nu, dealias=True)
    xx, yy = meshgrid_xy(nx, ny, lx, ly)
    k = 2 * np.pi / lx
    omg0 = 2.0 * np.cos(k * xx) * np.cos(k * yy)
    w = jnp.asarray(np.fft.fft2(omg0), jnp.complex64)
    dt, oversampling, steps = 0.02, 8, 10
    zero_f = jnp.zeros_like(w)
    for _ in range(steps):
        w = solver.step(w, zero_f, dt, oversampling)
    got = np.fft.ifft2(np.asarray(w)).real
    want = omg0 * np.exp(-nu * 2 * k**2 * dt * steps)
    assert np.allclose(got, want, atol=5e-4), np.abs(got - want).max()


def test_pad_chop_roundtrip():
    rng = np.random.default_rng(1)
    ny, nx = 32, 32
    f = rng.standard_normal((ny, nx)) + 1j * rng.standard_normal((ny, nx))
    f = jnp.asarray(f, jnp.complex64)
    fp = pad_32(f, 48, 48)
    back = chop_32(fp, ny, nx)
    # pad inserts zeros at high frequencies; chop drops exactly those rows/
    # cols. The row/col at the Nyquist index is split by the quadrant copy so
    # only assert the retained quadrants.
    assert np.allclose(np.asarray(back), np.asarray(f), atol=1e-6)


def test_dealias_matches_plain_for_smooth_field():
    # For a band-limited smooth field the 3/2-rule and plain collocation
    # advection agree.
    nx = ny = 64
    s_pad = NSSolver(nx=nx, ny=ny, nu=5e-5, dealias=True)
    s_raw = NSSolver(nx=nx, ny=ny, nu=5e-5, dealias=False)
    xx, yy = meshgrid_xy(nx, ny, 1.0, 1.0)
    omg = np.cos(2 * np.pi * xx) * np.sin(4 * np.pi * yy) + 0.3 * np.sin(2 * np.pi * yy)
    w = jnp.asarray(np.fft.fft2(omg), jnp.complex64)
    a1 = np.fft.ifft2(np.asarray(s_pad.advection(w))).real
    a2 = np.fft.ifft2(np.asarray(s_raw.advection(w))).real
    assert np.allclose(a1, a2, atol=5e-3 * max(1.0, np.abs(a1).max()))


def test_initial_conditions_shapes_and_energy():
    rng = np.random.default_rng(7)
    for case in (1, 2, 3, 4):
        w = initial_condition(case, 32, 32, 1.0, 1.0, rng)
        assert w.shape == (32, 32)
        omg = np.fft.ifft2(w).real
        assert np.isfinite(omg).all()
        assert np.abs(omg).max() > 0.1


def test_omg2vel_divergence_free():
    nx = ny = 32
    solver = NSSolver(nx=nx, ny=ny, nu=5e-5)
    rng = np.random.default_rng(3)
    xx, yy = meshgrid_xy(nx, ny, 1.0, 1.0)
    w = jnp.asarray(taylorvtx_hat(xx, yy, 0.5, 0.5, 0.12, 1.0, 1.0, 1.0), jnp.complex64)
    u, v, omg, psi = solver.omg2vel(w)
    # spectral divergence of (u, v) should vanish
    uh, vh = np.fft.fft2(np.asarray(u)), np.fft.fft2(np.asarray(v))
    div = 1j * np.asarray(solver.kx_row) * uh + 1j * np.asarray(solver.ky_col) * vh
    assert np.abs(np.fft.ifft2(div).real).max() < 1e-3


def test_ifrk4_taylor_green_viscous_decay_exact_at_one_substep():
    """The integrating factor treats the viscous diagonal EXACTLY: for
    Taylor-Green (advection vanishes identically) one IF-RK4 substep per env
    step reproduces the analytic decay to float precision, at a nu*k^2*dt
    where plain RK4 at the same substep count is visibly wrong."""
    nx = ny = 64
    nu = 5e-3  # 100x the fluid preset: nu*2k^2*dt = 0.79 per step
    solver = NSSolver(nx=nx, ny=ny, nu=nu, dealias=True)
    xx, yy = meshgrid_xy(nx, ny, 1.0, 1.0)
    k = 2 * np.pi
    omg0 = 2.0 * np.cos(k * xx) * np.cos(k * yy)
    w = jnp.asarray(np.fft.fft2(omg0), jnp.complex64)
    zero_f = jnp.zeros_like(w)
    dt, steps = 0.02, 10
    w_if = w
    for _ in range(steps):
        w_if = solver.step_if(w_if, zero_f, dt, 1)
    got = np.fft.ifft2(np.asarray(w_if)).real
    want = omg0 * np.exp(-nu * 2 * k**2 * dt * steps)
    assert np.abs(got - want).max() < 1e-5, np.abs(got - want).max()


def test_step_real_if_matches_complex_if_path():
    """Split-(re,im) IF-RK4 must match the complex IF-RK4 reference path."""
    rng = np.random.default_rng(3)
    w0 = initial_condition(2, 32, 32, 1.0, 1.0, rng)
    omg = np.fft.ifft2(w0).real.astype(np.float32)
    f_real = 0.3 * np.cos(2 * np.pi * np.arange(32) / 32)[None, :] * np.ones((32, 1))
    f_hat = jnp.asarray(np.fft.fft2(f_real), jnp.complex64)
    for dealias in (True, False):
        s = NSSolver(nx=32, ny=32, nu=5e-4, dealias=dealias, fft_mode="native")
        want = np.fft.ifft2(np.asarray(
            s.step_if(jnp.asarray(w0, jnp.complex64), f_hat, 0.01, 4)
        )).real
        got = np.asarray(
            s.step_real_if(jnp.asarray(omg), jnp.asarray(f_real, jnp.float32), 0.01, 4)
        )
        assert np.allclose(got, want, atol=2e-4), (dealias, np.abs(got - want).max())


def test_ifrk4_fast_tier_matches_fine_oracle_on_vortex_field():
    """The fast tier's accuracy claim (PERFORMANCE.md ladder): from a random-
    vortex field with actuation-scale forcing, IF-RK4 at the preset's
    fast_oversampling matches a fine-substep RK4 oracle at least as tightly
    as the reference's installed adaptive tol-1e0 stepper does."""
    n = 64
    rng = np.random.default_rng(5)
    solver = NSSolver(nx=n, ny=n, nu=5e-5, dealias=True)
    omg = jnp.asarray(np.fft.ifft2(initial_condition(3, n, n, 1.0, 1.0, rng)).real,
                      jnp.float32)
    zero = jnp.zeros((n, n), jnp.float32)
    # short spin-up onto the nonlinear attractor
    for _ in range(10):
        omg = solver.step_real(omg, zero, 0.02, 20)
    f = jnp.asarray(
        5.0 * np.cos(2 * np.pi * np.arange(n) / n)[None, :] * np.ones((n, 1)),
        jnp.float32)
    oracle = np.asarray(solver.step_real(omg, f, 0.02, 200))
    scale = np.abs(oracle).max()
    err_if8 = np.abs(np.asarray(solver.step_real_if(omg, f, 0.02, 8)) - oracle).max() / scale
    err_rk40 = np.abs(np.asarray(solver.step_real(omg, f, 0.02, 40)) - oracle).max() / scale
    assert err_if8 < 1e-3, err_if8  # the adaptive tol-1e0 error scale (PERFORMANCE.md)
    assert err_rk40 < 1e-4  # sanity: the 40-substep path is tighter still


def test_step_real_half_spectrum_matches_complex_path():
    """The production real path (half-spectrum ri arithmetic) must match the
    complex reference path, dealiased and plain."""
    rng = np.random.default_rng(3)
    w0 = initial_condition(2, 32, 32, 1.0, 1.0, rng)
    omg = np.fft.ifft2(w0).real.astype(np.float32)
    f_real = 0.3 * np.cos(2 * np.pi * np.arange(32) / 32)[None, :] * np.ones((32, 1))
    f_hat = jnp.asarray(np.fft.fft2(f_real), jnp.complex64)

    for dealias in (True, False):
        for half in (True, False):
            s = NSSolver(nx=32, ny=32, nu=5e-4, dealias=dealias, fft_mode="native",
                         half_spectrum=half)
            want = np.fft.ifft2(np.asarray(
                s.step(jnp.asarray(w0, jnp.complex64), f_hat, 0.01, 4)
            )).real
            got = np.asarray(
                s.step_real(jnp.asarray(omg), jnp.asarray(f_real, jnp.float32), 0.01, 4)
            )
            assert np.allclose(got, want, atol=2e-4), (dealias, half, np.abs(got - want).max())


def test_nl_fft_mode_tier_plumbing():
    """nl_fft_mode (1-pass-bf16 ADVECTION transforms on TPU; plain f32
    matmul on CPU where Precision.DEFAULT is f32) must reproduce the
    uniform-tier IF-RK4 step to the f32 floor, and the config field must
    reach the built solver — the correctness basis for the fluid
    throughput tier (error enters scaled by dt_os; PERFORMANCE.md)."""
    import dataclasses

    n = 64
    rng = np.random.default_rng(6)
    base = NSSolver(nx=n, ny=n, nu=5e-5, dealias=True, fft_mode="matmul")
    tier = NSSolver(nx=n, ny=n, nu=5e-5, dealias=True, fft_mode="matmul",
                    nl_fft_mode="matmul_fast")
    omg = jnp.asarray(np.fft.ifft2(initial_condition(3, n, n, 1.0, 1.0, rng)).real,
                      jnp.float32)
    zero = jnp.zeros((n, n), jnp.float32)
    for _ in range(5):
        omg = base.step_real(omg, zero, 0.02, 10)
    a = np.asarray(base.step_real_if(omg, zero, 0.02, 8))
    b = np.asarray(tier.step_real_if(omg, zero, 0.02, 8))
    assert np.abs(a - b).max() / np.abs(a).max() < 1e-5

    from distributedconvrl_pde_control_tpu.configs.fluid import FLUID_8, build_fluid
    cfg = dataclasses.replace(FLUID_8, adaptive=False, stepper="ifrk4",
                              nl_fft_mode="matmul_fast")
    setup = build_fluid(cfg)
    assert setup.env.step_fn.__closure__ is not None  # built without error
