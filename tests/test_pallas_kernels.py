"""Pallas kernel correctness (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from distributedconvrl_pde_control_tpu.ops.ks import KSSolver
from distributedconvrl_pde_control_tpu.ops.pallas.ks_kernel import KSPallasStepper


def test_ks_pallas_matches_solver():
    solver = KSSolver(nx=192, lx=22.0, dt=0.1, oversampling=10, fft_mode="native")
    stepper = KSPallasStepper(solver, interpret=True)
    rng = np.random.default_rng(0)
    y = jnp.asarray(0.4 * rng.standard_normal((8, 192)), jnp.float32)
    f = jnp.asarray(0.2 * rng.standard_normal((8, 192)), jnp.float32)
    want = np.asarray(solver.step(y, f))
    got = np.asarray(stepper.step(y, f))
    assert np.allclose(got, want, atol=2e-4), np.abs(got - want).max()


def test_ks_pallas_with_disturbance():
    solver = KSSolver(nx=64, lx=22.0, dt=0.1, oversampling=5, mu=0.02, fft_mode="native")
    stepper = KSPallasStepper(solver, interpret=True)
    y = jnp.zeros((4, 64), jnp.float32)
    f = jnp.zeros((4, 64), jnp.float32)
    want = np.asarray(solver.step(y, f))
    got = np.asarray(stepper.step(y, f))
    assert np.allclose(got, want, atol=1e-5), np.abs(got - want).max()


def test_ks_pallas_tiled_batch():
    solver = KSSolver(nx=192, lx=22.0, dt=0.1, oversampling=5, fft_mode="native")
    stepper = KSPallasStepper(solver, interpret=True)
    rng = np.random.default_rng(1)
    y = jnp.asarray(0.3 * rng.standard_normal((512, 192)), jnp.float32)
    f = jnp.asarray(0.1 * rng.standard_normal((512, 192)), jnp.float32)
    want = np.asarray(solver.step(y, f))
    got = np.asarray(stepper.step(y, f))
    assert np.allclose(got, want, atol=2e-4), np.abs(got - want).max()


def test_ns_advection_pallas_matches_xla():
    """The fused 2D advection kernel (round-2 Pallas study) matches the
    production XLA advection path."""
    from distributedconvrl_pde_control_tpu.ops.pallas.ns_advection import (
        PallasAdvection2D,
        xla_advection_ri,
    )

    n, B = 32, 4
    rng = np.random.default_rng(0)
    wh = np.fft.fft2(rng.standard_normal((B, n, n)))
    wr = jnp.asarray(wh.real, jnp.float32)
    wi = jnp.asarray(wh.imag, jnp.float32)
    want_r, want_i = jax.vmap(xla_advection_ri(n))(wr, wi)
    got_r, got_i = PallasAdvection2D(n=n, tile_b=2, interpret=True)(wr, wi)
    scale = float(np.abs(np.asarray(want_r)).max())
    assert np.abs(np.asarray(got_r) - np.asarray(want_r)).max() < 1e-4 * scale
    assert np.abs(np.asarray(got_i) - np.asarray(want_i)).max() < 1e-4 * scale
