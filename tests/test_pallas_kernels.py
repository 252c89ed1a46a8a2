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
