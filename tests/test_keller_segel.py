"""Keller–Segel FD solver tests."""

import numpy as np
import jax.numpy as jnp

from distributedconvrl_pde_control_tpu.ops.keller_segel import KellerSegelSolver


def test_homogeneous_steady_state_is_fixed():
    # u = v = 1 is an exact steady state of the unforced system:
    #   v_t = v_xx - v + u = 0, u_t = u_xx + u - u^2 = 0.
    solver = KellerSegelSolver(nx=100, lx=10.0)
    y = jnp.ones((2, 100), jnp.float32)
    zero = jnp.zeros(100, jnp.float32)
    y1 = solver.step(y, zero, dt=0.006, oversampling=50)
    assert np.allclose(np.asarray(y1), 1.0, atol=1e-5)


def test_rhs_matches_hand_stencil():
    solver = KellerSegelSolver(nx=16, lx=2.0)
    rng = np.random.default_rng(0)
    u = rng.standard_normal(16)
    v = rng.standard_normal(16)
    f = rng.standard_normal(16)
    dx = 2.0 / 16

    def shifts(w):
        wm = np.roll(w, 1).copy()
        wp = np.roll(w, -1).copy()
        wm[0] = w[0]
        wp[-1] = w[-1]
        return wm, wp

    um, up = shifts(u)
    vm, vp = shifts(v)
    du1 = (up - um) / (2 * dx)
    du2 = (um - 2 * u + up) / dx**2
    dv1 = (vp - vm) / (2 * dx)
    dv2 = (vm - 2 * v + vp) / dx**2
    want_v = dv2 - v + u + f
    want_u = du2 + u - 5.6 * du1 * dv1 - 5.6 * u * dv2 - u**2

    got = np.asarray(solver.rhs(jnp.asarray(np.stack([u, v]), jnp.float32), jnp.asarray(f, jnp.float32)))
    assert np.allclose(got[0], want_u, rtol=1e-4, atol=1e-4)
    assert np.allclose(got[1], want_v, rtol=1e-4, atol=1e-4)


def test_chemotactic_instability_grows_then_finite():
    # Small perturbations around (1, 1.01) develop structure (aggregation)
    # but the scheme stays finite over an episode-scale horizon
    # (te=8, dt=0.006 -> 1333 env steps; we run a few hundred).
    solver = KellerSegelSolver(nx=100, lx=10.0)
    rng = np.random.default_rng(5)
    y = np.ones((2, 100))
    y[1] *= 1.01
    y[0] += 0.01 * rng.standard_normal(100)
    y = jnp.asarray(y, jnp.float32)
    zero = jnp.zeros(100, jnp.float32)
    for _ in range(300):
        y = solver.step(y, zero, dt=0.006, oversampling=10)
    arr = np.asarray(y)
    assert np.isfinite(arr).all()
    assert arr[0].std() > 1e-4  # structure formed
