"""Generic integrator tests against analytic solutions."""

import numpy as np
import jax.numpy as jnp

from distributedconvrl_pde_control_tpu.ops.integrators import (
    implicit_trapezoid,
    midpoint_oversampled,
    rk4_adaptive,
    rk4_oversampled,
)


def decay(y, forcing):
    return -y + forcing


def test_midpoint_matches_reference_default_scheme_order():
    y0 = jnp.asarray([1.0], jnp.float32)
    f0 = jnp.asarray([0.0], jnp.float32)
    got = midpoint_oversampled(decay, y0, f0, dt=0.5, oversampling=50)
    assert np.allclose(float(got[0]), np.exp(-0.5), atol=1e-4)


def test_rk4_fixed_high_accuracy():
    y0 = jnp.asarray([1.0], jnp.float32)
    f0 = jnp.asarray([0.3], jnp.float32)
    got = rk4_oversampled(decay, y0, f0, dt=1.0, oversampling=20)
    want = 0.3 + (1.0 - 0.3) * np.exp(-1.0)  # y' = -(y - 0.3)
    assert np.allclose(float(got[0]), want, atol=1e-5)


def test_rk4_adaptive_converges():
    y0 = jnp.asarray([1.0], jnp.float32)
    f0 = jnp.asarray([0.0], jnp.float32)
    got = rk4_adaptive(decay, y0, f0, dt=2.0, rtol=1e-6, atol=1e-8)
    assert np.allclose(float(got[0]), np.exp(-2.0), atol=1e-5)


def test_implicit_trapezoid_stiff_stable():
    # y' = -1000 y: explicit RK4 at dt_os=0.01 would blow up (lambda*h = -10);
    # the implicit trapezoid must remain stable and decay monotonically.
    def stiff(y, forcing):
        return -1000.0 * y

    y0 = jnp.asarray([1.0], jnp.float32)
    f0 = jnp.asarray([0.0], jnp.float32)
    got = implicit_trapezoid(stiff, y0, f0, dt=0.1, oversampling=10, n_iters=4)
    assert np.isfinite(float(got[0]))
    # exact trapezoid amplification per substep: (1 + hl/2)/(1 - hl/2) = -2/3
    want = (-2.0 / 3.0) ** 10
    assert abs(float(got[0]) - want) < 1e-3
