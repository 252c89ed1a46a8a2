"""Matmul-DFT (MXU path) vs native FFT equivalence."""

import numpy as np
import jax.numpy as jnp

import distributedconvrl_pde_control_tpu.ops.fourier as fourier


def test_rfft_irfft_matmul_matches_numpy():
    rng = np.random.default_rng(0)
    for n in (64, 192, 100):
        y = rng.standard_normal((3, n)).astype(np.float32)

        got = np.asarray(fourier.rfft(jnp.asarray(y), mode="matmul"))
        want = np.fft.rfft(y)
        assert np.allclose(got, want, atol=2e-3 * np.abs(want).max()), n

        h = np.fft.rfft(y)
        back = np.asarray(fourier.irfft(jnp.asarray(h.astype(np.complex64)), n, mode="matmul"))
        assert np.allclose(back, y, atol=1e-4), n


def test_fft_ifft_matmul_complex():
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((2, 48)) + 1j * rng.standard_normal((2, 48))).astype(np.complex64)
    got = np.asarray(fourier.fft(jnp.asarray(x), mode="matmul"))
    want = np.fft.fft(x)
    assert np.allclose(got, want, atol=1e-3)
    back = np.asarray(fourier.ifft(jnp.asarray(want.astype(np.complex64)), mode="matmul"))
    assert np.allclose(back, x, atol=1e-4)


def test_fft2_matmul():
    rng = np.random.default_rng(2)
    x = (rng.standard_normal((32, 32)) + 1j * rng.standard_normal((32, 32))).astype(np.complex64)
    got = np.asarray(fourier.fft2(jnp.asarray(x), mode="matmul"))
    want = np.fft.fft2(x)
    assert np.allclose(got, want, atol=5e-3)
    back = np.asarray(fourier.ifft2(jnp.asarray(want.astype(np.complex64)), mode="matmul"))
    assert np.allclose(back, x, atol=1e-4)


def test_axis_argument():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((8, 16, 4)).astype(np.float32)
    got = np.asarray(fourier.rfft(jnp.asarray(x), axis=1, mode="matmul"))
    want = np.fft.rfft(x, axis=1)
    assert np.allclose(got, want, atol=1e-3)


def test_ks_solver_matmul_path_matches_native():
    from distributedconvrl_pde_control_tpu.ops.ks import KSSolver

    rng = np.random.default_rng(4)
    y = jnp.asarray(0.3 * rng.standard_normal(96), jnp.float32)
    f = jnp.asarray(0.1 * rng.standard_normal(96), jnp.float32)
    native = np.asarray(KSSolver(nx=96, lx=22.0, dt=0.1, oversampling=10,
                                 fft_mode="native").step(y, f))
    mm = np.asarray(KSSolver(nx=96, lx=22.0, dt=0.1, oversampling=10,
                             fft_mode="matmul").step(y, f))
    assert np.allclose(native, mm, atol=5e-4), np.abs(native - mm).max()


def test_ns_solver_matmul_path_matches_native():
    from distributedconvrl_pde_control_tpu.ops.navier_stokes import NSSolver, initial_condition

    rng = np.random.default_rng(5)
    w = jnp.asarray(initial_condition(1, 32, 32, 1.0, 1.0, rng), jnp.complex64)
    zero = jnp.zeros_like(w)
    native = np.asarray(NSSolver(nx=32, ny=32, nu=5e-4, fft_mode="native").step(w, zero, 0.01, 4))
    mm = np.asarray(NSSolver(nx=32, ny=32, nu=5e-4, fft_mode="matmul").step(w, zero, 0.01, 4))
    assert np.allclose(native, mm, atol=2e-2), np.abs(native - mm).max()


def test_matmul_fast_mode_within_loose_tolerance():
    """fft_mode="matmul_fast" (DEFAULT-precision MXU passes) must stay within
    the fluid path's own accuracy regime (the reference integrates at tol
    1e0, FluidSetup.jl:179). Measured ~4e-3 relative per env step on TPU."""
    from distributedconvrl_pde_control_tpu.ops.navier_stokes import (
        NSSolver,
        initial_condition,
    )

    rng = np.random.default_rng(0)
    omg = jnp.asarray(np.fft.ifft2(initial_condition(2, 32, 32, 1.0, 1.0, rng)).real,
                      jnp.float32)
    zero = jnp.zeros((32, 32), jnp.float32)
    hi = np.asarray(NSSolver(nx=32, ny=32, nu=5e-4, fft_mode="matmul")
                    .step_real(omg, zero, 0.01, 4))
    fast = np.asarray(NSSolver(nx=32, ny=32, nu=5e-4, fft_mode="matmul_fast")
                      .step_real(omg, zero, 0.01, 4))
    rel = np.abs(fast - hi).max() / np.abs(hi).max()
    assert rel < 5e-2, rel


def test_matmul_hi_mode_dispatch():
    """matmul_hi (3-pass bf16, Precision.HIGH) is accepted by every
    transform and is exact on CPU (precision levels only bind on the MXU)."""
    import numpy as np

    from distributedconvrl_pde_control_tpu.ops import fourier as F

    x = jnp.asarray(np.random.default_rng(0).standard_normal((8, 16)), jnp.float32)
    assert F.use_matmul_dft("matmul_hi")
    import jax

    got = F.fft2(jax.lax.complex(x, jnp.zeros_like(x)), mode="matmul_hi")
    want = np.fft.fft2(np.asarray(x))
    assert np.allclose(np.asarray(got), want, atol=1e-3)
    re, im = F.rfft_ri(x, mode="matmul_hi")
    y = F.irfft_ri(re, im, 16, mode="matmul_hi")
    assert np.allclose(np.asarray(y), np.asarray(x), atol=1e-5)
