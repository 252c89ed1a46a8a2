"""KS spectral CNAB2 solver tests.

Golden strategy per SURVEY.md §4/§7: chaotic trajectories can't be compared
pointwise against the Julia reference, so we validate (a) bitwise-level
agreement with an independent full-complex-FFT NumPy implementation of the
same CNAB2 scheme, (b) physical invariants (boundedness, mean drift), and
(c) the forcing/disturbance paths.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from distributedconvrl_pde_control_tpu.ops.ks import KSSolver


def numpy_cnab2_reference(y, forcing, nx, lx, dt, oversampling, mu=0.0):
    """Independent NumPy CNAB2 with full complex FFTs, written directly from
    the scheme definition (CN linear + AB2 nonlinear), used as the oracle."""
    k = np.concatenate([np.arange(0, nx // 2), [0], np.arange(-nx // 2 + 1, 0)])
    alpha = 2 * np.pi * k / lx
    D = 1j * alpha
    L = alpha**2 - alpha**4
    G = -0.5 * D
    dt_os = dt / oversampling
    dt2, dt32 = dt_os / 2, 3 * dt_os / 2
    A_inv = 1.0 / (1.0 - dt2 * L)
    B = 1.0 + dt2 * L
    dx = lx / nx
    x = np.arange(1, nx + 1) * dx
    dist_hat = np.fft.fft(mu * np.cos(2 + np.pi + x / (lx / 2)))

    u = np.fft.fft(y.astype(np.complex128))
    Nn = G * np.fft.fft(y.astype(np.complex128) ** 2)
    f_hat = np.fft.fft(forcing)
    for _ in range(oversampling):
        Nn1 = Nn
        ur = np.fft.ifft(u)
        Nn = G * np.fft.fft(ur * ur)
        u = A_inv * (B * u + dt32 * Nn - dt2 * Nn1 + dt_os * f_hat) + dt_os * dist_hat
    return np.real(np.fft.ifft(u))


@pytest.mark.parametrize("mu", [0.0, 0.02])
def test_matches_independent_numpy_cnab2(mu):
    nx, lx, dt, oversampling = 64, 22.0, 0.1, 10
    rng = np.random.default_rng(0)
    y = 0.1 * rng.standard_normal(nx)
    forcing = 0.05 * np.sin(2 * np.pi * np.arange(nx) / nx)

    solver = KSSolver(nx=nx, lx=lx, dt=dt, oversampling=oversampling, mu=mu)
    got = np.asarray(solver.step(jnp.asarray(y, jnp.float32), jnp.asarray(forcing, jnp.float32)))
    want = numpy_cnab2_reference(y, forcing, nx, lx, dt, oversampling, mu=mu)
    assert np.allclose(got, want, rtol=2e-4, atol=2e-5), np.abs(got - want).max()


def test_chaotic_trajectory_stays_bounded():
    # KS at Lx=22 is chaotic with attractor amplitude O(3); the uncontrolled
    # field must stay far below the blow-up guard (max_value=30,
    # KSSetup.jl:32) over hundreds of steps.
    nx, lx = 192, 22.0
    solver = KSSolver(nx=nx, lx=lx, dt=0.1, oversampling=30)
    y = jnp.asarray(
        [0.5 if 4 <= i + 1 <= 44 else 0.0 for i in range(nx)], jnp.float32
    )  # y0_1D_standard, KSSetup.jl:53
    zero_forcing = jnp.zeros(nx, jnp.float32)
    for _ in range(300):
        y = solver.step(y, zero_forcing)
    y = np.asarray(y)
    assert np.all(np.isfinite(y))
    assert 0.1 < np.abs(y).max() < 10.0


def test_forcing_moves_the_field():
    nx, lx = 64, 22.0
    solver = KSSolver(nx=nx, lx=lx, dt=0.1, oversampling=10)
    y = jnp.zeros(nx, jnp.float32)
    f = jnp.asarray(np.sin(2 * np.pi * np.arange(nx) / nx), jnp.float32)
    y1 = solver.step(y, f)
    # forced from rest: response ~ dt * forcing to leading order
    assert 0.01 < float(jnp.abs(y1).max()) < 1.0
    y0 = solver.step(y, jnp.zeros(nx, jnp.float32))
    assert float(jnp.abs(y0).max()) < 1e-6


def test_etdrk4_matches_cnab2_on_attractor():
    """The ETDRK4 extension at ONE step per env step reproduces the
    reference scheme's step on physical (attractor) states to the f32
    floor — the accuracy basis for the 7.5x-fewer-transforms throughput
    stepper (PERFORMANCE.md)."""
    import jax.numpy as jnp

    from distributedconvrl_pde_control_tpu.configs.ks import ks_standard_y0
    from distributedconvrl_pde_control_tpu.ops.ks import KSSolver, KSSolverETDRK4

    nx, lx, dt = 192, 22.0, 0.1
    ref = KSSolver(nx=nx, lx=lx, dt=dt, oversampling=30, fft_mode="native")
    y = jnp.asarray(ks_standard_y0(nx))[None]
    f0 = jnp.zeros((1, nx), jnp.float32)
    for _ in range(200):  # spin up onto the attractor with the reference stepper
        y = ref.step(y, f0)
    rng = np.random.default_rng(0)
    f = jnp.asarray(0.2 * rng.standard_normal((1, nx)), jnp.float32)

    oracle = KSSolver(nx=nx, lx=lx, dt=dt, oversampling=600,
                      fft_mode="native").step(y, f)
    etd = KSSolverETDRK4(nx=nx, lx=lx, dt=dt, oversampling=1,
                         fft_mode="native").step(y, f)
    cnab = ref.step(y, f)
    scale = float(jnp.abs(oracle).max())
    err_etd = float(jnp.abs(etd - oracle).max()) / scale
    err_cnab = float(jnp.abs(cnab - oracle).max()) / scale
    assert err_etd < 5e-4, err_etd
    assert err_etd < 2.0 * err_cnab, (err_etd, err_cnab)


def test_etdrk4_with_disturbance_matches_cnab2():
    """mu*cos disturbance parity between the steppers (KSSetup.jl:155)."""
    import jax.numpy as jnp

    from distributedconvrl_pde_control_tpu.ops.ks import KSSolver, KSSolverETDRK4

    nx, lx, dt, mu = 64, 22.0, 0.05, 0.02
    y = jnp.zeros((1, nx), jnp.float32)
    f = jnp.zeros((1, nx), jnp.float32)
    a = KSSolver(nx=nx, lx=lx, dt=dt, oversampling=60, mu=mu,
                 fft_mode="native").step(y, f)
    b = KSSolverETDRK4(nx=nx, lx=lx, dt=dt, oversampling=2, mu=mu,
                       fft_mode="native").step(y, f)
    assert np.allclose(np.asarray(a), np.asarray(b), atol=2e-4), \
        np.abs(np.asarray(a) - np.asarray(b)).max()


def test_etdrk4_nl_fft_mode_tier():
    """nl_fft_mode plumbing: running the NONLINEAR evaluations at the
    matmul_fast tier (1-pass bf16 on TPU; plain f32 matmul on CPU, where
    Precision.DEFAULT is already f32) must reproduce the uniform-tier step
    to the f32 floor — the correctness basis for the TPU throughput tier
    (bf16 error enters scaled by the O(h) phi-weights; PERFORMANCE.md)."""
    import jax.numpy as jnp

    from distributedconvrl_pde_control_tpu.configs.ks import ks_standard_y0
    from distributedconvrl_pde_control_tpu.ops.ks import KSSolverETDRK4

    nx, lx, dt = 192, 22.0, 0.1
    base = KSSolverETDRK4(nx=nx, lx=lx, dt=dt, oversampling=1, fft_mode="matmul")
    tier = KSSolverETDRK4(nx=nx, lx=lx, dt=dt, oversampling=1, fft_mode="matmul",
                          nl_fft_mode="matmul_fast")
    y = jnp.asarray(ks_standard_y0(nx))[None]
    f0 = jnp.zeros((1, nx), jnp.float32)
    for _ in range(50):
        y = base.step(y, f0)
    a = np.asarray(base.step(y, f0))
    b = np.asarray(tier.step(y, f0))
    scale = np.abs(a).max()
    assert np.abs(a - b).max() / scale < 1e-5, np.abs(a - b).max() / scale
    # and the config plumbing reaches the solver (env.step_fn is the bound
    # method of the built KSSolverETDRK4)
    from distributedconvrl_pde_control_tpu.configs.ks import KS22, build_ks
    import dataclasses
    s = build_ks(dataclasses.replace(KS22, stepper="etdrk4",
                                     nl_fft_mode="matmul_fast"))
    assert s.env.step_fn.__self__.nl_fft_mode == "matmul_fast"


def test_coarse_grid_sensor_convergence():
    """KS22_64 tier (configs/ks.py): the reference's nx=192 for Lx=22 is
    ~4x over-resolved — on the coarse grid, the SENSOR OBSERVATIONS (the
    only thing the policy/reward see, physical-width sum/max-normalized
    Gaussians per KSSetup.jl:82-113) after forced env steps from a
    spectrally restricted attractor state must match the 192-grid
    reference to near the f32 floor."""
    import jax
    import jax.numpy as jnp

    from distributedconvrl_pde_control_tpu.configs.ks import KS22, ks_random_init
    from distributedconvrl_pde_control_tpu.envs.features import gaussian_kernels_1d
    from distributedconvrl_pde_control_tpu.ops.ks import KSSolver, KSSolverETDRK4

    cfg = KS22
    sol192 = KSSolver(nx=192, lx=cfg.lx, dt=cfg.dt, oversampling=30,
                      fft_mode="native")
    y = jnp.asarray(ks_random_init(cfg)(jax.random.PRNGKey(0)))
    zero = jnp.zeros(192)
    for _ in range(120):  # spin onto the attractor
        y = sol192.step(y, zero)
    y192 = np.asarray(y)

    h = np.fft.rfft(y192)[: 64 // 2 + 1]
    h[-1] = h[-1].real
    y64 = np.fft.irfft(h * (64 / 192), 64)

    sens_c = gaussian_kernels_1d(np.arange(1, 65, 8), 64, cfg.lx, 0.7, 1)
    sens_r = gaussian_kernels_1d(np.arange(1, 193, 24), 192, cfg.lx, 0.7, 1)
    act_c = gaussian_kernels_1d(np.arange(1, 65, 8), 64, cfg.lx, 0.7, 2)
    act_r = gaussian_kernels_1d(np.arange(1, 193, 24), 192, cfg.lx, 0.7, 2)
    a = np.zeros(8)
    a[3], a[6] = 1.0, -1.0
    fc = jnp.asarray(cfg.agent_power * (a @ act_c), jnp.float32)
    fr = jnp.asarray(cfg.agent_power * (a @ act_r), jnp.float32)

    solc = KSSolverETDRK4(nx=64, lx=cfg.lx, dt=cfg.dt, fft_mode="native")
    solr = KSSolverETDRK4(nx=192, lx=cfg.lx, dt=cfg.dt, fft_mode="native")
    yc, yr = jnp.asarray(y64, jnp.float32), jnp.asarray(y192, jnp.float32)
    for _ in range(10):
        yc = solc.step(yc, fc)
        yr = solr.step(yr, fr)
    oc = sens_c @ np.asarray(yc)
    orr = sens_r @ np.asarray(yr)
    rel = np.abs(oc - orr).max() / np.abs(orr).max()
    assert rel < 3e-4, rel


def test_spectral_carry_env_matches_standard_path():
    """The spectral-carry tier (configs/ks.py spectral_carry: carry the
    half-spectrum across env steps + spectral forcing from pre-transformed
    actuator kernels) must reproduce the standard real-carry env step to the
    f32 transform round-trip floor — the ONLY numerical difference is that
    the carry path skips the per-step rfft∘irfft round-trip and analyses the
    forcing kernels in float64 once instead of per step."""
    import dataclasses

    import jax

    from distributedconvrl_pde_control_tpu.configs.ks import KS22, build_ks

    base = dataclasses.replace(KS22, stepper="etdrk4", fft_mode="native")
    env_std = build_ks(base).env
    env_spec = build_ks(dataclasses.replace(base, spectral_carry=True)).env
    assert env_spec.init_carry is not None and env_spec.step_carry_fn is not None

    s_std, s_spec = env_std.reset(), env_spec.reset()
    assert s_std.carry is None and s_spec.carry is not None
    key = jax.random.PRNGKey(3)
    for i in range(12):
        key, k = jax.random.split(key)
        a = jax.random.uniform(k, env_std.action_shape, jnp.float32, -1.0, 1.0)
        s_std, s_spec = env_std.step(s_std, a), env_spec.step(s_spec, a)
        y_std, y_spec = np.asarray(s_std.y), np.asarray(s_spec.y)
        scale = np.abs(y_std).max()
        assert np.abs(y_spec - y_std).max() / scale < 5e-4, i
        np.testing.assert_allclose(np.asarray(s_spec.reward),
                                   np.asarray(s_std.reward), atol=5e-4)
        np.testing.assert_allclose(np.asarray(s_spec.obs),
                                   np.asarray(s_std.obs), atol=5e-4)
        # the recorded forcing plane is identical (prepare_action unchanged)
        np.testing.assert_array_equal(np.asarray(s_spec.forcing),
                                      np.asarray(s_std.forcing))
    assert bool(s_std.done) == bool(s_spec.done)


def test_spectral_carry_batched_trainer_runs():
    """The carry must flow through the batched trainer's vmap, auto-reset
    tree-select, flat obs/action packing, and the eval path."""
    import dataclasses

    import jax

    from distributedconvrl_pde_control_tpu.configs.ks import (
        KS22,
        build_ks,
        ks_random_init,
    )
    from distributedconvrl_pde_control_tpu.train.batched import (
        BatchedTrainer,
        BatchedTrainerConfig,
        train_batched,
    )

    cfg = dataclasses.replace(KS22, stepper="etdrk4", fft_mode="native",
                              spectral_carry=True)
    setup = build_ks(cfg)
    trainer = BatchedTrainer(setup.env, setup.agent,
                             BatchedTrainerConfig(n_envs=4, batch_size=16,
                                                  update_loops=1),
                             random_init=ks_random_init(cfg))
    ts, hook, means = train_batched(trainer, total_steps=60, chunk_len=30,
                                    key=jax.random.PRNGKey(0))
    assert np.isfinite(means).all()
    # carry is live in the carried env states (2-tuple of (4, 97) planes)
    assert ts.env_states.carry[0].shape == (4, KS22.nx // 2 + 1)
    r = trainer.eval_mean_reward(ts.agent.actor, n_steps=10)
    assert np.isfinite(r)


def test_spectral_featurize_matches_carry_tier():
    """The spectral-featurize tier (configs/ks.py spectral_featurize):
    featurize/reward consume the carried half-spectrum via exact Parseval
    contractions and the step skips the last synthesis transform. Against
    the carry tier over a forced rollout: carries advance BITWISE
    identically (step_spectral_only is step_spectral minus the synthesis),
    and obs/reward match to f32 contraction-reordering tolerance."""
    import dataclasses

    import jax

    from distributedconvrl_pde_control_tpu.configs.ks import KS22, build_ks

    base = dataclasses.replace(KS22, stepper="etdrk4", fft_mode="native",
                               spectral_carry=True)
    env_c = build_ks(base).env
    env_sf = build_ks(dataclasses.replace(base, spectral_featurize=True)).env
    s_c, s_sf = env_c.reset(), env_sf.reset()
    np.testing.assert_allclose(np.asarray(s_sf.obs), np.asarray(s_c.obs),
                               atol=2e-6)
    key = jax.random.PRNGKey(3)
    for _ in range(30):
        key, k = jax.random.split(key)
        a = jax.random.uniform(k, env_c.action_shape, jnp.float32, -1.0, 1.0)
        s_c, s_sf = env_c.step(s_c, a), env_sf.step(s_sf, a)
        for cc, cs in zip(s_c.carry, s_sf.carry):
            np.testing.assert_array_equal(np.asarray(cc), np.asarray(cs))
        np.testing.assert_allclose(np.asarray(s_sf.obs),
                                   np.asarray(s_c.obs), atol=2e-5)
        np.testing.assert_allclose(np.asarray(s_sf.reward),
                                   np.asarray(s_c.reward), atol=2e-5)
        assert bool(s_sf.done) == bool(s_c.done)
    # EnvState.y contract: the sf tier holds the RESET field (stale)
    np.testing.assert_array_equal(np.asarray(s_sf.y), np.asarray(env_sf.y0))


def test_spectral_featurize_guard_is_sound_parseval_rms():
    """The blow-up surrogate: (a) the Parseval mean-square on the carry
    equals the real-space rms (weights correct), (b) a high-energy carry
    terminates the episode, (c) a NaN carry terminates (non-finite guard
    reads the carry, since y is stale on this tier)."""
    import dataclasses

    import jax

    from distributedconvrl_pde_control_tpu.configs.ks import KS22, build_ks

    cfg = dataclasses.replace(KS22, stepper="etdrk4", fft_mode="native",
                              spectral_carry=True, spectral_featurize=True)
    env = build_ks(cfg).env
    s = env.reset()
    # (a) weights: rms from the carry == rms of the real field
    cr, ci = s.carry
    nxh = KS22.nx // 2 + 1
    w = np.full(nxh, 2.0 / KS22.nx)
    w[0] = w[-1] = 1.0 / KS22.nx
    rms_spec = np.sqrt(w @ (np.asarray(cr) ** 2 + np.asarray(ci) ** 2) / KS22.nx)
    rms_real = np.sqrt(np.mean(np.asarray(env.y0) ** 2))
    np.testing.assert_allclose(rms_spec, rms_real, rtol=1e-5)
    a0 = jnp.zeros(env.action_shape, jnp.float32)
    # (b) scaled-up carry -> rms >> max_value -> done (blow-up or non-finite
    # after one huge ETDRK4 step; either guard must catch it)
    s_big = s.replace(carry=jax.tree.map(lambda x: x * 1e4, s.carry))
    assert bool(env.step(s_big, a0).done)
    # (c) NaN carry -> done
    s_nan = s.replace(carry=jax.tree.map(lambda x: x * jnp.nan, s.carry))
    assert bool(env.step(s_nan, a0).done)


def test_spectral_featurize_batched_trainer_runs():
    """The sf tier under the fused trainer: flat carries, auto-reset,
    replay, learner, eval — finite end to end across episode boundaries."""
    import dataclasses

    import jax

    from distributedconvrl_pde_control_tpu.configs.ks import (
        KS22,
        build_ks,
        ks_random_init,
    )
    from distributedconvrl_pde_control_tpu.train.batched import (
        BatchedTrainer,
        BatchedTrainerConfig,
        train_batched,
    )

    cfg = dataclasses.replace(KS22, stepper="etdrk4", fft_mode="native",
                              spectral_carry=True, spectral_featurize=True)
    setup = build_ks(cfg)
    trainer = BatchedTrainer(setup.env, setup.agent,
                             BatchedTrainerConfig(n_envs=4, batch_size=16,
                                                  update_loops=1),
                             random_init=ks_random_init(cfg))
    ts, hook, means = train_batched(trainer, total_steps=120, chunk_len=60,
                                    key=jax.random.PRNGKey(0))
    assert np.isfinite(means).all()
    assert hook.ep > 1  # 50-step episodes completed and auto-reset
    r = trainer.eval_mean_reward(ts.agent.actor, n_steps=10)
    assert np.isfinite(r)
