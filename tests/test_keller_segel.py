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


def test_fast_oversampling_matches_fine_oracle():
    """The KellerSegel10_16_fast tier (10 substeps): from a spun-up forced
    state, one env step at 10 substeps matches a 500-substep oracle at the
    same ~2e-5 f32 floor as the reference's 50-substep budget — the
    measured basis for the 5x-cheaper preset (configs.keller_segel)."""
    from distributedconvrl_pde_control_tpu.configs.keller_segel import (
        KELLER_SEGEL_10_16 as cfg,
    )
    from distributedconvrl_pde_control_tpu.envs.features import rectangle_kernels_1d

    solver = KellerSegelSolver(nx=cfg.nx, lx=cfg.lx)
    sens = rectangle_kernels_1d(cfg.sensor_positions, cfg.nx, cfg.half_window)
    amat = sens[cfg.actuators_to_sensors].astype(np.float32)
    rng = np.random.default_rng(0)
    y = np.ones((2, cfg.nx), np.float32)
    y[1] *= 1.01
    y = jnp.asarray(y + 0.1 * rng.standard_normal((2, cfg.nx)).astype(np.float32))
    for _ in range(50):
        a = rng.uniform(-1, 1, amat.shape[0]).astype(np.float32)
        y = solver.step(y, jnp.asarray(cfg.agent_power * (a @ amat)), cfg.dt, 50)
    a = np.sign(rng.uniform(-1, 1, amat.shape[0])).astype(np.float32)
    f = jnp.asarray(cfg.agent_power * (a @ amat))
    oracle = np.asarray(solver.step(y, f, cfg.dt, 500))
    scale = np.abs(oracle).max()
    err10 = np.abs(np.asarray(solver.step(y, f, cfg.dt, 10)) - oracle).max() / scale
    err50 = np.abs(np.asarray(solver.step(y, f, cfg.dt, 50)) - oracle).max() / scale
    assert err10 < 1e-4, err10
    assert err10 < 3.0 * max(err50, 1e-6)  # same floor as the reference budget


def test_fast_oversampling_stable_under_saturated_actions():
    """Worst-case exploration regime (every actuator pinned to +-1 each
    step): the 10-substep tier stays finite over a half-episode horizon."""
    from distributedconvrl_pde_control_tpu.configs.keller_segel import (
        KELLER_SEGEL_10_16_FAST as cfg,
    )
    from distributedconvrl_pde_control_tpu.envs.features import rectangle_kernels_1d

    solver = KellerSegelSolver(nx=cfg.nx, lx=cfg.lx)
    sens = rectangle_kernels_1d(cfg.sensor_positions, cfg.nx, cfg.half_window)
    amat = sens[cfg.actuators_to_sensors].astype(np.float32)
    rng = np.random.default_rng(1)
    y = jnp.asarray(np.ones((2, cfg.nx), np.float32))
    for _ in range(600):
        a = np.sign(rng.uniform(-1, 1, amat.shape[0])).astype(np.float32)
        y = solver.step(y, jnp.asarray(cfg.agent_power * (a @ amat)), cfg.dt,
                        cfg.oversampling)
    assert bool(jnp.isfinite(y).all())


def test_shipped_popsearch_record_artifact():
    """The r05 recommended Keller-Segel controller
    (artifacts/KellerSegel_popsearch_pop8/member_00 — the fused schedule
    search's winning schedule, validated on the 4-unseen-init protocol at
    post |u-1| 0.006-0.014, RESULTS.md r05 table) regenerates its record
    regulation on an unseen init."""
    import os

    import jax
    import jax.numpy as jnp
    import pytest

    from distributedconvrl_pde_control_tpu.configs.keller_segel import (
        KELLER_SEGEL_10_16_FAST,
        build_keller_segel,
    )
    from distributedconvrl_pde_control_tpu.train import checkpoint
    from distributedconvrl_pde_control_tpu.train.eval import (
        actor_policy,
        rollout,
    )
    from distributedconvrl_pde_control_tpu.train.loop import init_train_state

    art = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "artifacts", "KellerSegel_popsearch_pop8", "member_00")
    if not os.path.exists(art):
        pytest.skip("artifact not present")
    setup = build_keller_segel(KELLER_SEGEL_10_16_FAST)
    tmpl = init_train_state(setup.env, setup.agent, jax.random.PRNGKey(0))
    ts, hook = checkpoint.load(art, tmpl)
    actor = hook.best_actor if hook.best_actor is not None else ts.agent.actor
    pol = actor_policy(setup.agent, jax.tree.map(jnp.asarray, actor))
    y0 = setup.random_init(jax.random.PRNGKey(8))
    tr = rollout(setup.env, pol, y0=y0, te=12.0, t_action=4.0)
    dev = np.abs(np.asarray(tr["y"])[:, 0] - 1.0)
    post = dev[-len(dev) // 10:].mean()
    assert post < 0.03, post  # measured 0.0064; uncontrolled holds ~0.50
