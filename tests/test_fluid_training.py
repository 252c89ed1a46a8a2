"""Fluid-family integration test at reduced scale.

The full Fluid_8 config (128^2 grid, 40 RK4 substeps) is too heavy for unit
tests; a 32^2 / 4x4-lattice variant exercises the identical code path:
real-state spectral solver, Taylor-vortex kernels, 2D window featurization,
reward-blow-up termination, DDPG learning, energy evaluation.
"""

import dataclasses

import jax
import numpy as np
import pytest

from distributedconvrl_pde_control_tpu.configs import FLUID_8
from distributedconvrl_pde_control_tpu.configs.fluid import build_fluid


@pytest.fixture(scope="module")
def small_fluid():
    cfg = dataclasses.replace(
        FLUID_8, name="Fluid_tiny", nx=32, sensors_per_axis=4, variance=0.08,
        te=0.6, dt=0.02, capacity=30_000, start_steps=3, update_after=3,
        update_loops=2, loops=2, no_steps=60,
        adaptive=False,  # the fixed-step path; adaptive has its own test
    )
    return build_fluid(cfg)


def test_fluid_training_learns_and_stays_finite(small_fluid):
    from distributedconvrl_pde_control_tpu.train.drivers import train

    ts, hook = train(small_fluid, verbose=False)
    assert len(hook.rewards) >= 4
    assert all(np.isfinite(hook.rewards))
    assert hook.best_actor is not None or all(r < 0 for r in hook.rewards)


def test_adaptive_stepper_inside_training_episode():
    """The reference's ACTUAL installed stepper — do_step2, adaptive RK4 at
    tol 1e0 (FluidSetup.jl:178-186,333) — runs inside the fused training
    episode (lax.while_loop under the episode scan) and learns finitely."""
    import jax.numpy as jnp

    from distributedconvrl_pde_control_tpu.train.loop import (
        init_train_state,
        make_episode_fn,
    )

    cfg = dataclasses.replace(
        FLUID_8, name="Fluid_tiny_adaptive", nx=16, sensors_per_axis=4,
        te=0.2, capacity=5_000, start_steps=2, update_after=2, update_loops=2,
    )
    assert cfg.adaptive  # the shipped presets default to do_step2
    setup = build_fluid(cfg)
    ts = init_train_state(setup.env, setup.agent, jax.random.PRNGKey(0))
    ep = make_episode_fn(setup.env, setup.agent, learning=True)
    ts, res = ep(ts, jnp.asarray(setup.env.y0))
    assert int(res.steps) == 10
    assert np.isfinite(float(res.reward_sum))
    assert int(ts.replay.size) == 10 * setup.agent.cfg.n_actuators


def test_fluid_energy_eval_baselines(small_fluid):
    from distributedconvrl_pde_control_tpu.agents.policies import NegatePolicy, ZeroPolicy
    from distributedconvrl_pde_control_tpu.train.eval import energy_eval

    env = small_fluid.env
    zero = ZeroPolicy(env.action_shape)
    res0 = energy_eval(env, zero, te=0.6)
    assert res0["energy"].shape[0] == env.max_steps
    assert np.isfinite(res0["energy"]).all()

    neg = NegatePolicy(env.action_shape, center_row=small_fluid.agent.cfg.ns // 2)
    resn = energy_eval(env, neg, te=0.6)
    assert np.isfinite(resn["energy"]).all()


def test_fluid_reward_blowup_terminates(small_fluid):
    import jax.numpy as jnp

    env = small_fluid.env
    st = env.reset()
    # inflate the field so sensor dots push |reward| past max_value=3
    st = st.replace(y=st.y * 1e4)
    st2 = env.step(st, jnp.zeros(env.action_shape, jnp.float32))
    assert bool(st2.done)


def test_error_detection_flags_corrupted_episode(small_fluid):
    """Blow-up episodes run the corrupted-field detector on the terminal
    field (PDEhook.jl:78-82 reads env.y directly)."""
    import jax.numpy as jnp

    from distributedconvrl_pde_control_tpu.train.hooks import PDEHook
    from distributedconvrl_pde_control_tpu.train.loop import EpisodeResult

    calls = []

    def detector(y):
        calls.append(y.shape)
        return True

    hook = PDEHook(min_best_episode=1, collect_best_trace=False, error_detection=detector)
    zero = jnp.zeros(())
    result = EpisodeResult(
        reward_sum=jnp.asarray(-5.0), steps=jnp.asarray(3), completed=jnp.asarray(False),
        step_rewards=zero, actor_loss=zero, critic_loss=zero,
        final_y=jnp.ones((8, 8)), y_trace=zero, action_trace=zero,
        forcing_trace=zero, reward_trace=zero,
    )
    hook.on_episode(result, small_fluid.agent.init_state(__import__("jax").random.PRNGKey(0)))
    assert hook.errored_episodes == [1]
    assert calls == [(8, 8)]
