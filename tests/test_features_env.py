"""Featurizer and environment semantics tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from distributedconvrl_pde_control_tpu.configs import KS22, build_ks
from distributedconvrl_pde_control_tpu.envs.features import (
    Conv1DFeaturizer,
    Conv2DFeaturizer,
    TwoFieldFeaturizer,
    gaussian_kernels_1d,
    rectangle_kernels_1d,
)


def test_gaussian_kernels_periodic_wrap_and_norm():
    k = gaussian_kernels_1d([1], nx=64, lx=22.0, sigma=0.7, norm_mode=1)
    assert k.shape == (1, 64)
    assert np.isclose(k.sum(), 1.0, atol=1e-6)
    # kernel centered at left edge must wrap: mass at both ends
    assert k[0, -1] > 1e-4 and k[0, 0] > 1e-4
    k2 = gaussian_kernels_1d([32], nx=64, lx=22.0, sigma=0.7, norm_mode=2)
    assert np.isclose(k2.max(), 1.0, atol=1e-6)


def test_rectangle_kernels():
    k = rectangle_kernels_1d([3, 8], nx=20, half_window=2)
    assert np.allclose(np.nonzero(k[0])[0], [0, 1, 2, 3, 4])
    assert np.allclose(np.nonzero(k[1])[0], [5, 6, 7, 8, 9])
    assert k.sum() == 10


def test_conv1d_window_neighbor_semantics():
    # 4 sensors on 8 cells, identity-ish kernels to track exact values
    sm = jnp.asarray(np.eye(4, 8, dtype=np.float32) * 2.0)
    f = Conv1DFeaturizer(sensor_matrix=sm, actuators_to_sensors=np.arange(4), scale=0.5,
                         window_size=3)
    y = jnp.asarray(np.arange(8, dtype=np.float32))
    obs = np.asarray(f(y))
    sensors = np.arange(4.0)  # 2*y[i]*0.5
    # rows: roll(+(-1)), center, roll(+1) -> [s[i+1], s[i], s[i-1]] per column
    assert np.allclose(obs[1], sensors)
    assert np.allclose(obs[0], np.roll(sensors, -1))
    assert np.allclose(obs[2], np.roll(sensors, 1))


def test_temporal_stacking_shifts_history():
    sm = jnp.asarray(np.eye(2, 4, dtype=np.float32))
    f = Conv1DFeaturizer(sensor_matrix=sm, actuators_to_sensors=np.arange(2), scale=1.0,
                         window_size=1, temporal_steps=3)
    y1 = jnp.asarray([1.0, 2.0, 0, 0])
    y2 = jnp.asarray([3.0, 4.0, 0, 0])
    obs0 = f(y1)  # init: tiled
    assert obs0.shape == (3, 2)
    assert np.allclose(np.asarray(obs0), [[1, 2]] * 3)
    obs1 = f(y2, obs0, jnp.zeros((1, 2)))
    # newest on top, history shifted down (KSSetup.jl:209-217)
    assert np.allclose(np.asarray(obs1), [[3, 4], [1, 2], [1, 2]])


def test_memory_rows_carry_action():
    sm = jnp.asarray(np.eye(2, 4, dtype=np.float32))
    f = Conv1DFeaturizer(sensor_matrix=sm, actuators_to_sensors=np.arange(2), scale=1.0,
                         window_size=1, memory_size=1)
    obs0 = f(jnp.zeros(4))
    assert obs0.shape == (2, 2)
    action = jnp.asarray([[0.5, -0.5], [0.9, -0.9]])  # (1+memory, n_act)
    obs1 = f(jnp.zeros(4), obs0, action)
    assert np.allclose(np.asarray(obs1)[1], [0.9, -0.9])  # last action row


def test_conv2d_window_flattening_order():
    spa = 3
    vals = np.arange(spa * spa, dtype=np.float32)
    from distributedconvrl_pde_control_tpu.envs.features import _window_stack_2d

    S = jnp.asarray(vals.reshape(spa, spa))
    w = np.asarray(_window_stack_2d(S, 3))
    assert w.shape == (9, 9)
    # center row (i=0, j=0) is the unshifted row-major flatten
    assert np.allclose(w[4], vals)
    # first row is roll((-1,-1)) flattened
    assert np.allclose(w[0], np.roll(vals.reshape(spa, spa), (-1, -1), (0, 1)).reshape(-1))


def test_ks_env_step_and_blowup_termination():
    setup = build_ks(KS22)
    env = setup.env
    state = env.reset()
    assert state.obs.shape == (1, 8)
    action = jnp.zeros((1, 8), jnp.float32)
    s1 = env.step(state, action)
    assert int(s1.steps) == 1 and not bool(s1.done)
    assert np.all(np.isfinite(np.asarray(s1.y)))
    # blow-up: fields beyond max_value terminate immediately
    big = state.replace(y=jnp.full((192,), 100.0, jnp.float32))
    s2 = env.step(big, action)
    assert bool(s2.done)


def test_ks_env_reward_matches_formula():
    setup = build_ks(KS22)
    env = setup.env
    state = env.reset()
    action = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (1, 8)), jnp.float32)
    s1 = env.step(state, action)
    # recompute by hand from the new field
    from distributedconvrl_pde_control_tpu.envs.features import gaussian_kernels_1d

    g = gaussian_kernels_1d(KS22.sensor_positions, KS22.nx, KS22.lx, KS22.sigma_sensors, 1)
    y = np.asarray(s1.y)
    dots = np.abs(g @ (y * 6.0)) ** 1.3 / (30.0 * 3.0)
    a = np.asarray(action)[0]
    want = -np.abs(dots) - 0.002 * a**2 - 0.002 * a**2  # delta == action (from zero)
    assert np.allclose(np.asarray(s1.reward), want, atol=1e-4)


def test_zero_shot_transfer_obs_dim_invariance():
    """KS500 transfer property (KS500.jl:21-24): the actor input dim depends
    only on the local window, never on the domain size."""
    from distributedconvrl_pde_control_tpu.configs import KS200, KS500, build_ks as b

    s200, s500 = b(KS200), b(KS500)
    assert s200.agent.cfg.ns == s500.agent.cfg.ns
    assert s200.agent.cfg.na_rows == s500.agent.cfg.na_rows
    # a KS200-shaped actor evaluates on the KS500 env unchanged
    astate = s200.agent.init_state(jax.random.PRNGKey(0))
    obs500 = s500.env.reset().obs
    out = s500.agent.actor_apply(astate.actor, obs500)
    assert out.shape == (1, 200)


def test_two_field_sees_action():
    from distributedconvrl_pde_control_tpu.envs.features import TwoFieldFeaturizer

    sm = jnp.asarray(np.eye(3, 10, dtype=np.float32))
    f = TwoFieldFeaturizer(sensor_matrix=sm, actuators_to_sensors=np.arange(3),
                           scale=1.0, window_size=1, temporal_steps=2,
                           sees_action=True, action_rows=1)
    y = jnp.asarray(np.random.default_rng(0).standard_normal((2, 10)), jnp.float32)
    obs0 = f(y)
    # base = 2 field rows + 1 action row, then x2 temporal
    assert obs0.shape == (6, 3)
    assert np.allclose(np.asarray(obs0)[2], 0.0)  # zero action at init
    action = jnp.asarray([[0.3, -0.3, 0.1]])
    obs1 = f(y, obs0, action)
    assert np.allclose(np.asarray(obs1)[2], [0.3, -0.3, 0.1])


def test_abs_conv2d_featurizer():
    from distributedconvrl_pde_control_tpu.envs.features import AbsConv2DFeaturizer

    spa = 3
    n = spa * spa
    sm = jnp.asarray(np.eye(n, 4 * n, dtype=np.float32))  # pick out first n cells
    f = AbsConv2DFeaturizer(sensor_matrix=sm, actuators_to_sensors=np.arange(n),
                            sensors_per_axis=spa, scale=1.0, window_size=1)
    y = jnp.asarray(np.arange(-18, 18, dtype=np.float32).reshape(6, 6) / 6.0)
    obs = np.asarray(f(y))
    assert obs.shape == (2, n)
    flat = np.asarray(y).reshape(-1)
    assert np.allclose(obs[0], flat[:n])          # signed channel
    assert np.allclose(obs[1], np.abs(flat)[:n])  # |field| channel


def test_create_default_y0():
    from distributedconvrl_pde_control_tpu.envs.pde_env import create_default_y0

    y0 = np.asarray(create_default_y0((10, 20)))
    # reference semantics (PDEenv.jl:8-24): 1.0 where EVERY index is within
    # the first 40% of its axis
    assert y0[0, 0] == 1.0 and y0[3, 7] == 1.0
    assert y0[4, 0] == 0.0 and y0[0, 8] == 0.0
    assert y0.sum() == 4 * 8
