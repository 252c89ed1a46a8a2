"""DP-sharded batched trainer (parallel/batched_dp.py) tests.

Run on the virtual 8-device CPU mesh (conftest). The contract under test:
DPBatchedTrainer is a drop-in for BatchedTrainer in train_batched — same
record layout, same hook semantics, gradients pmean'd over dp.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from distributedconvrl_pde_control_tpu.configs import KS22, build_ks
from distributedconvrl_pde_control_tpu.configs.ks import ks_random_init
from distributedconvrl_pde_control_tpu.parallel.batched_dp import (
    DPBatchedTrainer,
    dp_mesh,
)
from distributedconvrl_pde_control_tpu.train.batched import (
    BatchedTrainer,
    BatchedTrainerConfig,
    train_batched,
)


def _mk(n_envs, n_dp, **cfg_kw):
    setup = build_ks(KS22)
    cfg = BatchedTrainerConfig(n_envs=n_envs, batch_size=cfg_kw.pop("batch_size", 16),
                               update_loops=cfg_kw.pop("update_loops", 1), **cfg_kw)
    return DPBatchedTrainer(setup.env, setup.agent, cfg, dp_mesh(n_dp),
                            random_init=ks_random_init(KS22)), setup


def test_dp1_bitwise_matches_single_device():
    """On a 1-device dp mesh every collective is the identity, so a chunk of
    the sharded program started from the SAME state must reproduce the
    single-device trainer exactly (same RNG stream: the dp key leaf for
    device 0 is the single trainer's key)."""
    setup = build_ks(KS22)
    cfg = BatchedTrainerConfig(n_envs=4, batch_size=16, update_loops=1)
    single = BatchedTrainer(setup.env, setup.agent, cfg,
                            random_init=ks_random_init(KS22))
    dp = DPBatchedTrainer(setup.env, setup.agent, cfg, dp_mesh(1),
                          random_init=ks_random_init(KS22))
    assert dp.capacity_local == int(single.init(jax.random.PRNGKey(0)).replay.s.shape[1])

    ts0 = single.init(jax.random.PRNGKey(7))
    # deep-copy: device_put to a compatible sharding ALIASES buffers, and
    # both chunk fns donate their input
    ts_dp = dp.device_put(
        jax.tree.map(lambda x: jnp.array(x, copy=True),
                     ts0.replace(key=ts0.key[None])))

    ts1, recs1 = single.make_chunk_fn(12)(ts0)
    ts2, recs2 = dp.make_chunk_fn(12)(ts_dp)

    assert np.array_equal(np.asarray(recs1), np.asarray(recs2))
    for name in ("total_env_steps", "ep_count", "best_reward", "obs_flat"):
        assert np.array_equal(np.asarray(getattr(ts1, name)),
                              np.asarray(getattr(ts2, name))), name
    # params: the pmean all-reduce reorders the gradient-sum rounding even
    # at axis size 1 (measured ~5e-10 on bias leaves), so tight-allclose
    # rather than bitwise for the learner path
    a1 = jax.tree.leaves(jax.tree.map(np.asarray, ts1.agent.actor))
    a2 = jax.tree.leaves(jax.tree.map(np.asarray, ts2.agent.actor))
    for x, y in zip(a1, a2):
        assert np.allclose(x, y, atol=1e-7), np.abs(x - y).max()
    assert np.array_equal(np.asarray(ts1.replay.s), np.asarray(ts2.replay.s))


def test_dp4_global_accounting_and_learning():
    """4-way dp: records come back in the global (5, n_steps, n_envs)
    layout, env-step/episode counters are GLOBAL, and the pmean'd learner
    actually updates the (replicated) params."""
    trainer, _ = _mk(n_envs=8, n_dp=4)
    ts = trainer.init(jax.random.PRNGKey(0))
    actor0 = jax.tree.map(np.asarray, ts.agent.actor)
    fn = trainer.make_chunk_fn(30)
    ts, recs = fn(ts)
    recs = np.asarray(recs)
    assert recs.shape == (5, 30, 8)
    assert np.isfinite(recs).all()
    assert int(ts.total_env_steps) == 30 * 8  # global, not per-device
    # the learner gate opened (update_after * n_act transitions per shard
    # arrive within a few steps at 2 envs/shard) and params moved
    a1 = jax.tree.leaves(jax.tree.map(np.asarray, ts.agent.actor))
    assert any(not np.array_equal(x, y)
               for x, y in zip(jax.tree.leaves(actor0), a1))


def test_dp_trainer_runs_under_train_batched_driver():
    """The pipelined driver (train_batched) must run UNCHANGED on the DP
    trainer: hook accounting fed from global records, noise decay applied,
    device-best adopted, eval path working."""
    trainer, _ = _mk(n_envs=8, n_dp=4, batch_size=32)
    ts, hook, means = train_batched(trainer, total_steps=200, chunk_len=25,
                                    noise_decay_every=100, noise_decay=0.5,
                                    key=jax.random.PRNGKey(1))
    assert len(means) == 8 and np.isfinite(means).all()
    assert int(ts.total_env_steps) == 200 * 8
    # KS22 episodes are 160 steps: 8 envs finish at least once in 200 steps
    assert hook.ep > 1
    assert hook.best_actor is not None and np.isfinite(hook.bestreward)
    # noise decayed twice from the preset level
    from distributedconvrl_pde_control_tpu.configs import KS22 as _K
    assert float(ts.agent.act_noise) < _K.act_noise * 0.5 + 1e-6
    r_eval = trainer.eval_mean_reward(ts.agent.actor, 10)
    assert np.isfinite(r_eval)


def test_dp_best_tracking_is_global():
    """The best-episode candidate is pmax'd over dp: the adopted best
    reward must equal the best over ALL envs' completed episodes, not one
    shard's."""
    trainer, _ = _mk(n_envs=8, n_dp=4, update_loops=0)
    ts, hook, _ = train_batched(trainer, total_steps=170, chunk_len=17,
                                key=jax.random.PRNGKey(2))
    recs_best = hook.bestreward
    # recompute from the hook's own per-episode records (fed from the
    # global record stream): the device-tracked best must match
    assert hook.rewards, "episodes should have completed"
    assert np.isclose(recs_best, max(hook.rewards), atol=1e-5), (
        recs_best, max(hook.rewards))


def test_dp_trainer_with_spectral_carry():
    """The spectral-carry EnvState.carry leaves must shard over the dp mesh
    (the P('dp') pytree-prefix spec covers them) and survive the sharded
    auto-reset tree-select."""
    import dataclasses

    cfg = dataclasses.replace(KS22, stepper="etdrk4", fft_mode="native",
                              spectral_carry=True)
    setup = build_ks(cfg)
    trainer = DPBatchedTrainer(
        setup.env, setup.agent,
        BatchedTrainerConfig(n_envs=8, batch_size=16, update_loops=1),
        dp_mesh(4), random_init=ks_random_init(cfg))
    ts = trainer.init(jax.random.PRNGKey(0))
    assert ts.env_states.carry[0].shape == (8, cfg.nx // 2 + 1)
    fn = trainer.make_chunk_fn(170)  # crosses the 160-step episode boundary
    ts, recs = fn(ts)
    recs = np.asarray(recs)
    assert np.isfinite(recs).all()
    assert recs[0].sum() >= 8  # every env auto-reset at least once
    assert np.isfinite(np.asarray(ts.env_states.carry[0])).all()


def test_dp_eval_y0_pool_is_held_out():
    """The dp-sharded trainer's eval must honor `eval_y0_pool` exactly like
    the single-host trainer (r05: the CLI passes the held-out OOD pool on
    the mesh path too — without it --mesh --eval-warmup would score
    training-seen fields)."""
    setup = build_ks(KS22)
    gen = ks_random_init(KS22)
    train_pool = jnp.stack([gen(jax.random.PRNGKey(i)) for i in range(4)])
    eval_pool = jnp.stack([gen(jax.random.PRNGKey(100 + i)) for i in range(4)])
    cfg = BatchedTrainerConfig(n_envs=4, batch_size=8, update_loops=0)
    actor = setup.agent.init_state(jax.random.PRNGKey(5)).actor

    mesh = dp_mesh(2)
    t_held = DPBatchedTrainer(setup.env, setup.agent, cfg, mesh,
                              y0_pool=train_pool, eval_y0_pool=eval_pool)
    t_swap = DPBatchedTrainer(setup.env, setup.agent, cfg, mesh,
                              y0_pool=eval_pool)
    t_train = DPBatchedTrainer(setup.env, setup.agent, cfg, mesh,
                               y0_pool=train_pool)
    k = jax.random.PRNGKey(2)
    r_held = t_held.eval_mean_reward(actor, 10, key=k)
    assert r_held == t_swap.eval_mean_reward(actor, 10, key=k)
    assert r_held != t_train.eval_mean_reward(actor, 10, key=k)
