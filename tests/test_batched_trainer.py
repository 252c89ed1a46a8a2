"""Batched (vmapped) fused trainer tests."""

import jax
import numpy as np

from distributedconvrl_pde_control_tpu.configs import KS22, build_ks
from distributedconvrl_pde_control_tpu.configs.ks import ks_random_init
from distributedconvrl_pde_control_tpu.train.batched import (
    BatchedTrainer,
    BatchedTrainerConfig,
    train_batched,
)


def make_trainer(n_envs=16):
    setup = build_ks(KS22)
    return BatchedTrainer(
        setup.env, setup.agent,
        BatchedTrainerConfig(n_envs=n_envs, batch_size=64, update_loops=1),
        random_init=ks_random_init(KS22),
    )


def test_batched_training_beats_no_learning_baseline():
    """Same seed, same env stream: the learner must decisively beat the
    noise-only baseline (uncontrolled KS chaos sits near -0.28/step; a
    trained controller reaches ~-0.01)."""
    setup = build_ks(KS22)

    def run(learn):
        trainer = BatchedTrainer(
            setup.env, setup.agent,
            BatchedTrainerConfig(n_envs=16, batch_size=128,
                                 update_loops=4 if learn else 0),
            random_init=ks_random_init(KS22),
        )
        ts, means = train_batched(trainer, total_steps=1200, chunk_len=100,
                                  noise_decay_every=400, noise_decay=0.1,
                                  key=jax.random.PRNGKey(0))
        return ts, means

    _, base = run(False)
    ts, learned = run(True)
    assert np.isfinite(learned).all()
    assert learned[-3:].mean() > base[-3:].mean() + 0.1, (learned, base)
    assert int(ts.total_env_steps) == 1200 * 16


def test_batched_replay_fills_and_wraps():
    trainer = make_trainer(n_envs=4)
    ts, _ = train_batched(trainer, total_steps=100, chunk_len=20,
                          key=jax.random.PRNGKey(1))
    assert int(ts.replay.size) == 100 * 4 * 8  # steps * envs * actuators


def test_y0_pool_resets():
    import jax.numpy as jnp

    setup = build_ks(KS22)
    pool = np.stack([np.full(192, 0.1 * (i + 1), np.float32) for i in range(4)])
    trainer = BatchedTrainer(
        setup.env, setup.agent,
        BatchedTrainerConfig(n_envs=8, batch_size=32, update_loops=0),
        y0_pool=jnp.asarray(pool),
    )
    ts = trainer.init(jax.random.PRNGKey(0))
    y0s = np.asarray(ts.env_states.y)
    # every env's initial field is one of the pool entries
    for row in y0s:
        assert any(np.allclose(row, p) for p in pool)
