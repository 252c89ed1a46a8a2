"""PPO variant tests: math units + a short KS training iteration."""

import jax
import jax.numpy as jnp
import numpy as np

from distributedconvrl_pde_control_tpu.agents.ppo import PPOAgent, PPOConfig, PPOTrainer
from distributedconvrl_pde_control_tpu.configs import KS22, build_ks
from distributedconvrl_pde_control_tpu.configs.ks import ks_random_init


def test_gae_matches_reference_recursion():
    cfg = PPOConfig(ns=2, na=1, gamma=0.9, gae_lambda=0.8)
    agent = PPOAgent(cfg)
    T, B = 5, 2
    rng = np.random.default_rng(0)
    r = rng.standard_normal((T, B)).astype(np.float32)
    v = rng.standard_normal((T, B)).astype(np.float32)
    d = np.zeros((T, B), np.float32)
    d[2, 0] = 1.0
    last_v = rng.standard_normal(B).astype(np.float32)

    adv, ret = agent.gae(jnp.asarray(r), jnp.asarray(v), jnp.asarray(d), jnp.asarray(last_v))

    want = np.zeros((T, B))
    next_adv = np.zeros(B)
    next_v = last_v
    for t in reversed(range(T)):
        mask = 1 - d[t]
        delta = r[t] + 0.9 * next_v * mask - v[t]
        next_adv = delta + 0.9 * 0.8 * mask * next_adv
        next_v = v[t]
        want[t] = next_adv
    assert np.allclose(np.asarray(adv), want, atol=1e-5)
    assert np.allclose(np.asarray(ret), want + v, atol=1e-5)


def test_gaussian_logp():
    cfg = PPOConfig(ns=2, na=3)
    agent = PPOAgent(cfg)
    mu = jnp.zeros((3, 4))
    sig = jnp.ones((3, 4))
    a = jnp.zeros((3, 4))
    lp = np.asarray(agent._logp(mu, sig, a))
    want = 3 * (-0.5 * np.log(2 * np.pi))
    assert np.allclose(lp, want, atol=1e-5)


def test_ppo_trains_on_ks():
    setup = build_ks(KS22)
    cfg = PPOConfig(ns=setup.agent.cfg.ns, na=1, rollout_len=25, n_microbatches=8,
                    n_epochs=2)
    agent = PPOAgent(cfg)
    trainer = PPOTrainer(setup.env, agent, n_envs=4, random_init=ks_random_init(KS22))
    it = trainer.make_train_iter()
    pstate = agent.init_state(jax.random.PRNGKey(0))
    rewards = []
    key = jax.random.PRNGKey(1)
    for i in range(3):
        key, k = jax.random.split(key)
        pstate, mean_r = it(pstate, k)
        rewards.append(float(mean_r))
    assert all(np.isfinite(rewards)), rewards
    # params moved and stayed finite
    assert int(pstate.update_count) == 3
    for layer in pstate.mu:
        assert np.isfinite(np.asarray(layer["w"])).all()


def test_ppo_converges_on_ks():
    """PPO actually learns the KS controller (reward improves decisively)."""
    setup = build_ks(KS22)
    cfg = PPOConfig(ns=setup.agent.cfg.ns, na=1, rollout_len=50, n_microbatches=16,
                    n_epochs=4, learning_rate=3e-4)
    agent = PPOAgent(cfg)
    trainer = PPOTrainer(setup.env, agent, n_envs=8, random_init=ks_random_init(KS22))
    it = trainer.make_train_iter()
    pstate = agent.init_state(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    rews = []
    for _ in range(25):
        key, k = jax.random.split(key)
        pstate, r = it(pstate, k)
        rews.append(float(r))
    rews = np.asarray(rews)
    assert rews[-5:].mean() > rews[:5].mean() + 0.05, rews
