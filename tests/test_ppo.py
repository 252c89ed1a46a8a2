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


def test_ppo_long_horizon_eval_selection(tmp_path):
    """train_ppo(eval_every>0) selects best params on the DETERMINISTIC
    long-horizon eval (te-overridden env clone past the episode cap — the
    same semantics as BatchedTrainer._make_eval_fn), not the transient
    rollout mean; the selection trail round-trips the checkpoint."""
    from distributedconvrl_pde_control_tpu.train import checkpoint
    from distributedconvrl_pde_control_tpu.agents.ppo import train_ppo

    setup = build_ks(KS22)
    cfg = PPOConfig(ns=setup.agent.cfg.ns, na=1, rollout_len=25,
                    n_microbatches=8, n_epochs=2)
    agent = PPOAgent(cfg)
    trainer = PPOTrainer(setup.env, agent, n_envs=4,
                         random_init=ks_random_init(KS22))
    pstate, info = train_ppo(trainer, iters=4, key=jax.random.PRNGKey(0),
                             verbose=False, eval_every=2, eval_steps=200)
    assert info["selection"] == "eval"
    assert [i for i, _ in info["evals"]] == [2, 4]
    assert info["best_reward"] == max(r for _, r in info["evals"])
    assert info["best_params"] is not None
    # 200 > the 160-step KS22 episode cap: the te-overridden clone keeps
    # every step REAL (without the override the post-cap steps would all
    # be masked inactive and the eval would reproduce the transient)
    run = trainer._eval_fns[(200, 0)]
    rs, actives = run(agent._params(pstate),
                      trainer._y0s(jax.random.PRNGKey(0)))
    actives = np.asarray(actives)
    assert actives.shape == (200, 4)
    assert actives[180:].all(), "post-cap eval steps must stay active"
    checkpoint.save_ppo(str(tmp_path), pstate, info)
    _, info2 = checkpoint.load_ppo(
        str(tmp_path), agent.init_state(jax.random.PRNGKey(0)))
    assert info2["selection"] == "eval"
    assert info2["evals"] == [[i, r] for i, r in info["evals"]]


def test_ppo_checkpoint_roundtrip(tmp_path):
    from distributedconvrl_pde_control_tpu.train import checkpoint

    cfg = PPOConfig(ns=3, na=1)
    agent = PPOAgent(cfg)
    pstate = agent.init_state(jax.random.PRNGKey(3))
    info = {"rewards": np.asarray([-1.0, -0.5]), "best_reward": -0.5,
            "best_iter": 2, "best_params": jax.tree.map(np.asarray, agent._params(pstate))}
    checkpoint.save_ppo(str(tmp_path), pstate, info)
    pstate2, info2 = checkpoint.load_ppo(
        str(tmp_path), agent.init_state(jax.random.PRNGKey(0)))
    assert np.allclose(np.asarray(pstate.mu[0]["w"]), np.asarray(pstate2.mu[0]["w"]))
    assert info2["best_reward"] == -0.5 and info2["best_iter"] == 2
    got = info2["best_params"]
    assert np.allclose(np.asarray(got["trunk"][0]["w"]),
                       np.asarray(pstate.trunk[0]["w"]))


def test_shipped_ppo_artifact_stabilizes():
    """The committed KS22 PPO checkpoint reproduces stabilization through the
    deterministic mean policy (RESULTS.md PPO row)."""
    import os

    import pytest

    from distributedconvrl_pde_control_tpu.agents.ppo import ppo_policy
    from distributedconvrl_pde_control_tpu.train import checkpoint
    from distributedconvrl_pde_control_tpu.train.eval import rollout

    art = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "artifacts", "KS22_ppo")
    if not os.path.exists(os.path.join(art, "saves", "ppo.msgpack")):
        pytest.skip("artifact not present")
    setup = build_ks(KS22)
    cfg = PPOConfig(ns=setup.agent.cfg.ns, na=1, rollout_len=50,
                    n_microbatches=16, n_epochs=4, learning_rate=3e-4)
    agent = PPOAgent(cfg)
    pstate, info = checkpoint.load_ppo(art, agent.init_state(jax.random.PRNGKey(0)))
    policy = ppo_policy(agent, info.get("best_params") or agent._params(pstate))
    traces = rollout(setup.env, policy, te=60.0, t_action=30.0)
    y = traces["y"]
    pre = np.abs(y[200:300]).mean()
    post = np.abs(y[-60:]).mean()
    assert post < 0.15 * pre, (pre, post)


def test_shipped_keller_segel_ppo_artifact():
    """The committed Keller-Segel PPO checkpoint suppresses ~45% of the
    |u-1| deviation on an unseen random init (RESULTS.md PPO row) — between
    the original DDPG artifact (no better than uncontrolled OOD) and the
    fast-tier DDPG artifact (95-96%)."""
    import os

    import pytest

    from distributedconvrl_pde_control_tpu.agents.ppo import ppo_policy
    from distributedconvrl_pde_control_tpu.configs.keller_segel import (
        KELLER_SEGEL_10_16_FAST,
        build_keller_segel,
    )
    from distributedconvrl_pde_control_tpu.train import checkpoint
    from distributedconvrl_pde_control_tpu.train.eval import rollout

    art = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "artifacts", "KellerSegel10_16_ppo")
    if not os.path.exists(os.path.join(art, "saves", "ppo.msgpack")):
        pytest.skip("artifact not present")
    setup = build_keller_segel(KELLER_SEGEL_10_16_FAST)
    cfg = PPOConfig(ns=setup.agent.cfg.ns, na=setup.agent.cfg.na_rows,
                    rollout_len=50, n_microbatches=16, n_epochs=4,
                    learning_rate=3e-4)
    agent = PPOAgent(cfg)
    pstate, info = checkpoint.load_ppo(art, agent.init_state(jax.random.PRNGKey(0)))
    policy = ppo_policy(agent, info.get("best_params") or agent._params(pstate))
    y0 = setup.random_init(jax.random.PRNGKey(7))
    traces = rollout(setup.env, policy, y0=y0, te=12.0, t_action=6.0)
    dev = np.abs(traces["y"][:, 0] - 1.0)
    act_start = int(round(6.0 / setup.env.dt))
    pre = dev[max(0, act_start - 100):act_start].mean()
    post = dev[-dev.shape[0] // 10:].mean()
    # uncontrolled holds |u-1| ~ 0.5 over the window; require a real cut
    assert post < 0.35, (pre, post)
    assert post < 0.7 * pre, (pre, post)


def test_shipped_ppo_ref_protocol_artifact_stabilizes():
    """The r04 reference-exact-protocol PPO checkpoint (artifacts/
    KS22_ppo_ref, trained via `--ppo --ppo-ref` = PPOConfig factory
    defaults, PDEagent.jl:462-512) reproduces stabilization — RESULTS.md
    records it at 0.24% suppression, beating the tuned light config."""
    import os

    import pytest

    from distributedconvrl_pde_control_tpu.agents.ppo import ppo_policy
    from distributedconvrl_pde_control_tpu.train import checkpoint
    from distributedconvrl_pde_control_tpu.train.eval import rollout

    art = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "artifacts", "KS22_ppo_ref")
    if not os.path.exists(os.path.join(art, "saves", "ppo.msgpack")):
        pytest.skip("artifact not present")
    setup = build_ks(KS22)
    agent = PPOAgent(PPOConfig(ns=setup.agent.cfg.ns, na=1))  # factory defaults
    pstate, info = checkpoint.load_ppo(art, agent.init_state(jax.random.PRNGKey(0)))
    policy = ppo_policy(agent, info.get("best_params") or agent._params(pstate))
    traces = rollout(setup.env, policy, te=60.0, t_action=30.0)
    y = traces["y"]
    pre = np.abs(y[200:300]).mean()
    post = np.abs(y[-60:]).mean()
    assert post < 0.1 * pre, (pre, post)


def test_shipped_lh_selected_ppo_artifacts_stabilize():
    """The r05 long-horizon-eval-selected PPO checkpoints (RESULTS.md
    round-5 PPO rows): the ref-protocol artifact lands on the KS22
    actuation-authority floor and the tuned-config artifact close behind;
    both carry the eval-selection trail in their checkpoint meta."""
    import os

    import pytest

    from distributedconvrl_pde_control_tpu.agents.ppo import ppo_policy
    from distributedconvrl_pde_control_tpu.train import checkpoint
    from distributedconvrl_pde_control_tpu.train.eval import rollout

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    setup = build_ks(KS22)
    for name, pcfg in [
        ("KS22_ppo_ref_lh", PPOConfig(ns=setup.agent.cfg.ns, na=1)),
        ("KS22_ppo_lh", PPOConfig(ns=setup.agent.cfg.ns, na=1, rollout_len=50,
                                  n_microbatches=16, n_epochs=4,
                                  learning_rate=3e-4)),
    ]:
        art = os.path.join(root, "artifacts", name)
        if not os.path.exists(os.path.join(art, "saves", "ppo.msgpack")):
            pytest.skip("artifact not present")
        agent = PPOAgent(pcfg)
        pstate, info = checkpoint.load_ppo(
            art, agent.init_state(jax.random.PRNGKey(0)))
        assert info["selection"] == "eval", name
        assert len(info["evals"]) >= 10, name
        assert info["best_reward"] == max(r for _, r in info["evals"]), name
        policy = ppo_policy(agent,
                            info.get("best_params") or agent._params(pstate))
        traces = rollout(setup.env, policy, te=60.0, t_action=30.0)
        y = traces["y"]
        pre = np.abs(y[200:300]).mean()
        post = np.abs(y[-60:]).mean()
        assert post < 0.05 * pre, (name, pre, post)

def test_ppo_eval_warmup_matches_delayed_actuation_rollout():
    """PPO's OOD eval (r05): warmup_steps=K must equal the independent
    delayed-actuation rollout path (train/eval.rollout with t_action) —
    mean-policy actions, K uncontrolled steps, controlled segment scored."""
    from distributedconvrl_pde_control_tpu.train.eval import rollout

    setup = build_ks(KS22)
    env = setup.env
    cfg = PPOConfig(ns=setup.agent.cfg.ns, na=1)
    agent = PPOAgent(cfg)
    y0 = np.asarray(ks_random_init(KS22)(jax.random.PRNGKey(3)))
    trainer = PPOTrainer(env, agent, n_envs=1,
                         y0_pool=jnp.asarray(y0)[None])
    params = agent._params(agent.init_state(jax.random.PRNGKey(5)))
    K, n = 6, 11
    r_eval = trainer.eval_mean_reward(params, n, key=jax.random.PRNGKey(0),
                                      warmup_steps=K)

    def pol(obs, key):
        mu, _ = agent.dist(params, obs)
        return jnp.clip(mu, -cfg.act_limit, cfg.act_limit)

    tr = rollout(env, pol, y0=y0, te=float(env.t0 + (n + K) * env.dt),
                 t_action=float(env.t0 + K * env.dt))
    rs = np.asarray(tr["reward"]).mean(axis=-1)[K:]
    act = np.asarray(tr["active"])[K:]
    r_ref = float(rs[act].mean())
    assert np.isfinite(r_eval) and abs(r_eval - r_ref) < 1e-5, (r_eval, r_ref)


def test_ppo_eval_y0_pool_is_held_out():
    """PPO analogue of BatchedTrainer's held-out eval pool (r05): with
    `eval_y0_pool` set the deterministic eval scores those ICs — equal to a
    pool-swapped trainer's eval, different from the training-pool eval.
    Without it a pool-based (fluid-style) PPO trainer would select on
    training-seen fields."""
    setup = build_ks(KS22)
    gen = ks_random_init(KS22)
    train_pool = jnp.stack([gen(jax.random.PRNGKey(i)) for i in range(4)])
    eval_pool = jnp.stack([gen(jax.random.PRNGKey(100 + i)) for i in range(4)])
    pcfg = PPOConfig(ns=setup.agent.cfg.ns, na=setup.agent.cfg.na_rows)
    pagent = PPOAgent(pcfg)
    params = pagent._params(pagent.init_state(jax.random.PRNGKey(5)))

    t_held = PPOTrainer(setup.env, pagent, n_envs=4, y0_pool=train_pool,
                        eval_y0_pool=eval_pool)
    t_swap = PPOTrainer(setup.env, pagent, n_envs=4, y0_pool=eval_pool)
    t_train = PPOTrainer(setup.env, pagent, n_envs=4, y0_pool=train_pool)
    k = jax.random.PRNGKey(2)
    r_held = t_held.eval_mean_reward(params, 10, key=k)
    assert r_held == t_swap.eval_mean_reward(params, 10, key=k)
    assert r_held != t_train.eval_mean_reward(params, 10, key=k)
