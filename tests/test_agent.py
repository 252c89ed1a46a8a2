"""DDPG agent unit tests: replay indexing, learn-step math, polyak, noise."""

import jax
import jax.numpy as jnp
import numpy as np

from distributedconvrl_pde_control_tpu.agents.ddpg import DDPGAgent, DDPGConfig
from distributedconvrl_pde_control_tpu.agents.replay import (
    replay_init,
    replay_push_columns,
    replay_sample,
)
from distributedconvrl_pde_control_tpu.models.mlp import apply_chain


def small_agent(**kw):
    cfg = DDPGConfig(ns=3, na_rows=1, n_actuators=4, nna_scale=1.0, nna_scale_critic=1.0,
                     batch_size=8, capacity=64, **kw)
    return DDPGAgent(cfg)


def test_replay_push_and_next_state_semantics():
    rb = replay_init(capacity=32, ns=2, na=1)
    # 3 steps of 4-actuator pushes
    for step in range(3):
        s = jnp.full((2, 4), float(step))
        sn = jnp.full((2, 4), float(step + 1))
        a = jnp.full((1, 4), 10.0 + step)
        r = jnp.arange(4, dtype=jnp.float32) + 100 * step
        rb = replay_push_columns(rb, s, a, r, jnp.asarray(step == 2), sn)
    assert int(rb.size) == 12
    # stored next-state equals what the reference's idx+n_actuators slot
    # arithmetic dereferences: s of the following step
    assert np.allclose(np.asarray(rb.s[:, 4]), 1.0)  # step-1 state
    assert np.allclose(np.asarray(rb.sn[:, 4]), 2.0)  # step-2 state
    assert np.asarray(rb.t)[:8].sum() == 0 and np.asarray(rb.t)[8:12].sum() == 4


def test_replay_wraparound_and_sampling_excludes_newest():
    rb = replay_init(capacity=8, ns=1, na=1)
    for step in range(5):  # 10 entries through a capacity-8 ring
        s = jnp.full((1, 2), float(step))
        rb = replay_push_columns(
            rb, s, s, jnp.full((2,), float(step)), jnp.asarray(False), s + 1
        )
    assert int(rb.size) == 8
    assert int(rb.ptr) == 2
    key = jax.random.PRNGKey(0)
    s, a, r, t, sn = replay_sample(rb, key, 256, exclude_newest=2)
    # newest two entries hold reward 4.0; they must never be sampled
    assert (np.asarray(r) != 4.0).all()
    # oldest surviving entries (reward 1.0, step 0 overwritten) present
    assert set(np.unique(np.asarray(r))) <= {1.0, 2.0, 3.0}


def test_learn_step_matches_manual_math():
    agent = small_agent()
    astate = agent.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    B = agent.cfg.batch_size
    s = jnp.asarray(rng.standard_normal((3, B)), jnp.float32)
    a = jnp.asarray(rng.standard_normal((1, B)), jnp.float32)
    r = jnp.asarray(rng.standard_normal(B), jnp.float32)
    t = jnp.asarray([0, 1, 0, 0, 1, 0, 0, 0], jnp.float32)
    sn = jnp.asarray(rng.standard_normal((3, B)), jnp.float32)

    # manual target computation with the pre-update params
    a_next = agent.actor_apply(astate.target_actor, sn)
    q_t = agent.critic_apply(astate.target_critic, sn, a_next).reshape(-1)
    q_target = np.asarray(r + agent.cfg.gamma * (1 - t) * q_t)
    q_pred = np.asarray(agent.critic_apply(astate.critic, s, a).reshape(-1))
    want_critic_loss = np.mean((q_target - q_pred) ** 2)

    new = agent.learn_batch(astate, (s, a, r, t, sn))
    assert np.isclose(float(new.critic_loss), want_critic_loss, rtol=1e-5)

    # polyak: target' = p*target + (1-p)*behavior'
    p = agent.cfg.polyak
    w_new = np.asarray(new.actor[0]["w"])
    tw = np.asarray(astate.target_actor[0]["w"])
    assert np.allclose(np.asarray(new.target_actor[0]["w"]), p * tw + (1 - p) * w_new, atol=1e-6)
    # behavior nets actually moved
    assert not np.allclose(w_new, np.asarray(astate.actor[0]["w"]))


def test_targets_start_synced():
    agent = small_agent()
    astate = agent.init_state(jax.random.PRNGKey(3))
    for b, t in zip(astate.actor, astate.target_actor):
        assert np.allclose(np.asarray(b["w"]), np.asarray(t["w"]))


def test_act_noise_and_warmup():
    agent = small_agent(start_steps=5, act_noise=0.5, start_policy="zero")
    astate = agent.init_state(jax.random.PRNGKey(1))
    obs = jnp.ones((3, 4), jnp.float32)
    # warmup: update_step (0) <= start_steps -> zero action
    act = agent.act(astate, obs, jax.random.PRNGKey(2), learning=True)
    assert np.allclose(np.asarray(act), 0.0)
    # past warmup: noisy, clamped
    astate = astate.replace(update_step=jnp.asarray(10, jnp.int32))
    act = agent.act(astate, obs, jax.random.PRNGKey(2), learning=True)
    clean = agent.act(astate, obs, jax.random.PRNGKey(2), learning=False)
    assert np.abs(np.asarray(act)).max() <= 1.0
    assert not np.allclose(np.asarray(act), np.asarray(clean))
    # eval mode ignores warmup and noise
    astate = astate.replace(update_step=jnp.asarray(0, jnp.int32))
    act_eval = agent.act(astate, obs, jax.random.PRNGKey(4), learning=False)
    assert not np.allclose(np.asarray(act_eval), 0.0)


def test_memory_rows_get_no_noise():
    cfg = DDPGConfig(ns=3, na_rows=3, n_actuators=4, memory_size=2, nna_scale=1.0,
                     start_steps=-1, act_noise=5.0, capacity=16)
    agent = DDPGAgent(cfg)
    astate = agent.init_state(jax.random.PRNGKey(0))
    obs = jnp.ones((3, 4), jnp.float32)
    noisy = agent.act(astate, obs, jax.random.PRNGKey(7), learning=True)
    clean = agent.act(astate, obs, jax.random.PRNGKey(8), learning=False)
    # last memory_size rows identical (no exploration noise, PDEagent.jl:201)
    assert np.allclose(np.asarray(noisy)[1:], np.asarray(clean)[1:])


def test_actor_shared_weights_translation_invariance():
    # the "convolutional" property: permuting actuator columns permutes the
    # actions identically (weight sharing over the actuator batch axis)
    agent = small_agent()
    astate = agent.init_state(jax.random.PRNGKey(0))
    obs = jnp.asarray(np.random.default_rng(0).standard_normal((3, 4)), jnp.float32)
    perm = np.asarray([2, 0, 3, 1])
    out = agent.actor_apply(astate.actor, obs)
    out_perm = agent.actor_apply(astate.actor, obs[:, perm])
    assert np.allclose(np.asarray(out)[:, perm], np.asarray(out_perm), atol=1e-6)


def test_negate_policy_modes():
    from distributedconvrl_pde_control_tpu.agents.policies import NegatePolicy

    obs = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4) / 20.0)
    pol = NegatePolicy(action_shape=(1, 4), center_row=1)
    act = np.asarray(pol(obs))
    assert np.allclose(act, -np.asarray(obs)[1].reshape(1, 4))
    # faithful mode: Julia column-major linear walk (FluidSetup.jl:292-295)
    pol_f = NegatePolicy(action_shape=(1, 4), center_row=1, faithful=True)
    act_f = np.asarray(pol_f(obs))
    want = -np.asarray(obs).T.reshape(-1)[:4].reshape(4, 1).T
    assert np.allclose(act_f, want)


def test_replay_push_flat_fast_path_matches_scatter_semantics():
    """Contiguous dynamic-slice pushes (capacity % n == 0) must be
    byte-identical in effect to the general scatter path, including wrap."""
    import jax.numpy as jnp

    from distributedconvrl_pde_control_tpu.agents.replay import (
        replay_init,
        replay_push_flat,
    )

    def fill(capacity, n, rounds):
        rb = replay_init(capacity, 2, 1)
        for k in range(rounds):
            base = float(k)
            s = jnp.full((2, n), base)
            a = jnp.full((1, n), base + 0.1)
            r = jnp.full((n,), base + 0.2)
            t = jnp.zeros((n,))
            sn = jnp.full((2, n), base + 0.3)
            rb = replay_push_flat(rb, s, a, r, t, sn)
        return rb

    # fast path: capacity 8, width 4, 5 pushes -> slots hold pushes 3,4
    rb = fill(8, 4, 5)
    assert int(rb.ptr) == 4 and int(rb.size) == 8
    assert np.allclose(np.asarray(rb.r[:4]), 4.2)  # newest block wrapped to front
    assert np.allclose(np.asarray(rb.r[4:]), 3.2)

    # fallback path: capacity 10, width 3 (non-dividing) wraps mid-block
    rb = fill(10, 3, 4)  # 12 entries into 10 slots
    assert int(rb.ptr) == 2 and int(rb.size) == 10
    r = np.asarray(rb.r)
    assert np.allclose(r[0], 3.2) and np.allclose(r[1], 3.2)  # push 3 wrapped
    assert np.allclose(r[9], 3.2)
    assert np.allclose(r[2], 0.2)  # oldest surviving entry is push 0's tail
