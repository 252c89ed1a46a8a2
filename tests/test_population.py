"""Population trainer (train/population.py): P runs fused into one flat
program — members live in the env axis, only the networks are vmapped.

Isolation contract: member p's policy sees only its own columns, learns
only from its own replay region, and updates only its own Adam row.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from distributedconvrl_pde_control_tpu.agents.replay import Replay
from distributedconvrl_pde_control_tpu.configs.ks import KS22, build_ks
from distributedconvrl_pde_control_tpu.models.mlp import apply_chain
from distributedconvrl_pde_control_tpu.train.batched import (
    BatchedTrainer,
    BatchedTrainerConfig,
)
from distributedconvrl_pde_control_tpu.train.population import (
    PopulationTrainer,
    member_slot_indices,
    save_population,
    train_population,
)

CFG = dataclasses.replace(KS22, stepper="etdrk4", fft_mode="native")
TCFG = BatchedTrainerConfig(n_envs=4, batch_size=16, update_loops=1)


def _pool(setup, n=8):
    keys = jax.random.split(jax.random.PRNGKey(99), n)
    return jnp.stack([jnp.asarray(setup.random_init(k)) for k in keys])


def _pop(n_members=2, cfg=CFG, tcfg=TCFG, **kw):
    setup = build_ks(cfg)
    return PopulationTrainer(setup.env, setup.agent, tcfg, n_members,
                             y0_pool=_pool(setup), **kw)


def test_member_slot_indices_stay_in_member_regions():
    """The replay slot arithmetic: member p samples ONLY slots whose
    within-push offset falls in p's block — across keys and fill levels."""
    P, block = 3, 8 * 4  # e.g. 8 envs x 4 actuators per member
    push = P * block
    for n_chunks in (1, 7, 50):
        idx = np.asarray(member_slot_indices(
            jax.random.PRNGKey(n_chunks), n_chunks, P, block, 256))
        assert idx.shape == (P, 256)
        assert (idx >= 0).all() and (idx < n_chunks * push).all()
        owners = (idx % push) // block
        assert (owners == np.arange(P)[:, None]).all()


def test_population_sample_provenance():
    """End-to-end provenance: stamp every replay slot with its member id
    and check each member's sampled batch contains only its own rows —
    on BOTH gather paths (capacity 960: plain lane gather; capacity 1920 =
    lcm(push,128)*5: the 128-block fast path)."""
    pop = _pop(n_members=3)
    agent = pop.agent
    push = 3 * agent.block
    for capacity in (10 * push, 20 * push):
        assert (capacity % 128 == 0) == (capacity == 20 * push)
        slots = np.arange(capacity)
        owner = (slots % push) // agent.block
        rb = Replay(
            s=jnp.asarray(owner[None, :], jnp.float32),
            a=jnp.asarray(owner[None, :], jnp.float32),
            r=jnp.asarray(owner, jnp.float32),
            t=jnp.zeros((capacity,), jnp.float32),
            sn=jnp.asarray(owner[None, :], jnp.float32),
            ptr=jnp.asarray(0, jnp.int32),
            size=jnp.asarray(capacity, jnp.int32),
        )
        s, a, r, t, sn = agent.sample(rb, jax.random.PRNGKey(0), 64)
        assert s.shape == (3, 1, 64) and r.shape == (3, 64)
        for p in range(3):
            assert (np.asarray(r[p]) == p).all()
            assert (np.asarray(s[p]) == p).all()
            assert (np.asarray(sn[p]) == p).all()


def test_population_sample_fast_path_matches_plain():
    """The 128-block member gather returns the identical batch as the plain
    gather for the same key (same slot indices, same values)."""
    pop = _pop(n_members=2)
    agent = pop.agent
    push = 2 * agent.block
    capacity = (128 * push) // np.gcd(128, push) * 3  # multiple of both
    rng = np.random.default_rng(0)
    vals = rng.normal(size=capacity).astype(np.float32)
    rb = Replay(
        s=jnp.asarray(vals[None, :]), a=jnp.asarray(vals[None, :] * 2),
        r=jnp.asarray(vals * 3), t=jnp.asarray((vals > 0).astype(np.float32)),
        sn=jnp.asarray(vals[None, :] * 5),
        ptr=jnp.asarray(0, jnp.int32), size=jnp.asarray(capacity, jnp.int32))
    fast = agent.sample(rb, jax.random.PRNGKey(4), 32)
    idx = np.asarray(member_slot_indices(
        jax.random.PRNGKey(4), capacity // push, 2, agent.block, 32))
    np.testing.assert_allclose(np.asarray(fast[2]), vals[idx] * 3, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(fast[0][:, 0, :]), vals[idx], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(fast[4][:, 0, :]), vals[idx] * 5,
                               rtol=1e-6)


def test_population_actor_blocks_match_standalone_apply():
    """actor_apply routes member p's column block through member p's
    parameters — identical to applying each member's chain by hand."""
    pop = _pop(n_members=2)
    agent = pop.agent
    st = agent.init_state(jax.random.PRNGKey(7))
    obs = jax.random.normal(jax.random.PRNGKey(1),
                            (agent.cfg.ns, 2 * agent.block), jnp.float32)
    out = np.asarray(agent.actor_apply(st.actor, obs))
    for p in range(2):
        params_p = jax.tree.map(lambda x: x[p], st.actor)
        blk = obs[:, p * agent.block:(p + 1) * agent.block]
        ref = np.asarray(apply_chain(params_p, blk, jax.nn.relu, jnp.tanh))
        np.testing.assert_allclose(out[:, p * agent.block:(p + 1) * agent.block],
                                   ref, rtol=1e-6, atol=1e-6)


def test_population_per_member_learning_rates():
    """inject_hyperparams lr leaves: a 0-lr member's networks must stay
    exactly at initialization while its sibling trains."""
    pop = _pop(n_members=2, lr_actor=[5e-4, 0.0], lr_critic=[1e-3, 0.0])
    ts0 = pop.init(jax.random.PRNGKey(1))
    a0 = jax.tree.map(np.asarray, ts0.agent.actor)
    ts, _ = pop.make_chunk_fn(40)(ts0)
    a1 = jax.tree.map(np.asarray, ts.agent.actor)
    moved = [np.abs(np.asarray(x[0]) - np.asarray(y[0])).max()
             for x, y in zip(jax.tree.leaves(a1), jax.tree.leaves(a0))]
    frozen = [np.abs(np.asarray(x[1]) - np.asarray(y[1])).max()
              for x, y in zip(jax.tree.leaves(a1), jax.tree.leaves(a0))]
    assert max(moved) > 0.0, "lr=5e-4 member should have trained"
    assert max(frozen) == 0.0, "lr=0 member must be bit-frozen"


def test_population_driver_noise_decay_and_selection():
    """Per-member noise schedules decay independently; eval-driven
    selection fills each hook with its member's best actor; per-member
    episode accounting flows through the record slices."""
    pop = _pop(n_members=3)
    ts, hooks, means = train_population(
        pop, total_steps=60, chunk_len=20, key=jax.random.PRNGKey(0),
        act_noise=[1.2, 0.6, 0.3], noise_decay_every=20,
        noise_decay=[0.5, 1.0, 0.1], eval_every=30, eval_steps=10)
    noise = np.asarray(ts.agent.act_noise)
    np.testing.assert_allclose(noise, [1.2 * 0.5**3, 0.6, 0.3 * 0.1**3],
                               rtol=1e-6)
    assert means.shape == (3,)
    assert np.isfinite(means).all()
    for h in hooks:
        assert len(h.evals) == 2
        assert h.best_actor is not None
        assert np.isfinite(h.bestreward)
        assert h.ep > 1, "per-member episode accounting should have advanced"


def test_population_save_roundtrip(tmp_path):
    """Member checkpoints keep the stock template structure (load interop)
    even when per-member lrs used inject_hyperparams."""
    from distributedconvrl_pde_control_tpu.train import checkpoint
    from distributedconvrl_pde_control_tpu.train.loop import init_train_state

    pop = _pop(n_members=2, lr_actor=[5e-4, 1e-4])
    ts, hooks, _ = train_population(pop, total_steps=40, chunk_len=20,
                                    key=jax.random.PRNGKey(3),
                                    eval_every=20, eval_steps=10)
    out = str(tmp_path / "pop")
    summary = save_population(out, pop, ts, hooks)
    assert len(summary["ranking"]) == 2
    # reload member 0 through the STANDARD template (fresh-adam structure)
    tmpl_setup = build_ks(CFG)
    template = init_train_state(tmpl_setup.env, tmpl_setup.agent,
                                jax.random.PRNGKey(0))
    ts0, hook0 = checkpoint.load(f"{out}/member_00", template)
    assert hook0.best_actor is not None
    assert np.isfinite(summary["ranking"][0]["best_reward"])


def test_population_with_spectral_carry():
    """The carry leaves live in the flat env axis and flow through the
    auto-reset cond + episode boundary."""
    cfg = dataclasses.replace(CFG, spectral_carry=True)
    pop = _pop(n_members=2, cfg=cfg)
    ts = pop.init(jax.random.PRNGKey(0))
    assert ts.env_states.carry[0].shape == (2 * TCFG.n_envs, cfg.nx // 2 + 1)
    ts, recs = pop.make_chunk_fn(170)(ts)  # crosses the episode boundary
    assert np.isfinite(np.asarray(recs)).all()
    assert np.isfinite(np.asarray(ts.env_states.carry[0])).all()
    # per-member record slices partition the flat plane
    r = np.asarray(recs)
    assert pop.member_records(r, 0).shape == (5, 170, TCFG.n_envs)
    assert (pop.member_records(r, 0)[0].sum()
            + pop.member_records(r, 1)[0].sum()) == r[0].sum()


def test_population_search_rounds_and_winner(tmp_path):
    """population_search: trials split into fused rounds, every trial
    scored by its eval-driven best, winner state/hook returned in the
    standard checkpoint format."""
    from distributedconvrl_pde_control_tpu.train import checkpoint
    from distributedconvrl_pde_control_tpu.agents.replay import replay_init
    from distributedconvrl_pde_control_tpu.train.loop import TrainState, init_train_state
    from distributedconvrl_pde_control_tpu.train.population import population_search

    setup = build_ks(CFG)
    best, trials, best_hook, best_state = population_search(
        setup.env, setup.agent, TCFG, n_trials=3, total_steps=40,
        members_per_round=2, seed=0, eval_every=20, eval_steps=10,
        chunk_len=20, y0_pool=_pool(setup), verbose=False)
    assert len(trials) == 3
    assert sorted(t["round"] for t in trials) == [0, 0, 1]
    assert best["trial"] == int(np.argmax([t["eval_reward"] for t in trials]))
    assert np.isfinite(best["reward"])
    # the winner round-trips through the standard checkpoint machinery
    acfg = setup.agent.cfg
    ts_std = TrainState(agent=best_state,
                        replay=replay_init(1, acfg.ns, acfg.na_rows),
                        key=np.asarray(jax.random.PRNGKey(0)))
    checkpoint.save(str(tmp_path / "win"), ts_std, best_hook,
                    include_replay=False)
    tmpl = init_train_state(*(lambda s: (s.env, s.agent))(build_ks(CFG)),
                            jax.random.PRNGKey(0))
    ts0, hook0 = checkpoint.load(str(tmp_path / "win"), tmpl)
    assert hook0.best_actor is not None


def test_population_p1_matches_solo():
    """A P=1 population IS the flat BatchedTrainer on the entire rollout
    path. The ONLY key-draw divergences from a solo run (the precise
    content of the population.py ARCHITECTURE note / PARITY.md row) are:

    (a) the member-axis INIT split — PopulationDDPG.init_state stacks solo
        inits over jax.random.split(key, P), so the P=1 member's params
        come from split(key, 1)[0], not key itself;
    (b) the member-region SAMPLER's two-draw slot scheme —
        member_slot_indices draws (k_idx, j_idx) randints where
        replay_sample draws one flat slot index, so learn-gated steps
        consume different sampled batches (identical per-member slot
        DISTRIBUTION, test_member_slot_indices_stay_in_member_regions).

    With (a) aligned and the learn gate off, a multi-step chunk of the
    P=1 population program must reproduce the solo trainer BITWISE —
    policy forward, exploration noise, env step, auto-reset, replay
    pushes, episode accounting. The learn MATH is pinned per-member
    separately (test_population_p1_learn_math_matches_solo: float-ULP —
    the member vmap reorders the Adam/matmul rounding)."""
    setup = build_ks(CFG)
    pool = _pool(setup)
    solo = BatchedTrainer(setup.env, setup.agent, TCFG, y0_pool=pool)
    pop = PopulationTrainer(setup.env, setup.agent, TCFG, 1, y0_pool=pool)

    key = jax.random.PRNGKey(5)
    ts_pop = pop.init(key)
    # align divergence (a): the population member's agent key is
    # split(k_agent, 1)[0]; feed the solo trainer that same key
    k_agent, k_envs, k_run = jax.random.split(key, 3)
    ts_solo = solo.init_from_keys(jax.random.split(k_agent, 1)[0],
                                  k_envs, k_run)

    # init equality: the stacked member leaves squeeze to the solo leaves
    for lp, ls in zip(jax.tree.leaves(jax.tree.map(np.asarray, ts_pop.agent.actor)),
                      jax.tree.leaves(jax.tree.map(np.asarray, ts_solo.agent.actor))):
        assert np.array_equal(lp[0], ls)
    assert np.array_equal(np.asarray(ts_pop.obs_flat),
                          np.asarray(ts_solo.obs_flat))

    # 170 learn-off steps cross the 160-step episode boundary (auto-reset
    # cond + fresh-IC draws + terminal masking all exercised)
    ts_pop, recs_pop = pop.make_chunk_fn(170, learn=False)(ts_pop)
    ts_solo, recs_solo = solo.make_chunk_fn(170, learn=False)(ts_solo)
    assert np.array_equal(np.asarray(recs_pop), np.asarray(recs_solo))
    for name in ("obs_flat", "ep_reward", "ep_count", "total_env_steps",
                 "best_reward", "key"):
        assert np.array_equal(np.asarray(getattr(ts_pop, name)),
                              np.asarray(getattr(ts_solo, name))), name
    for fld in ("s", "a", "r", "t", "sn", "ptr", "size"):
        assert np.array_equal(np.asarray(getattr(ts_pop.replay, fld)),
                              np.asarray(getattr(ts_solo.replay, fld))), fld
    assert np.array_equal(np.asarray(ts_pop.env_states.y),
                          np.asarray(ts_solo.env_states.y))


def test_population_p1_learn_math_matches_solo():
    """PopulationDDPG.learn_batch is a vmap of the stock per-member learn
    step: fed the SAME sampled batch, the P=1 member's post-update state
    equals the solo agent's to float-ULP (the vmap batches the matmuls/
    Adam elementwise ops, which reorders their rounding — measured ~1e-10
    on first-step updates of magnitude ~lr). So divergence (b) above —
    WHICH slots get sampled — plus this rounding reorder is the whole
    learn-path difference."""
    from distributedconvrl_pde_control_tpu.agents.ddpg import DDPGAgent

    setup = build_ks(CFG)
    pop = _pop(n_members=1)
    agent = pop.agent
    solo = DDPGAgent(agent.base_cfg)
    st_solo = solo.init_state(jax.random.PRNGKey(11))
    st_pop = jax.tree.map(lambda x: jnp.asarray(x)[None], st_solo).replace(
        update_step=st_solo.update_step,
        act_noise=jnp.full((1,), float(st_solo.act_noise), jnp.float32))
    rng = np.random.default_rng(2)
    b = 32
    batch = (
        jnp.asarray(rng.normal(size=(agent.cfg.ns, b)), jnp.float32),
        jnp.asarray(rng.normal(size=(agent.cfg.na_rows, b)), jnp.float32),
        jnp.asarray(rng.normal(size=(b,)), jnp.float32),
        jnp.asarray((rng.random(b) < 0.1).astype(np.float32)),
        jnp.asarray(rng.normal(size=(agent.cfg.ns, b)), jnp.float32),
    )
    out_solo = solo.learn_batch(st_solo, batch)
    out_pop = agent.learn_batch(st_pop, jax.tree.map(lambda x: x[None], batch))
    for lp, ls in zip(
            jax.tree.leaves(jax.tree.map(np.asarray, (out_pop.actor, out_pop.critic,
                                                      out_pop.target_actor))),
            jax.tree.leaves(jax.tree.map(np.asarray, (out_solo.actor, out_solo.critic,
                                                      out_solo.target_actor)))):
        np.testing.assert_allclose(lp[0], ls, rtol=0, atol=1e-8)


def test_population_keller_segel_family():
    """Family generality: the multi-row Keller-Segel buffers take the plain
    member gather (no 128-block fast path) and the flat trainer runs the
    stencil solver unchanged."""
    from distributedconvrl_pde_control_tpu.configs.keller_segel import (
        KELLER_SEGEL_10_16_FAST,
        build_keller_segel,
    )

    setup = build_keller_segel(KELLER_SEGEL_10_16_FAST)
    pool = _pool(setup, n=4)
    pop = PopulationTrainer(setup.env, setup.agent,
                            BatchedTrainerConfig(n_envs=2, batch_size=8,
                                                 update_loops=1),
                            n_members=2, y0_pool=pool)
    assert pop.agent.cfg.ns > 1  # multi-row obs -> plain gather path
    ts, hooks, means = train_population(pop, total_steps=20, chunk_len=10,
                                        key=jax.random.PRNGKey(0),
                                        eval_every=10, eval_steps=5)
    assert np.isfinite(means).all()
    for h in hooks:
        assert np.isfinite(h.bestreward)


def test_population_eval_warmup_and_held_out_pool():
    """OOD selection protocol (r05): per-member evals with warmup score the
    controlled segment after K uncontrolled steps, on the HELD-OUT IC pool
    when one is given — and must agree with the solo trainer's warmup eval
    member-by-member (same actors, same eval ICs)."""
    setup = build_ks(CFG)
    eval_pool = jnp.stack([jnp.asarray(setup.random_init(k))
                           for k in jax.random.split(jax.random.PRNGKey(7), 4)])
    pop = _pop(n_members=2, eval_y0_pool=eval_pool)
    ts = pop.init(jax.random.PRNGKey(0))
    k = jax.random.PRNGKey(3)
    rs = pop.eval_mean_rewards(ts.agent.actor, 8, key=k, warmup_steps=5)
    assert rs.shape == (2,) and np.isfinite(rs).all()
    rs0 = pop.eval_mean_rewards(ts.agent.actor, 8, key=k)
    assert (np.abs(rs - rs0) > 1e-7).all(), (rs, rs0)

    solo = BatchedTrainer(setup.env, setup.agent, TCFG,
                          y0_pool=_pool(setup), eval_y0_pool=eval_pool)
    for i in range(2):
        actor_i = jax.tree.map(lambda x: x[i], ts.agent.actor)
        r_solo = solo.eval_mean_reward(actor_i, 8, key=k, warmup_steps=5)
        assert abs(r_solo - rs[i]) < 1e-5, (i, r_solo, rs[i])
