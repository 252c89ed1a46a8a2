"""Population x DP composition (train/population.py POPULATION x DP note):
the P-member study sharded over a pure-dp mesh — every device runs a local
mini-population of P members x (n_envs/n_dp) envs member-major, per-member
gradients pmean over dp (inside the member vmap), global hook accounting.

Run on the virtual 8-device CPU mesh (conftest). Reference workflow being
scaled: scripts/KS/setup/KSSetup.jl:321-363 (the serial multi-seed restart
protocol this composes with DP).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from distributedconvrl_pde_control_tpu.configs.ks import KS22, build_ks
from distributedconvrl_pde_control_tpu.parallel.batched_dp import dp_mesh
from distributedconvrl_pde_control_tpu.train.batched import BatchedTrainerConfig
from distributedconvrl_pde_control_tpu.train.population import (
    PopulationTrainer,
    save_population,
    train_population,
)

CFG = dataclasses.replace(KS22, stepper="etdrk4", fft_mode="native")
TCFG = BatchedTrainerConfig(n_envs=4, batch_size=16, update_loops=1)


def _pool(setup, n=8):
    keys = jax.random.split(jax.random.PRNGKey(99), n)
    return jnp.stack([jnp.asarray(setup.random_init(k)) for k in keys])


def _pop(n_members=2, n_dp=None, tcfg=TCFG, **kw):
    setup = build_ks(CFG)
    mesh = dp_mesh(n_dp) if n_dp else None
    return PopulationTrainer(setup.env, setup.agent, tcfg, n_members,
                             y0_pool=_pool(setup), mesh=mesh, **kw)


def test_population_dp1_bitwise_matches_unsharded():
    """On a 1-device dp mesh the composition must reproduce the unsharded
    population chunk exactly from the same state (records, env/replay
    leaves bitwise; params tight-allclose — the pmean all-reduce reorders
    gradient-sum rounding even at axis size 1, same bound as
    test_batched_dp.py::test_dp1_bitwise_matches_single_device)."""
    flat = _pop(n_members=2)
    dp = _pop(n_members=2, n_dp=1)
    ts0 = flat.init(jax.random.PRNGKey(7))
    ts_dp = dp.base.device_put(
        jax.tree.map(lambda x: jnp.array(x, copy=True),
                     ts0.replace(key=ts0.key[None])))
    ts1, recs1 = flat.make_chunk_fn(12)(ts0)
    ts2, recs2 = dp.make_chunk_fn(12)(ts_dp)
    assert np.array_equal(np.asarray(recs1), np.asarray(recs2))
    for name in ("total_env_steps", "ep_count", "best_reward", "obs_flat"):
        assert np.array_equal(np.asarray(getattr(ts1, name)),
                              np.asarray(getattr(ts2, name))), name
    assert np.array_equal(np.asarray(ts1.replay.s), np.asarray(ts2.replay.s))
    a1 = jax.tree.leaves(jax.tree.map(np.asarray, ts1.agent.actor))
    a2 = jax.tree.leaves(jax.tree.map(np.asarray, ts2.agent.actor))
    for x, y in zip(a1, a2):
        assert np.allclose(x, y, atol=1e-7), np.abs(x - y).max()
    # at dp=1 the device-major record layout degenerates to member-major
    assert np.array_equal(np.asarray(flat.member_records(np.asarray(recs1), 1)),
                          np.asarray(dp.member_records(np.asarray(recs2), 1)))


def test_population_dp_member_isolation_under_pmean():
    """The per-member gradient pmean over dp must stay scoped per member:
    a 0-lr member's stacked params stay bit-frozen across a learning chunk
    on a 2-device mesh while its sibling trains."""
    pop = _pop(n_members=2, n_dp=2, lr_actor=[5e-4, 0.0],
               lr_critic=[1e-3, 0.0])
    ts0 = pop.init(jax.random.PRNGKey(1))
    a0 = jax.tree.map(np.asarray, ts0.agent.actor)
    ts, _ = pop.make_chunk_fn(40)(ts0)
    a1 = jax.tree.map(np.asarray, ts.agent.actor)
    moved = [np.abs(np.asarray(x[0]) - np.asarray(y[0])).max()
             for x, y in zip(jax.tree.leaves(a1), jax.tree.leaves(a0))]
    frozen = [np.abs(np.asarray(x[1]) - np.asarray(y[1])).max()
              for x, y in zip(jax.tree.leaves(a1), jax.tree.leaves(a0))]
    assert max(moved) > 0.0, "lr=5e-4 member should have trained"
    assert max(frozen) == 0.0, "lr=0 member must be bit-frozen under dp"


def test_population_dp_record_layout_routes_members():
    """member_records must gather member i's env columns from every device
    block of the device-major global plane. Ground truth via a structural
    signature: member 0 is FROZEN (0 lrs) and noise-free, so each of its
    episode rewards is a deterministic function of which of the 8 pool ICs
    the reset drew — at most 8 distinct values across its 24 episodes —
    while noisy member 1's episode rewards are all distinct. (The 6-step
    zero-policy warmup makes each env's FIRST episode differ from later
    same-IC episodes, so the bound is 8 + 4 first episodes = 12.) A layout
    mix-up would blend noisy columns into member 0's hook and push its
    distinct count toward all-24-distinct."""
    pop = _pop(n_members=2, n_dp=2, lr_actor=[0.0, 0.0], lr_critic=[0.0, 0.0])
    ts, hooks, _ = train_population(
        pop, total_steps=340, chunk_len=170, key=jax.random.PRNGKey(0),
        act_noise=[0.0, 3.0], noise_decay_every=0)
    # both members finished the same episode count: 50-step KS22 episodes
    # (te=5/dt=0.1) -> 340//50 = 6 per env, over each member's 4 envs
    eps = [h.ep - 1 for h in hooks]
    assert eps[0] == eps[1] == (340 // 50) * TCFG.n_envs
    uniq_quiet = len(set(np.round(hooks[0].rewards, 4)))
    uniq_noisy = len(set(np.round(hooks[1].rewards, 4)))
    assert uniq_quiet <= 12, (uniq_quiet, hooks[0].rewards)
    assert uniq_noisy == len(hooks[1].rewards), uniq_noisy


def test_population_dp_driver_eval_selection_and_save(tmp_path):
    """train_population runs UNCHANGED on the dp composition: per-member
    noise decay, eval-driven per-member best actors, standard member
    checkpoints (dp key leaf flattened)."""
    from distributedconvrl_pde_control_tpu.train import checkpoint
    from distributedconvrl_pde_control_tpu.train.loop import init_train_state

    pop = _pop(n_members=2, n_dp=2)
    ts, hooks, means = train_population(
        pop, total_steps=60, chunk_len=20, key=jax.random.PRNGKey(0),
        act_noise=[1.2, 0.6], noise_decay_every=20, noise_decay=[0.5, 1.0],
        eval_every=30, eval_steps=10)
    np.testing.assert_allclose(np.asarray(ts.agent.act_noise),
                               [1.2 * 0.5 ** 3, 0.6], rtol=1e-6)
    for h in hooks:
        assert len(h.evals) == 2
        assert h.best_actor is not None and np.isfinite(h.bestreward)
    out = str(tmp_path / "popdp")
    summary = save_population(out, pop, ts, hooks)
    assert len(summary["ranking"]) == 2
    tmpl_setup = build_ks(CFG)
    template = init_train_state(tmpl_setup.env, tmpl_setup.agent,
                                jax.random.PRNGKey(0))
    ts0, hook0 = checkpoint.load(f"{out}/member_00", template)
    assert hook0.best_actor is not None


def test_population_dp_requires_divisible_envs():
    import pytest

    with pytest.raises(ValueError, match="divide"):
        _pop(n_members=2, n_dp=8,
             tcfg=BatchedTrainerConfig(n_envs=4, batch_size=16))
