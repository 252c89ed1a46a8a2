"""Integration test: tiny KS training run reaches a stabilization threshold.

This is the rebuild's version of the reference's empirical QA (SURVEY.md §4):
train the KS22 controller on a reduced budget and assert (a) the best episode
reward crosses a learning threshold and (b) the plot_heat-protocol evaluation
stabilizes the chaotic field.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from distributedconvrl_pde_control_tpu.configs import KS22, build_ks
from distributedconvrl_pde_control_tpu.train.drivers import train
from distributedconvrl_pde_control_tpu.train.loop import make_episode_fn


@pytest.fixture(scope="module")
def trained():
    setup = build_ks(KS22)
    ts, hook = train(setup, loops=4, no_steps=400, verbose=False)
    return setup, ts, hook


def test_learning_curve_improves(trained):
    setup, ts, hook = trained
    assert hook.bestreward > -2.0, hook.rewards
    # late episodes better than early on average
    assert np.mean(hook.rewards[-8:]) > np.mean(hook.rewards[:8])


def test_stabilization_eval(trained):
    setup, ts, hook = trained
    env_eval = dataclasses.replace(setup.env, te=100.0)
    eval_fn = make_episode_fn(env_eval, setup.agent, learning=False, record=True,
                              max_steps=1000, t_action_steps=500)
    ts_eval = ts.replace(agent=ts.agent.replace(actor=jax.tree.map(jnp.asarray, hook.best_actor)))
    _, res = eval_fn(ts_eval, jnp.asarray(setup.env.y0))
    y = np.asarray(res.y_trace)
    pre = np.abs(y[400:500]).mean()
    post = np.abs(y[900:1000]).mean()
    assert post < 0.3 * pre, (pre, post)


def test_episode_counting_and_completion(trained):
    setup, ts, hook = trained
    # all KS episodes are full-length (blow-ups are rare at these settings)
    assert hook.ep - 1 == len(hook.rewards)
    assert hook.bestepisode > 0
    assert hook.best_actor is not None


def test_zero_shot_transfer_to_larger_domain(trained):
    """The KS500 protocol (KS500.jl:21-24) at test scale: the KS22-trained
    actor runs unchanged on a 3x larger domain with the same sensor spacing
    and still suppresses the chaos."""
    from distributedconvrl_pde_control_tpu.train.eval import actor_policy, rollout

    setup, ts, hook = trained
    big = dataclasses.replace(KS22, name="KS66", lx=66.0, nx=576, n_actuators=24)
    setup_big = build_ks(big)
    policy = actor_policy(setup_big.agent,
                          jax.tree.map(jnp.asarray, hook.best_actor))
    traces = rollout(setup_big.env, policy, te=100.0, t_action=50.0)
    y = traces["y"]
    pre = np.abs(y[400:500]).mean()
    post = np.abs(y[900:1000]).mean()
    assert post < 0.5 * pre, (pre, post)


def test_checkpoint_roundtrip(trained, tmp_path):
    from distributedconvrl_pde_control_tpu.train import checkpoint
    from distributedconvrl_pde_control_tpu.train.loop import init_train_state

    setup, ts, hook = trained
    checkpoint.save(str(tmp_path), ts, hook)
    template = init_train_state(setup.env, setup.agent, jax.random.PRNGKey(0))
    ts2, hook2 = checkpoint.load(str(tmp_path), template)
    for a, b in zip(ts.agent.actor, ts2.agent.actor):
        assert np.allclose(np.asarray(a["w"]), np.asarray(b["w"]))
    assert hook2.bestreward == hook.bestreward
    assert hook2.rewards == [float(r) for r in hook.rewards]
    assert np.allclose(np.asarray(hook2.best_actor[0]["w"]),
                       np.asarray(hook.best_actor[0]["w"]))
    # numbered saves (train_multi protocol, KSSetup.jl:354-356)
    checkpoint.save(str(tmp_path), ts, hook, number=3)
    ts3, _ = checkpoint.load(str(tmp_path), template, number=3)
    assert np.allclose(np.asarray(ts3.agent.critic[0]["w"]),
                       np.asarray(ts.agent.critic[0]["w"]))


def test_checkpoint_orbax_backend_roundtrip(trained, tmp_path):
    """The orbax backend (SURVEY §5.4's planned ecosystem format) is
    on-disk interchangeable with the default: save(backend='orbax'),
    load() auto-detects. Full (replay included) and light variants."""
    from distributedconvrl_pde_control_tpu.train import checkpoint
    from distributedconvrl_pde_control_tpu.train.loop import init_train_state

    setup, ts, hook = trained
    full_dir, light_dir = tmp_path / "full", tmp_path / "light"
    checkpoint.save(str(full_dir), ts, hook, backend="orbax")
    assert (full_dir / "saves" / "agent_orbax").is_dir()
    assert not (full_dir / "saves" / "agent.msgpack").exists()
    template = init_train_state(setup.env, setup.agent, jax.random.PRNGKey(0))
    ts2, hook2 = checkpoint.load(str(full_dir), template)
    for a, b in zip(ts.agent.actor, ts2.agent.actor):
        assert np.allclose(np.asarray(a["w"]), np.asarray(b["w"]))
    assert np.allclose(np.asarray(ts2.replay.s), np.asarray(ts.replay.s))
    assert int(ts2.replay.size) == int(ts.replay.size)
    assert hook2.bestreward == hook.bestreward

    checkpoint.save(str(light_dir), ts, hook, include_replay=False,
                    backend="orbax")
    ts3, _ = checkpoint.load(str(light_dir), template)
    for a, b in zip(ts.agent.target_critic, ts3.agent.target_critic):
        assert np.allclose(np.asarray(a["w"]), np.asarray(b["w"]))
    assert int(ts3.replay.size) == 0  # light: fresh buffer


def test_shipped_artifact_stabilizes():
    """The committed pretrained KS22 checkpoint must reproduce stabilization
    (the reference's `evaluation = true` flow with shipped saves)."""
    import os

    from distributedconvrl_pde_control_tpu.train import checkpoint
    from distributedconvrl_pde_control_tpu.train.eval import actor_policy, rollout
    from distributedconvrl_pde_control_tpu.train.loop import init_train_state

    art = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "artifacts", "KS22")
    if not os.path.exists(os.path.join(art, "saves", "agent.msgpack")):
        pytest.skip("artifacts not present")
    setup = build_ks(KS22)
    template = init_train_state(setup.env, setup.agent, jax.random.PRNGKey(0))
    ts, hook = checkpoint.load(art, template)
    policy = actor_policy(setup.agent, jax.tree.map(jnp.asarray, hook.best_actor))
    traces = rollout(setup.env, policy, te=60.0, t_action=30.0)
    y = traces["y"]
    pre = np.abs(y[200:300]).mean()
    post = np.abs(y[-60:]).mean()
    assert post < 0.2 * pre, (pre, post)


def test_training_is_deterministic_given_seed():
    """Same seed -> bitwise-identical training trajectory (StableRNG parity,
    SURVEY.md §4 determinism hooks)."""
    from distributedconvrl_pde_control_tpu.train.drivers import train

    setup = build_ks(KS22)
    _, hook_a = train(setup, loops=1, no_steps=100, verbose=False, seed=7)
    _, hook_b = train(setup, loops=1, no_steps=100, verbose=False, seed=7)
    assert hook_a.rewards == hook_b.rewards
    _, hook_c = train(setup, loops=1, no_steps=100, verbose=False, seed=8)
    assert hook_a.rewards != hook_c.rewards


def test_light_checkpoint_roundtrip(trained, tmp_path):
    """Replay-free checkpoints: policies ship at KB scale and load against a
    fresh buffer (the reference's large JLD2 blobs overflow its LFS limits)."""
    import os

    from distributedconvrl_pde_control_tpu.train import checkpoint
    from distributedconvrl_pde_control_tpu.train.loop import init_train_state

    setup, ts, hook = trained
    checkpoint.save(str(tmp_path), ts, hook, include_replay=False)
    assert not os.path.exists(tmp_path / "saves" / "agent.msgpack")
    assert (tmp_path / "saves" / "agent_light.msgpack").stat().st_size < 5_000_000
    template = init_train_state(setup.env, setup.agent, jax.random.PRNGKey(0))
    ts2, hook2 = checkpoint.load(str(tmp_path), template)
    for a, b in zip(ts.agent.actor, ts2.agent.actor):
        assert np.allclose(np.asarray(a["w"]), np.asarray(b["w"]))
    assert int(ts2.replay.size) == 0  # fresh buffer
    assert hook2.bestreward == hook.bestreward


def test_shipped_batched_artifact_stabilizes():
    """The throughput-mode artifact (artifacts/KS22_batched: 3000 fused
    steps x 256 envs, ~1 s of steady-state TPU compute) must reproduce
    stabilization through the standard eval path — the checked-in evidence
    behind PERFORMANCE.md's wall-clock-to-stabilization claim."""
    import os

    from distributedconvrl_pde_control_tpu.train import checkpoint
    from distributedconvrl_pde_control_tpu.train.eval import actor_policy, rollout
    from distributedconvrl_pde_control_tpu.train.loop import init_train_state

    art = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "artifacts", "KS22_batched")
    if not os.path.exists(os.path.join(art, "saves", "agent_light.msgpack")):
        pytest.skip("artifact not present")
    setup = build_ks(KS22)
    template = init_train_state(setup.env, setup.agent, jax.random.PRNGKey(0))
    ts, hook = checkpoint.load(art, template)
    policy = actor_policy(setup.agent, jax.tree.map(jnp.asarray, hook.best_actor))
    traces = rollout(setup.env, policy, te=60.0, t_action=30.0)
    y = traces["y"]
    pre = np.abs(y[200:300]).mean()
    post = np.abs(y[-60:]).mean()
    assert post < 0.1 * pre, (pre, post)


def test_shipped_ks22_lh_artifact_beats_tight_gate():
    """The r04 long-horizon-selected KS22 artifact (gentle x0.5/1000 noise
    schedule at half the old gentle budget — 3000 fused steps x 256 envs —
    best actor picked by the 500-step eval on the te-overridden env;
    RESULTS.md r04 row: 0.24% suppression at te=200, matching the all-time
    record without the aggressive-schedule seed lottery) must pass a 2x
    TIGHTER gate than the KS22_batched test above: post < 5% of pre."""
    import os

    from distributedconvrl_pde_control_tpu.train import checkpoint
    from distributedconvrl_pde_control_tpu.train.eval import actor_policy, rollout
    from distributedconvrl_pde_control_tpu.train.loop import init_train_state

    art = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "artifacts", "KS22_batched_lh")
    if not os.path.exists(os.path.join(art, "saves", "agent_light.msgpack")):
        pytest.skip("artifact not present")
    setup = build_ks(KS22)
    template = init_train_state(setup.env, setup.agent, jax.random.PRNGKey(0))
    ts, hook = checkpoint.load(art, template)
    policy = actor_policy(setup.agent, jax.tree.map(jnp.asarray, hook.best_actor))
    traces = rollout(setup.env, policy, te=60.0, t_action=30.0)
    y = traces["y"]
    pre = np.abs(y[200:300]).mean()
    post = np.abs(y[-60:]).mean()
    assert post < 0.05 * pre, (pre, post)


def test_shipped_keller_segel_fast_artifact_regulates():
    """The fast-tier chemotaxis artifact (artifacts/KellerSegel10_16_fast,
    trained with the 8x2500 recipe at oversampling=10) must suppress >=85%
    of the |u-1| deviation from an unseen random init — the multi-seed
    result in RESULTS.md (measured 95-96% on seeds 7-10; the uncontrolled
    field holds |u-1| ~= 0.5)."""
    import os

    from distributedconvrl_pde_control_tpu.configs.keller_segel import (
        KELLER_SEGEL_10_16_FAST,
        build_keller_segel,
    )
    from distributedconvrl_pde_control_tpu.train import checkpoint
    from distributedconvrl_pde_control_tpu.train.eval import actor_policy, rollout
    from distributedconvrl_pde_control_tpu.train.loop import init_train_state

    art = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "artifacts", "KellerSegel10_16_fast")
    if not os.path.exists(os.path.join(art, "saves", "agent.msgpack")):
        pytest.skip("artifact not present")
    setup = build_keller_segel(KELLER_SEGEL_10_16_FAST)
    template = init_train_state(setup.env, setup.agent, jax.random.PRNGKey(0))
    ts, hook = checkpoint.load(art, template)
    policy = actor_policy(setup.agent, jax.tree.map(jnp.asarray, hook.best_actor))
    y0 = setup.random_init(jax.random.PRNGKey(8))
    traces = rollout(setup.env, policy, y0=y0, te=12.0, t_action=4.0)
    dev = np.abs(np.asarray(traces["y"])[:, 0] - 1.0)
    act_start = int(round(4.0 / setup.env.dt))
    pre = dev[max(0, act_start - 100):act_start].mean()
    post = dev[-dev.shape[0] // 10:].mean()
    assert post < 0.15 * pre, (pre, post)


def test_shipped_coarse_grid_artifact_transfers_to_fine_grid():
    """The KS22_64 coarse-tier artifact (trained ENTIRELY on the nx=64 grid,
    configs/ks.py KS22_64 note) must stabilize the standard nx=192 fidelity
    env through the plot_heat protocol — resolution transfer in the
    train-coarse -> eval-fine direction (measured 0.91% suppression;
    RESULTS.md)."""
    import os

    from distributedconvrl_pde_control_tpu.train import checkpoint
    from distributedconvrl_pde_control_tpu.train.eval import actor_policy, rollout
    from distributedconvrl_pde_control_tpu.train.loop import init_train_state

    art = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "artifacts", "KS22_64")
    if not os.path.exists(os.path.join(art, "saves", "agent_light.msgpack")):
        pytest.skip("artifact not present")
    setup = build_ks(KS22)  # the FINE-grid env
    template = init_train_state(setup.env, setup.agent, jax.random.PRNGKey(0))
    ts, hook = checkpoint.load(art, template)
    policy = actor_policy(setup.agent, jax.tree.map(jnp.asarray, hook.best_actor))
    traces = rollout(setup.env, policy, te=60.0, t_action=30.0)
    y = traces["y"]
    pre = np.abs(y[200:300]).mean()
    post = np.abs(y[-60:]).mean()
    assert post < 0.1 * pre, (pre, post)


def test_shipped_ks200_batched_artifact_stabilizes_and_transfers():
    """The batched-trained KS200 artifact (6000 fused steps x 256 envs,
    gentle noise schedule — RESULTS.md round-3 rows: 0.87% on KS200, 0.83%
    zero-shot on the 2.5x KS500 domain, vs the fidelity artifact's
    8.1%/7.8%) must stabilize the KS500 transfer protocol."""
    import os

    from distributedconvrl_pde_control_tpu.configs import KS500
    from distributedconvrl_pde_control_tpu.train import checkpoint
    from distributedconvrl_pde_control_tpu.train.eval import actor_policy, rollout
    from distributedconvrl_pde_control_tpu.train.loop import init_train_state

    art = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "artifacts", "KS200_batched")
    if not os.path.exists(os.path.join(art, "saves", "agent_light.msgpack")):
        pytest.skip("artifact not present")
    setup = build_ks(KS500)  # the 2.5x transfer target
    template = init_train_state(setup.env, setup.agent, jax.random.PRNGKey(0))
    ts, hook = checkpoint.load(art, template)
    policy = actor_policy(setup.agent, jax.tree.map(jnp.asarray, hook.best_actor))
    traces = rollout(setup.env, policy, te=60.0, t_action=30.0)
    y = traces["y"]
    pre = np.abs(y[200:300]).mean()
    post = np.abs(y[-60:]).mean()
    assert post < 0.1 * pre, (pre, post)


def test_shipped_ks200_lh_artifact_beats_transfer_gate():
    """The r04 long-horizon-selected KS200 artifact (same gentle batched
    recipe as KS200_batched, best actor picked by the 500-step eval on the
    te-overridden env — RESULTS.md r04 rows: 0.34% native, 0.32% zero-shot
    on KS500) must pass a TIGHTER transfer gate than the r3 artifact:
    post < 5% of pre on the 2.5x KS500 domain."""
    import os

    from distributedconvrl_pde_control_tpu.configs import KS500
    from distributedconvrl_pde_control_tpu.train import checkpoint
    from distributedconvrl_pde_control_tpu.train.eval import actor_policy, rollout
    from distributedconvrl_pde_control_tpu.train.loop import init_train_state

    art = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "artifacts", "KS200_batched_lh")
    if not os.path.exists(os.path.join(art, "saves", "agent_light.msgpack")):
        pytest.skip("artifact not present")
    setup = build_ks(KS500)
    template = init_train_state(setup.env, setup.agent, jax.random.PRNGKey(0))
    ts, hook = checkpoint.load(art, template)
    policy = actor_policy(setup.agent, jax.tree.map(jnp.asarray, hook.best_actor))
    traces = rollout(setup.env, policy, te=60.0, t_action=30.0)
    y = traces["y"]
    pre = np.abs(y[200:300]).mean()
    post = np.abs(y[-60:]).mean()
    assert post < 0.05 * pre, (pre, post)


def test_shipped_ks200_hyperopt_artifact_loads_offpreset_and_stabilizes():
    """The KS200 hyperopt-winner artifact is trained OFF-preset (searched
    nna_scale/critic width — RESULTS.md 'KS200-scale search'), so loading it
    exercises the config_overrides rebuild path end-to-end on a real shipped
    artifact: build_setup must apply the artifact's config_overrides.json
    before the checkpoint template is built, or the network shapes mismatch.
    Quality gate: stabilize the KS200 fidelity env (measured 2.12%)."""
    import os

    from distributedconvrl_pde_control_tpu.experiments.run import build_setup
    from distributedconvrl_pde_control_tpu.train import checkpoint
    from distributedconvrl_pde_control_tpu.train.eval import actor_policy, rollout
    from distributedconvrl_pde_control_tpu.train.loop import init_train_state

    art = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "artifacts", "KS200_hyperopt")
    if not os.path.exists(os.path.join(art, "saves", "agent_light.msgpack")):
        pytest.skip("artifact not present")
    overrides = checkpoint.load_config_overrides(art)
    assert overrides, "off-preset artifact must ship config_overrides.json"
    setup = build_setup("KS200", config_overrides=overrides)
    template = init_train_state(setup.env, setup.agent, jax.random.PRNGKey(0))
    ts, hook = checkpoint.load(art, template)
    policy = actor_policy(setup.agent, jax.tree.map(jnp.asarray, hook.best_actor))
    traces = rollout(setup.env, policy, te=60.0, t_action=30.0)
    y = traces["y"]
    pre = np.abs(y[200:300]).mean()
    post = np.abs(y[-60:]).mean()
    assert post < 0.1 * pre, (pre, post)


def test_shipped_tp_tier_artifact_stabilizes():
    """The `_tp` throughput-tier artifact (artifacts/KS22_tp — trained on
    the full bench configuration: ETDRK4 + matmul_hi + 1-pass-bf16
    nonlinear transforms) must stabilize the STANDARD fidelity env — the
    checked-in quality gate behind shipping nl_fft_mode in bench.py
    (PERFORMANCE.md nl-tier ladder)."""
    import os

    from distributedconvrl_pde_control_tpu.train import checkpoint
    from distributedconvrl_pde_control_tpu.train.eval import actor_policy, rollout
    from distributedconvrl_pde_control_tpu.train.loop import init_train_state

    art = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "artifacts", "KS22_tp")
    if not os.path.exists(os.path.join(art, "saves", "agent_light.msgpack")):
        pytest.skip("artifact not present")
    setup = build_ks(KS22)
    template = init_train_state(setup.env, setup.agent, jax.random.PRNGKey(0))
    ts, hook = checkpoint.load(art, template)
    policy = actor_policy(setup.agent, jax.tree.map(jnp.asarray, hook.best_actor))
    traces = rollout(setup.env, policy, te=60.0, t_action=30.0)
    y = traces["y"]
    pre = np.abs(y[200:300]).mean()
    post = np.abs(y[-60:]).mean()
    assert post < 0.1 * pre, (pre, post)
