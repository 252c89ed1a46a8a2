"""JLD2 import of the reference's shipped checkpoints.

The decisive end-to-end parity experiment: policies trained by the
reference's Julia stack (shipped in scripts/*/saves/*.jld2) are imported
raw and must control THIS framework's environments — which only happens if
featurization, action smearing, solver and act-limit conventions all match
(KSSetup.jl:190-245, src/plotting.jl:28-30).

Skipped wholesale when the reference snapshot is not present.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference/scripts"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference snapshot not present")


def _actor(chain):
    return [{"w": jnp.asarray(l["w"]), "b": jnp.asarray(l["b"])} for l in chain]


def test_agent_jld2_networks_and_hypers_match_preset():
    from distributedconvrl_pde_control_tpu import configs as C
    from distributedconvrl_pde_control_tpu.train.reference_import import (
        load_reference_agent,
    )

    nets = load_reference_agent(f"{REF}/KS/KS22/saves")
    setup = C.build_ks(C.KS22)
    st = setup.agent.init_state(jax.random.PRNGKey(0))
    for name in ("actor", "critic", "target_actor", "target_critic"):
        got = [l["w"].shape for l in nets[name]]
        want = [tuple(l["w"].shape) for l in getattr(st, name)]
        assert got == want, (name, got, want)
    h = nets["hyper"]
    # CustomDDPGPolicy scalars (src/PDEagent.jl:121-157) as configured by
    # KSSetup.jl:64-71
    assert h["y"] == pytest.approx(0.99)
    assert h["p"] == pytest.approx(0.995)
    assert h["act_limit"] == pytest.approx(1.0)
    assert h["batch_size"] == 3
    assert h["update_loops"] == 20


@pytest.mark.parametrize("saves,build", [
    ("KS/KS200/saves", lambda C: C.build_ks(C.KS200)),
    ("KS/KS22_global-agent/saves", lambda C: C.build_ks_global()),
    ("Fluid/Fluid_8/saves", lambda C: C.build_fluid(C.FLUID_8)),
    ("Fluid/Fluid_16/saves", lambda C: C.build_fluid(C.FLUID_16)),
    ("Fluid/Fluid_32/saves", lambda C: C.build_fluid(C.FLUID_32)),
    ("Keller-Segel/Keller-Segel10_16/saves",
     lambda C: C.build_keller_segel(C.KELLER_SEGEL_10_16)),
])
def test_best_actor_shapes_match_every_family(saves, build):
    """Every shipped hook.jld2's bestNNA drops into the matching preset's
    actor template — the network factory and featurizer dimensions agree
    with the reference across ALL families (create_NNA, PDEagent.jl:14-56)."""
    from distributedconvrl_pde_control_tpu import configs as C
    from distributedconvrl_pde_control_tpu.train.reference_import import (
        load_reference_best_actor,
    )

    chain, info = load_reference_best_actor(f"{REF}/{saves}")
    setup = build(C)
    st = setup.agent.init_state(jax.random.PRNGKey(0))
    got = [l["w"].shape for l in chain]
    want = [tuple(l["w"].shape) for l in st.actor]
    assert got == want, (saves, got, want)
    assert np.isfinite(info["bestreward"])


def test_reference_trained_ks22_policy_controls_our_env():
    """The reference's own trained KS22 policy, imported raw, stabilizes our
    KS22 environment (measured: 0.24% suppression — RESULTS.md import
    table). This passes only if the full observation->action->forcing->
    solver pipeline is semantically identical to the Julia stack."""
    from distributedconvrl_pde_control_tpu import configs as C
    from distributedconvrl_pde_control_tpu.train.eval import actor_policy, rollout
    from distributedconvrl_pde_control_tpu.train.reference_import import (
        load_reference_best_actor,
    )

    chain, _ = load_reference_best_actor(f"{REF}/KS/KS22/saves")
    setup = C.build_ks(C.KS22)
    traces = rollout(setup.env, actor_policy(setup.agent, _actor(chain)),
                     te=200.0, t_action=100.0)
    y = np.asarray(traces["y"])
    pre = np.abs(y[800:1000]).mean()
    post = np.abs(y[-200:]).mean()
    assert post < 0.02 * pre, (pre, post)


def test_import_checkpoint_roundtrip(tmp_path):
    """import_reference_checkpoint writes a standard light checkpoint that
    the normal loader reproduces exactly (behavior nets + bestNNA + reward
    history)."""
    from distributedconvrl_pde_control_tpu import configs as C
    from distributedconvrl_pde_control_tpu.train import checkpoint
    from distributedconvrl_pde_control_tpu.train.loop import init_train_state
    from distributedconvrl_pde_control_tpu.train.reference_import import (
        import_reference_checkpoint,
        load_reference_best_actor,
    )

    setup = C.build_ks(C.KS22)
    out = str(tmp_path / "imported")
    ts, hook = import_reference_checkpoint(f"{REF}/KS/KS22/saves", setup,
                                           out_dir=out)
    tmpl = init_train_state(setup.env, setup.agent, jax.random.PRNGKey(0))
    ts2, hook2 = checkpoint.load(out, tmpl)
    chain, info = load_reference_best_actor(f"{REF}/KS/KS22/saves")
    for got, want in zip(hook2.best_actor, chain):
        assert np.array_equal(np.asarray(got["w"]), want["w"])
        assert np.array_equal(np.asarray(got["b"]), want["b"])
    for got, want in zip(ts2.agent.actor, ts.agent.actor):
        assert np.array_equal(np.asarray(got["w"]), np.asarray(want["w"]))
    assert hook2.bestreward == pytest.approx(info["bestreward"])
    assert hook2.bestepisode == info["bestepisode"]
    assert len(hook2.rewards) == len(hook.rewards)


def test_best_trace_import():
    """The hook's stored bestDF (PDEhook.jl:54-62) decodes into this
    framework's trace dict and round-trips through the checkpoint, enabling
    --plot-best on imported artifacts."""
    from distributedconvrl_pde_control_tpu.train.reference_import import (
        load_reference_best_trace,
    )

    tr = load_reference_best_trace(f"{REF}/KS/KS22/saves")
    assert tr is not None
    assert tr["y"].shape == (51, 192)
    assert tr["forcing"].shape == (51, 192)
    assert tr["action"].shape == (51, 8)
    assert tr["reward"].shape == (51, 8)
    assert np.isfinite(tr["y"]).all()


def test_imported_best_survives_worse_episodes(tmp_path):
    """rewards_compare is imported from hook.jld2, so continued training
    (--train --resume --import-jld2) can't clobber the imported best with
    the first completed episode (the best gate compares against it,
    PDEhook.jl:66)."""
    from distributedconvrl_pde_control_tpu import configs as C
    from distributedconvrl_pde_control_tpu.train.reference_import import (
        import_reference_checkpoint,
        load_reference_best_actor,
    )

    setup = C.build_ks(C.KS22)
    ts, hook = import_reference_checkpoint(f"{REF}/KS/KS22/saves", setup)
    assert len(hook.rewards_compare) > 0
    _, info = load_reference_best_actor(f"{REF}/KS/KS22/saves")
    assert max(hook.rewards_compare) == pytest.approx(info["bestreward"])

    class R:  # a worse completed episode
        reward_sum = np.float32(info["bestreward"] - 2.0)
        completed = np.bool_(True)
        steps = np.int32(50)

    hook.collect_best_trace = False
    before = [np.asarray(l["w"]).copy() for l in hook.best_actor]
    hook.on_episode(R(), ts.agent)
    assert hook.bestreward == pytest.approx(info["bestreward"])
    for got, want in zip(hook.best_actor, before):
        assert np.array_equal(np.asarray(got["w"]), want)


def test_batched_warm_start_splices_networks():
    """train_batched(warm_start=...) seeds the agent and the on-device best
    snapshot with the imported chains (the --batched --import-jld2
    'migrate and improve' path)."""
    from distributedconvrl_pde_control_tpu import configs as C
    from distributedconvrl_pde_control_tpu.train.batched import (
        BatchedTrainer,
        BatchedTrainerConfig,
        train_batched,
    )
    from distributedconvrl_pde_control_tpu.train.reference_import import (
        load_warm_start,
    )

    setup = C.build_ks(C.KS22)
    warm = load_warm_start(f"{REF}/KS/KS22/saves")
    assert set(warm) == {"actor", "critic", "target_actor", "target_critic"}
    trainer = BatchedTrainer(setup.env, setup.agent,
                             BatchedTrainerConfig(n_envs=4, batch_size=8))
    ts, hook, _ = train_batched(trainer, total_steps=0, warm_start=warm,
                                key=jax.random.PRNGKey(0))
    for name in ("actor", "critic", "target_actor", "target_critic"):
        for got, want in zip(getattr(ts.agent, name), warm[name]):
            assert np.array_equal(np.asarray(got["w"]), want["w"])
    for got, want in zip(ts.best_actor, warm["actor"]):
        assert np.array_equal(np.asarray(got["w"]), want["w"])


def test_checked_in_mono_y0_matches_reference_jld2():
    """Provenance: configs/data_ks_global_y0.npy is bit-for-bit the
    reference's stored fixed initial condition (KSglobalSetup.jl:62
    y0.jld2), re-read through the generic JLD2 loader."""
    from distributedconvrl_pde_control_tpu.utils.jld2 import (
        julia_array,
        load_jld2,
    )

    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    stored = np.load(os.path.join(
        pkg, "distributedconvrl_pde_control_tpu", "configs",
        "data_ks_global_y0.npy"))
    fresh = julia_array(load_jld2(
        f"{REF}/KS/KS22_global-agent/y0.jld2", "y0"))
    assert np.allclose(stored, np.asarray(fresh, np.float64))


def test_import_shape_mismatch_raises(tmp_path):
    """Importing a saves dir against the WRONG preset fails loudly with the
    shape diagnostic, not silently."""
    from distributedconvrl_pde_control_tpu import configs as C
    from distributedconvrl_pde_control_tpu.train.reference_import import (
        import_reference_checkpoint,
    )

    setup = C.build_fluid(C.FLUID_8)
    with pytest.raises(ValueError, match="do not match"):
        import_reference_checkpoint(f"{REF}/KS/KS22_global-agent/saves", setup)
