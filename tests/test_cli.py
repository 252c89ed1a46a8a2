"""Experiment CLI smoke tests (train -> eval round trip on CPU)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*args, cwd):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable, "-m", "distributedconvrl_pde_control_tpu.experiments.run", *args],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=600,
    )


@pytest.mark.slow
def test_cli_train_then_eval(tmp_path):
    out = str(tmp_path / "run")
    r = run_cli("KS22", "--train", "--cpu", "--loops", "3", "--no-steps", "200",
                "--out", out, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(out, "saves", "agent.msgpack"))
    assert os.path.exists(os.path.join(out, "rewards.png"))

    r = run_cli("KS22", "--eval", "--cpu", "--out", out, "--p-te", "30",
                "--p-t-action", "15", "--live", cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    body = r.stdout.strip().splitlines()
    stats = json.loads(next(l for l in body if l.startswith("{")))
    assert stats["pre_control_mean_abs_dev"] > 0
    assert os.path.exists(os.path.join(out, "heat.png"))
    # --live streamed terminal frames after the stats line (non-TTY: no sleeps)
    assert any(l.startswith("step ") for l in body)


@pytest.mark.slow
def test_cli_sharded_train_eval_resume(tmp_path):
    """The --mesh path: preset-driven sharded training on a virtual 2x4
    mesh, standard-format checkpoint, sharded eval, resume."""
    out = str(tmp_path / "run")
    common = ["Fluid_8", "--mesh", "2x4", "--virtual-devices", "8",
              "--nx", "16", "--horizon", "0.4", "--n-envs", "4", "--out", out]
    r = run_cli(*common, "--train", "--loops", "1", "--no-steps", "20",
                "--chunk-len", "10", "--capacity-per-dp", "2048", cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(out, "saves", "agent_light.msgpack"))
    assert "best reward" in r.stdout

    r = run_cli(*common, "--eval", cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["mesh"] == "2x4" and stats["trained"] > 0

    r = run_cli(*common, "--train", "--loops", "1", "--no-steps", "10",
                "--chunk-len", "10", "--capacity-per-dp", "2048", "--resume",
                cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "resuming from ep" in r.stdout


@pytest.mark.slow
def test_cli_resume(tmp_path):
    out = str(tmp_path / "run")
    r = run_cli("KS22", "--train", "--cpu", "--loops", "1", "--no-steps", "100",
                "--out", out, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    r = run_cli("KS22", "--train", "--cpu", "--loops", "1", "--no-steps", "100",
                "--out", out, "--resume", cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "resuming from ep" in r.stdout


@pytest.mark.slow
def test_cli_coarse_preset_batched_train_cross_grid_eval(tmp_path):
    """KS22_64 coarse tier (configs/ks.py): batched training on the 64-point
    grid, then evaluation of the SAME checkpoint on the standard 192-grid
    env — the cross-resolution flow behind artifacts/KS22_64."""
    out = str(tmp_path / "run64")
    r = run_cli("KS22_64", "--train", "--batched", "--cpu", "--n-envs", "32",
                "--total-steps", "120", "--out", out, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(out, "saves", "agent_light.msgpack"))

    r = run_cli("KS22", "--eval", "--cpu", "--load-from", out, "--out", out,
                "--p-te", "20", "--p-t-action", "10", cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["pre_control_mean_abs_dev"] > 0  # ran on the 192 grid


@pytest.mark.slow
def test_cli_config_overrides_roundtrip(tmp_path):
    """The hyperopt-winner flow, end to end from the CLI: train a preset at
    --config-overrides (off-preset network shape), the checkpoint ships the
    deltas as config_overrides.json, and --load-from rebuilds the matching
    template (without it the msgpack layer-count/shape check fails)."""
    out = str(tmp_path / "winner")
    overrides = '{"nna_scale": 2.0, "drop_middle_layer": false, "batch_size": 8}'
    r = run_cli("KS22", "--train", "--cpu", "--loops", "1", "--no-steps", "30",
                "--config-overrides", overrides, "--out", out, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "applied config overrides" in r.stdout
    assert os.path.exists(os.path.join(out, "config_overrides.json"))

    from distributedconvrl_pde_control_tpu.train import checkpoint

    assert checkpoint.load_config_overrides(out) == {
        "nna_scale": 2.0, "drop_middle_layer": False, "batch_size": 8}

    r = run_cli("KS22", "--eval", "--cpu", "--load-from", out,
                "--out", str(tmp_path / "evalout"), "--p-te", "10",
                "--p-t-action", "5", cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "applied config overrides" in r.stdout
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["pre_control_mean_abs_dev"] > 0


def test_tp_tier_presets_build():
    """KS `_tp` tier names (the bench.py throughput configuration: etdrk4 +
    matmul_hi + 1-pass-bf16 nonlinear transforms) resolve for every KS
    preset and carry the tier fields into the built solver."""
    from distributedconvrl_pde_control_tpu.experiments.run import build_setup

    for name in ("KS22_tp", "KS200_tp", "KS22_64_tp"):
        setup = build_setup(name)
        solver = setup.env.step_fn.__self__
        assert type(solver).__name__ == "KSSolverETDRK4", name
        assert solver.fft_mode == "matmul_hi", name
        assert solver.nl_fft_mode == "matmul_fast", name
    # the fluid twin resolves through the suffix-tier table
    from distributedconvrl_pde_control_tpu.experiments.run import fluid_config_for

    c = fluid_config_for("Fluid_8_tp")
    assert (c.stepper, c.fft_mode, c.nl_fft_mode) == (
        "ifrk4", "matmul_hi", "matmul_fast")
    assert build_setup("Fluid_8_tp") is not None


def test_serve_probe_smoke():
    """The closed-loop serving probe (experiments/serve.py): loads the
    shipped artifact, compiles the minimal obs->action program, and prints
    ONE JSON line with latency percentiles + headroom."""
    import subprocess
    import sys

    art = os.path.join(REPO, "artifacts", "KS22")
    if not os.path.exists(os.path.join(art, "saves")):
        pytest.skip("artifact not present")
    r = subprocess.run(
        [sys.executable, "-m",
         "distributedconvrl_pde_control_tpu.experiments.serve",
         "KS22", "--load-from", art, "--cpu", "--steps", "5"],
        capture_output=True, text=True, cwd=REPO, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["latency_ms_p50"] > 0 and stats["headroom_x"] > 0


def test_export_controller_roundtrip(tmp_path):
    """AOT deployment artifact (experiments/export_controller.py): export
    the shipped KS22 controller via the CLI, reload the StableHLO blob with
    ONLY load_exported (no setup/checkpoint), and check it computes exactly
    what the live jitted control_step computes."""
    import jax

    art = os.path.join(REPO, "artifacts", "KS22")
    if not os.path.exists(os.path.join(art, "saves")):
        pytest.skip("artifact not present")
    out = str(tmp_path / "ctrl")
    r = run_cli("KS22", "--eval", "--export-controller", out,
                "--load-from", art, "--cpu", cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(out, "controller.stablehlo"))
    manifest = json.load(open(os.path.join(out, "manifest.json")))
    assert manifest["platforms"] == ["cpu", "tpu"]
    assert manifest["control_interval_s"] > 0

    import jax.numpy as jnp
    import numpy as np

    from distributedconvrl_pde_control_tpu.experiments.export_controller import (
        build_control_step,
        load_exported,
    )
    from distributedconvrl_pde_control_tpu.experiments.run import build_setup
    from distributedconvrl_pde_control_tpu.train import checkpoint
    from distributedconvrl_pde_control_tpu.train.loop import init_train_state

    exp, _ = load_exported(out)
    setup = build_setup("KS22")
    template = init_train_state(setup.env, setup.agent, jax.random.PRNGKey(0))
    ts, hook = checkpoint.load(art, template)
    actor = jax.tree.map(jnp.asarray, hook.best_actor or ts.agent.actor)
    live = jax.jit(build_control_step(setup, actor))

    est = setup.env.reset()
    a_live, obs_live = live(est.y, est.obs)
    a_exp, obs_exp = exp.call(est.y, est.obs)
    np.testing.assert_array_equal(np.asarray(a_live), np.asarray(a_exp))
    np.testing.assert_array_equal(np.asarray(obs_live), np.asarray(obs_exp))

    # and the serving probe runs framework-free off the artifact
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m",
         "distributedconvrl_pde_control_tpu.experiments.serve",
         "KS22", "--from-export", out, "--cpu", "--steps", "5"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["latency_ms_p50"] > 0 and stats["headroom_x"] > 0


def test_export_controller_other_families(tmp_path):
    """The export path is family-generic: Keller-Segel (2-field FD env,
    rectangle kernels) and fluid (spectral ri state) controllers export and
    reload to the same outputs as the live program."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from distributedconvrl_pde_control_tpu.experiments.export_controller import (
        build_control_step,
        export_controller,
        load_exported,
    )
    from distributedconvrl_pde_control_tpu.experiments.run import build_setup
    from distributedconvrl_pde_control_tpu.train import checkpoint
    from distributedconvrl_pde_control_tpu.train.loop import init_train_state

    for preset in ("KellerSegel10_16_fast", "Fluid_8"):
        art = os.path.join(REPO, "artifacts", preset)
        if not os.path.exists(os.path.join(art, "saves")):
            pytest.skip(f"artifact {preset} not present")
        setup = build_setup(preset)
        template = init_train_state(setup.env, setup.agent,
                                    jax.random.PRNGKey(0))
        ts, hook = checkpoint.load(art, template)
        actor = jax.tree.map(jnp.asarray, hook.best_actor or ts.agent.actor)
        out = str(tmp_path / preset)
        export_controller(setup, actor, out, preset=preset)
        exp, manifest = load_exported(out)
        est = setup.env.reset()
        a_live, _ = jax.jit(build_control_step(setup, actor))(est.y, est.obs)
        a_exp, _ = exp.call(est.y, est.obs)
        np.testing.assert_array_equal(np.asarray(a_live), np.asarray(a_exp))
        assert manifest["preset"] == preset

@pytest.mark.slow
def test_cli_train_multi_sharded(tmp_path):
    """--train-multi under --mesh (round-3 verdict item 8): the endless-
    restart protocol (FluidSetup.jl:559-601 / KSSetup.jl:321-363) drives the
    sharded trainer with numbered standard-format saves per experiment."""
    out = str(tmp_path / "run")
    r = run_cli("Fluid_8", "--train-multi", "--mesh", "1x1",
                "--virtual-devices", "1", "--nx", "16", "--horizon", "0.4",
                "--n-envs", "2", "--no-episodes", "4", "--n-experiments", "2",
                "--chunk-len", "10", "--capacity-per-dp", "2048",
                "--out", out, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "best rewards per experiment" in r.stdout
    assert "STARTING EXPERIMENT # 2" in r.stdout
    for n in (1, 2):
        assert os.path.exists(
            os.path.join(out, "saves", f"agent_light{n}.msgpack"))
        assert os.path.exists(os.path.join(out, "saves", f"hook{n}.npz"))


@pytest.mark.slow
def test_cli_population_train_then_eval_member(tmp_path):
    """--population: P members train as one fused program, each saved as a
    standard checkpoint that the plain --eval path loads."""
    out = str(tmp_path / "pop")
    r = run_cli("KS22", "--train", "--batched", "--cpu", "--population", "2",
                "--total-steps", "40", "--chunk-len", "20", "--n-envs", "4",
                "--learner-batch", "16", "--eval-every", "20",
                "--eval-steps", "10", "--seed", "59",
                "--pop-overrides", '{"act_noise": [1.2, 0.3]}',
                "--out", out, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.load(open(os.path.join(out, "population.json")))
    assert summary["n_members"] == 2
    assert len(summary["ranking"]) == 2
    dirs = sorted(row["dir"] for row in summary["ranking"])
    assert dirs == ["member_00", "member_01"]
    member = os.path.join(out, dirs[0])
    r = run_cli("KS22", "--eval", "--cpu", "--load-from", member, "--p-te",
                "10", "--p-t-action", "5", "--out", str(tmp_path / "ev"),
                cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads(next(l for l in r.stdout.strip().splitlines()
                            if l.startswith("{")))
    assert stats["pre_control_mean_abs_dev"] > 0


def test_held_out_eval_pool_extension_contract():
    """`--eval-pool N` must EXTEND the narrower pool, never reshuffle it:
    pool(N)[:M] == pool(M), and the held-out stream stays disjoint from the
    training pool. The r05 coverage diagnostic (RESULTS.md: the residual
    member's trigger appearing only in ICs 32-127) is only an
    apples-to-apples statement because of this contract."""
    import jax
    import numpy as np

    from distributedconvrl_pde_control_tpu.configs.keller_segel import (
        KELLER_SEGEL_10_16_FAST,
        build_keller_segel,
    )
    from distributedconvrl_pde_control_tpu.experiments.run import (
        held_out_eval_pool,
    )

    setup = build_keller_segel(KELLER_SEGEL_10_16_FAST)
    p8 = np.asarray(held_out_eval_pool(setup, 8))
    p16 = np.asarray(held_out_eval_pool(setup, 16))
    assert p8.shape[0] == 8 and p16.shape[0] == 16
    assert np.array_equal(p16[:8], p8)
    # held-out stream is disjoint from the training pool's key stream
    tkeys = jax.random.split(jax.random.PRNGKey(setup.seed), 8)
    train8 = np.stack([np.asarray(setup.random_init(k)) for k in tkeys])
    assert not any(
        np.array_equal(train8[i], p8[j]) for i in range(8) for j in range(8))


def test_cli_population_eval_pool_flag(tmp_path):
    """--eval-warmup + --eval-pool drive a population run end-to-end (the
    full r05 OOD selection protocol at toy scale)."""
    out = str(tmp_path / "pop")
    r = run_cli("KS22", "--train", "--batched", "--cpu", "--population", "2",
                "--total-steps", "40", "--chunk-len", "20", "--n-envs", "4",
                "--learner-batch", "16", "--eval-every", "20",
                "--eval-steps", "10", "--eval-warmup", "5",
                "--eval-score", "min", "--eval-pool", "8", "--seed", "59",
                "--out", out, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.load(open(os.path.join(out, "population.json")))
    assert summary["n_members"] == 2
    assert all(len(row["evals"]) == 2 for row in summary["ranking"])
