"""CLI driver for all shipped experiment presets.

Train mode mirrors each reference script's `train(); save()`; eval mode
mirrors `load(); plot_heat(...)` (KS-family, plotting.jl protocol: long
horizon, actuation delayed to halfway) or `load(); testrun(use_best=true)`
(fluid, energy vs baselines).
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np


# suffix tiers derivable from any fluid base preset (ONE table for the
# single-chip and --mesh paths — the round-2 advisor flagged the two
# hand-maintained copies drifting):
#   _fast      = integrating-factor RK4 throughput tier (PERFORMANCE.md ladder)
#   _tp        = _fast + bf16 transform tiers (3-pass everywhere, 1-pass on
#                the advection evaluations — error enters scaled by dt_os;
#                PERFORMANCE.md nl-tier ladder); quality-gated like _fast
#   _fixedstep = the reference's do_step fixed-step RK4 (FluidSetup.jl:163-172;
#                presets default to the installed adaptive do_step2, :333)
#   _eval      = evaluation protocol (nx=256, seed 76; FluidSetup.jl:32-37)
_FLUID_TIERS = {
    "_fast": dict(adaptive=False, stepper="ifrk4"),
    "_tp": dict(adaptive=False, stepper="ifrk4", fft_mode="matmul_hi",
                nl_fft_mode="matmul_fast"),
    "_fixedstep": dict(adaptive=False),
    "_eval": dict(evaluation=True),
}


def fluid_config_for(name: str):
    """The raw FluidConfig behind a fluid preset name — base presets plus
    any `_fast`/`_fixedstep`/`_eval` tier of them. Used by both the
    single-chip builders and the `--mesh` sharded path."""
    import dataclasses

    from distributedconvrl_pde_control_tpu import configs as C

    bases = {
        "Fluid_8": C.FLUID_8,
        "Fluid_16": C.FLUID_16,
        "Fluid_32": C.FLUID_32,
        "Fluid_8_256": C.FLUID_8_256,
        "Fluid_16_256": C.FLUID_16_256,
    }
    if name in bases:
        return bases[name]
    for suffix, over in _FLUID_TIERS.items():
        if name.endswith(suffix) and name[: -len(suffix)] in bases:
            return dataclasses.replace(bases[name[: -len(suffix)]],
                                       name=name, **over)
    return None


def keller_segel_config_for(name: str):
    """The KellerSegelConfig behind a Keller-Segel preset name (base +
    `_fast` solver tier), for the `--mesh` sharded path."""
    from distributedconvrl_pde_control_tpu.configs.keller_segel import (
        KELLER_SEGEL_10_16,
        KELLER_SEGEL_10_16_FAST,
    )

    return {
        "KellerSegel10_16": KELLER_SEGEL_10_16,
        "KellerSegel10_16_fast": KELLER_SEGEL_10_16_FAST,
    }.get(name)


# KS `_tp` tier = the measured single-chip THROUGHPUT configuration
# (bench.py): ETDRK4 stepper + 3-pass-bf16 DFTs + 1-pass-bf16 nonlinear
# transforms (error enters scaled by the O(h) phi-weights; 1.28x over
# matmul_hi alone, accuracy ladder in PERFORMANCE.md). Policies trained
# here are evaluated on the STANDARD fidelity env.
_KS_TP = dict(stepper="etdrk4", fft_mode="matmul_hi", nl_fft_mode="matmul_fast",
              spectral_carry=True)


def build_setup(name: str, config_overrides=None):
    """Build the Setup behind a preset name. `config_overrides` (a dict of
    config-dataclass fields, e.g. from an artifact's config_overrides.json —
    checkpoint.load_config_overrides) is applied to the preset config before
    building, so artifacts trained off-preset (hyperopt winners) rebuild the
    matching network/replay template."""
    import dataclasses

    from distributedconvrl_pde_control_tpu import configs as C

    builders = {
        "KS22": (C.build_ks, lambda: C.KS22),
        "KS200": (C.build_ks, lambda: C.KS200),
        "KS500": (C.build_ks, lambda: C.KS500),
        "KS200_disturbed": (C.build_ks, lambda: C.KS200_DISTURBED),
        "KS22_64": (C.build_ks, lambda: C.KS22_64),
        "KS22_global": (C.build_ks_global, lambda: C.KS22_GLOBAL),
        "KellerSegel10_16": (C.build_keller_segel,
                             lambda: C.KELLER_SEGEL_10_16),
        # throughput tier: 10 solver substeps (validated at the f32 accuracy
        # floor of the 50-substep reference budget; configs.keller_segel)
        "KellerSegel10_16_fast": (C.build_keller_segel,
                                  lambda: C.KELLER_SEGEL_10_16_FAST),
    }
    for ks_name, ks_cfg in [("KS22", C.KS22), ("KS200", C.KS200),
                            ("KS500", C.KS500), ("KS22_64", C.KS22_64)]:
        # measured per grid: the spectral carry wins at nx>=192 (fewer
        # boundary transforms) but REGRESSES the 64-point coarse tier 6%
        # (nxh=33 pads to 128 lanes, so the carry doubles carried-state
        # bytes for tiny transform savings — PERFORMANCE.md coarse note)
        tier = dict(_KS_TP, spectral_carry=(ks_cfg.nx >= 192))
        builders[ks_name + "_tp"] = (
            C.build_ks,
            lambda c=ks_cfg, n=ks_name, t=tier: dataclasses.replace(
                c, name=n + "_tp", **t))
    for fluid_name in ["Fluid_8", "Fluid_16", "Fluid_32", "Fluid_8_256",
                       "Fluid_16_256", "Fluid_16_256_fast",
                       "Fluid_8_fast", "Fluid_16_fast", "Fluid_32_fast",
                       "Fluid_8_256_fast", "Fluid_8_fixedstep",
                       "Fluid_8_tp", "Fluid_16_tp", "Fluid_32_tp",
                       "Fluid_8_256_tp", "Fluid_16_256_tp",
                       "Fluid_8_eval", "Fluid_16_eval", "Fluid_32_eval"]:
        builders[fluid_name] = (C.build_fluid,
                                lambda n=fluid_name: fluid_config_for(n))
    if name not in builders:
        raise SystemExit(f"unknown preset {name}; choose from {sorted(builders)}")
    build_fn, cfg_fn = builders[name]
    cfg = cfg_fn()
    if config_overrides:
        cfg = dataclasses.replace(cfg, **config_overrides)
    return build_fn(cfg)


def held_out_eval_pool(setup, n: int):
    """Held-out generator ICs for the OOD selection eval (`--eval-warmup`):
    a key stream disjoint from the 32-key training pool (folded constant),
    so the selection metric never scores on training-seen fields.

    CONTRACT (pinned by tests/test_cli.py): widening `--eval-pool N` must
    EXTEND the narrower pool, never reshuffle it — `jax.random.split`'s
    prefix property guarantees pool(N)[:M] == pool(M). The measured
    coverage result depends on it: the r05 residual member's fragility
    trigger sits in ~2-3% of generator ICs and appeared only in the
    96-IC extension of the default 32 (RESULTS.md coverage-diagnostic
    table), which is an apples-to-apples statement only because the wider
    pool contains the narrower one.
    """
    ekeys = jax.random.split(
        jax.random.fold_in(jax.random.PRNGKey(setup.seed), 7777), n)
    return jnp.stack([jnp.asarray(setup.random_init(k)) for k in ekeys])


def run_sharded(args) -> None:
    """`--mesh DPxSP` path: the preset trains/evaluates across a
    ('dp', 'sp') device mesh (parallel.multichip), checkpointing in the
    standard format so single-chip eval/resume interoperate."""
    import numpy as np
    from jax.sharding import Mesh

    from distributedconvrl_pde_control_tpu.parallel.multichip import (
        ShardedFluidTrainer,
        ShardedTrainConfig,
        load_actor_for_eval,
        load_sharded,
        save_sharded,
        train_multi_sharded,
        train_sharded,
    )

    cfg = fluid_config_for(args.preset)
    is_ks = cfg is None
    if is_ks:
        cfg = keller_segel_config_for(args.preset)
    if cfg is None:
        raise SystemExit(
            f"--mesh supports fluid presets (incl. _fast/_fixedstep/_eval "
            f"tiers) and KellerSegel10_16[_fast], not {args.preset}")
    import dataclasses

    if args.nx:
        cfg = dataclasses.replace(cfg, nx=args.nx)
    if args.horizon:
        cfg = dataclasses.replace(cfg, te=args.horizon)
    try:
        dp, sp = (int(x) for x in args.mesh.lower().split("x"))
    except ValueError:
        raise SystemExit(f"--mesh wants DPxSP (e.g. 4x2), got {args.mesh!r}")
    devices = jax.devices()
    if len(devices) < dp * sp:
        raise SystemExit(f"mesh {dp}x{sp} needs {dp * sp} devices, have "
                         f"{len(devices)} (hint: --virtual-devices N)")
    mesh = Mesh(np.asarray(devices[: dp * sp]).reshape(dp, sp), ("dp", "sp"))

    tcfg = ShardedTrainConfig(
        n_envs=args.n_envs or dp,
        batch_size=args.learner_batch or 32,
        update_loops=1,
        capacity_per_dp=args.capacity_per_dp or 100_000,
        chunk_len=args.chunk_len or 25,
    )
    if is_ks:
        from distributedconvrl_pde_control_tpu.parallel.multichip_keller_segel import (
            ShardedKellerSegelTrainer,
        )

        trainer = ShardedKellerSegelTrainer(cfg, mesh, tcfg)
    else:
        trainer = ShardedFluidTrainer(cfg, mesh, tcfg)
    out_dir = args.out or os.path.join("runs", args.preset)
    os.makedirs(out_dir, exist_ok=True)

    if args.train_multi:
        # the endless-restart protocol on the mesh (FluidSetup.jl:559-601 /
        # KSSetup.jl:321-363), numbered standard-format saves per experiment
        best = train_multi_sharded(
            trainer, no_episodes=args.no_episodes or 17,
            n_experiments=args.n_experiments,
            seed=args.seed if args.seed is not None else cfg.seed,
            save_fn=lambda n, state, hook: save_sharded(
                out_dir, trainer, state, hook, number=n))
        print("best rewards per experiment:", best)
        return

    if args.train:
        state = hook = None
        if args.resume:
            agent_state, hook = load_sharded(args.load_from or out_dir, trainer)
            state = trainer.init(jax.random.PRNGKey(args.seed or cfg.seed))
            state = state.replace(
                agent=jax.tree.map(jnp.asarray, agent_state),
                ep_count=jnp.asarray(hook.ep - 1, jnp.int32),
                best_reward=jnp.asarray(hook.bestreward, jnp.float32),
                best_episode=jnp.asarray(hook.bestepisode, jnp.int32),
            )
            if hook.best_actor is not None:
                state = state.replace(
                    best_actor=jax.tree.map(jnp.asarray, hook.best_actor))
            print(f"resuming from ep {hook.ep - 1}, best {hook.bestreward:.4f}")
        state, hook = train_sharded(trainer, loops=args.loops,
                                    no_steps=args.no_steps,
                                    seed=args.seed if args.seed is not None else cfg.seed,
                                    state=state, hook=hook,
                                    eval_every=args.eval_every,
                                    eval_steps=args.eval_steps)
        save_sharded(out_dir, trainer, state, hook)
        print(hook.ascii_curve())
        if getattr(hook, "evals", None):
            print("evals:", [(s, round(r, 4)) for s, r in hook.evals])
        print(f"saved to {out_dir}; best reward {hook.bestreward:.4f} "
              f"@ ep {hook.bestepisode} (mesh {dp}x{sp}, "
              f"grid {getattr(cfg, 'grid_nx', cfg.nx)})")
        return

    # --eval: sharded testrun — trained policy vs no-action, masked energies
    actor = load_actor_for_eval(args.load_from or out_dir, trainer)
    n_steps = int(round((args.p_te or cfg.te) / cfg.dt))
    t_act = int(round((args.p_t_action or 0.0) / cfg.dt))
    ev = trainer.make_eval_fn(n_steps, t_action_steps=t_act)
    w0 = trainer.eval_w0(tcfg.n_envs)
    energies = {}
    for label, a, ta in [("trained", actor, t_act), ("no action", actor, n_steps)]:
        ev_fn = ev if ta == t_act else trainer.make_eval_fn(n_steps, t_action_steps=ta)
        recs = ev_fn(a, w0)
        e = np.asarray(recs["energy"])
        m = np.asarray(recs["active"])
        energies[label] = float(e[m].mean()) if m.any() else float("nan")
    print(json.dumps({"mesh": f"{dp}x{sp}",
                      "grid": getattr(cfg, "grid_nx", cfg.nx), **energies}))


def run_dp_batched(args):
    """`--batched --mesh N[x1]`: the flagship throughput trainer
    (train/batched.py) data-parallel over a pure-dp device mesh
    (parallel/batched_dp.py) — any preset build_setup knows, global env
    batch split across devices, gradients pmean'd, standard single-chip
    checkpoint format (so --eval / --load-from interoperate unchanged)."""
    import dataclasses as _dc

    import numpy as np

    from distributedconvrl_pde_control_tpu.agents.ddpg import DDPGAgent
    from distributedconvrl_pde_control_tpu.agents.replay import replay_init
    from distributedconvrl_pde_control_tpu.parallel.batched_dp import (
        DPBatchedTrainer,
        dp_mesh,
    )
    from distributedconvrl_pde_control_tpu.train import checkpoint
    from distributedconvrl_pde_control_tpu.train.batched import (
        BatchedTrainerConfig,
        train_batched,
    )
    from distributedconvrl_pde_control_tpu.train.loop import TrainState

    if not args.train:
        raise SystemExit("--batched --mesh is a training mode; the saved "
                         "checkpoint is standard single-chip format — eval "
                         "it without --mesh")
    spec = args.mesh.lower().split("x")
    n_dp = int(spec[0])
    if len(spec) > 1 and int(spec[1]) != 1:
        raise SystemExit(f"--batched shards over dp only; use --mesh {n_dp} "
                         f"or {n_dp}x1, got {args.mesh!r}")
    if len(jax.devices()) < n_dp:
        raise SystemExit(f"mesh {n_dp}x1 needs {n_dp} devices, have "
                         f"{len(jax.devices())} (hint: --virtual-devices N)")

    overrides = (checkpoint.load_config_overrides(args.load_from)
                 if args.load_from else None)
    if args.config_overrides:
        raw = args.config_overrides
        explicit = (json.loads(raw) if raw.lstrip().startswith("{")
                    else json.load(open(raw)))
        overrides = {**(overrides or {}), **explicit}
    setup = build_setup(args.preset, overrides)
    if args.capacity:
        setup = _dc.replace(
            setup, agent=DDPGAgent(_dc.replace(setup.agent.cfg,
                                               capacity=args.capacity)))
    n_envs = args.n_envs or 256
    pool = None
    if setup.random_init is not None:
        keys = jax.random.split(jax.random.PRNGKey(setup.seed), 32)
        pool = jnp.stack([jnp.asarray(setup.random_init(k)) for k in keys])
    # --eval-warmup on the dp mesh uses the same held-out IC stream as the
    # single-host path (without this the eval would gather from y0_pool —
    # training-seen fields, defeating the OOD selection protocol)
    eval_pool = None
    if args.eval_warmup and setup.random_init is not None:
        eval_pool = held_out_eval_pool(setup, args.eval_pool)
    trainer = DPBatchedTrainer(
        setup.env, setup.agent,
        BatchedTrainerConfig(n_envs=n_envs,
                             batch_size=args.learner_batch or 256,
                             update_loops=args.update_loops,
                             min_best_episode=setup.min_best_episode),
        dp_mesh(n_dp), y0_pool=pool, eval_y0_pool=eval_pool,
    )
    ts, hook, means = train_batched(
        trainer, total_steps=args.total_steps,
        key=jax.random.PRNGKey(args.seed if args.seed is not None else setup.seed),
        noise_decay_every=args.noise_every or max(1, args.total_steps // setup.loops),
        noise_decay=args.noise_decay if args.noise_decay is not None else setup.noise_decay,
        chunk_len=args.chunk_len or 50,
        verbose=True, eval_every=args.eval_every, eval_steps=args.eval_steps,
        eval_warmup_steps=args.eval_warmup, eval_score=args.eval_score)
    out_dir = args.out or os.path.join("runs", args.preset)
    os.makedirs(out_dir, exist_ok=True)
    acfg = setup.agent.cfg
    # all saved leaves are replicated across the mesh -> standard format
    ts_std = TrainState(agent=jax.tree.map(np.asarray, ts.agent),
                        replay=replay_init(1, acfg.ns, acfg.na_rows),
                        key=np.asarray(ts.key[0]))
    checkpoint.save(out_dir, ts_std, hook, include_replay=False,
                    config_overrides=overrides, backend=args.ckpt_backend)
    print(hook.ascii_curve())
    print(f"saved to {out_dir}; best reward {hook.bestreward:.4f} @ ep "
          f"{hook.bestepisode}; {int(ts.total_env_steps)} env steps over "
          f"dp={n_dp}, final chunk mean {means[-1]:.4f}")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("preset")
    mode = ap.add_mutually_exclusive_group(required=True)
    mode.add_argument("--train", action="store_true")
    mode.add_argument("--eval", action="store_true")
    mode.add_argument("--train-multi", action="store_true")
    mode.add_argument("--hyperopt", type=int, metavar="N_TRIALS", default=None,
                      help="random hyperparameter search: N trials scored by "
                           "the test_setup objective (KSglobalSetup.jl:405)")
    ap.add_argument("--hyperopt-episodes", type=int, default=30,
                    help="episodes per hyperopt trial (reference uses 100)")
    ap.add_argument("--hyperopt-robust", type=int, metavar="N_INITS",
                    default=None,
                    help="score trials with the OOD-robust objective instead "
                         "of the reference's test_setup cost: after training, "
                         "the trial's best policy is evaluated "
                         "deterministically on N_INITS held-out random "
                         "initial conditions (fixes the measured blind spot "
                         "where test_setup winners don't transfer OOD — "
                         "RESULTS.md)")
    ap.add_argument("--ckpt-backend", choices=("msgpack", "orbax"),
                    default="msgpack",
                    help="TrainState serialization for --train saves: the "
                         "default flax-msgpack file or an orbax.checkpoint "
                         "directory (load auto-detects either)")
    ap.add_argument("--loops", type=int, default=None)
    ap.add_argument("--no-steps", type=int, default=None)
    ap.add_argument("--n-experiments", type=int, default=2,
                    help="--train-multi restart count; 0 = restart endlessly "
                         "(the reference's `while true` budget, KSSetup.jl:322)")
    ap.add_argument("--no-episodes", type=int, default=None,
                    help="--train-multi episodes per experiment (default "
                         "2800 = KSSetup.jl:325 single-chip; 17 = "
                         "FluidSetup.jl:559 for the --mesh path)")
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--out", default=None, help="run directory (default runs/<preset>)")
    ap.add_argument("--load-from", default=None,
                    help="load a checkpoint from another run dir (zero-shot transfer)")
    ap.add_argument("--import-jld2", default=None, metavar="SAVES_DIR",
                    help="import a reference-format JLD2 checkpoint dir "
                         "(agent.jld2/hook.jld2, KSSetup.jl:378-402) instead "
                         "of --load-from; converts it to the standard light "
                         "checkpoint in --out, then evaluates it")
    ap.add_argument("--config-overrides", default=None, metavar="JSON",
                    help="config-dataclass overrides applied to the preset "
                         "before building — an inline JSON object or a path "
                         "to a .json file (e.g. a --hyperopt winner). Saved "
                         "checkpoints ship the deltas as "
                         "config_overrides.json so --load-from rebuilds the "
                         "matching template")
    ap.add_argument("--resume", action="store_true",
                    help="continue training from the run dir's checkpoint "
                         "(the reference's load(); train() flow)")
    ap.add_argument("--p-te", type=float, default=None,
                    help="eval horizon (plot_heat p_te; default 200 for KS-family, "
                         "6 for fluid, 12 for Keller-Segel)")
    ap.add_argument("--p-t-action", type=float, default=None,
                    help="eval actuation start time (default p_te/2; 0 for fluid, "
                         "matching testrun)")
    ap.add_argument("--video", action="store_true", help="render an mp4 of the eval rollout")
    ap.add_argument("--live", action="store_true",
                    help="animate the eval rollout live in the terminal "
                         "(the headless stand-in for the reference's Blink "
                         "window, plotting.jl:306-521)")
    ap.add_argument("--fps", type=float, default=16.0,
                    help="--live/--video frame rate")
    ap.add_argument("--random-init", action="store_true",
                    help="evaluate from a random initial condition (the hook's "
                         "use_random_init flow) instead of the standard y0")
    ap.add_argument("--plot-separate", action="store_true",
                    help="write each heat panel as its own figure "
                         "(plot_heat plot_separate, plotting.jl:4)")
    ap.add_argument("--from-step", type=int, default=0,
                    help="heatmap window start (plot_heat `from`)")
    ap.add_argument("--to-step", type=int, default=None,
                    help="heatmap window end (plot_heat `to`)")
    ap.add_argument("--serve", action="store_true",
                    help="after loading, run the closed-loop serving probe "
                         "(experiments.serve latency report) instead of plots")
    ap.add_argument("--export-controller", metavar="DIR", default=None,
                    help="with --eval: AOT-export the deployed obs->action "
                         "program (weights baked in) as a jax.export/StableHLO "
                         "artifact for cpu+tpu (experiments/export_controller.py)")
    ap.add_argument("--plot-best", action="store_true",
                    help="render the stored best-episode trace instead of a fresh "
                         "rollout (plot_heat(plot_best=true), plotting.jl)")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--mesh", default=None,
                    help="train/eval the preset across a DPxSP device mesh "
                         "(fluid presets; e.g. --mesh 4x2)")
    ap.add_argument("--virtual-devices", type=int, default=None,
                    help="force the CPU backend with N virtual devices "
                         "(exercise --mesh without a multi-chip slice)")
    ap.add_argument("--n-envs", type=int, default=None,
                    help="global env batch for --mesh runs (default: dp)")
    ap.add_argument("--chunk-len", type=int, default=None,
                    help="fused steps per host round-trip for --mesh runs")
    ap.add_argument("--learner-batch", type=int, default=None,
                    help="DDPG learner batch for --mesh runs (default 32)")
    ap.add_argument("--capacity-per-dp", type=int, default=None,
                    help="replay capacity per dp shard for --mesh runs")
    ap.add_argument("--nx", type=int, default=None,
                    help="override the fluid grid size for --mesh runs")
    ap.add_argument("--horizon", type=float, default=None,
                    help="override the episode horizon te for --mesh runs")
    ap.add_argument("--ppo", action="store_true",
                    help="use the PPO agent variant (create_agent_ppo parity) "
                         "instead of DDPG; train saves saves/ppo.msgpack, "
                         "eval rolls out the deterministic mean policy")
    ap.add_argument("--iters", type=int, default=60,
                    help="PPO collect+update iterations for --ppo training")
    ap.add_argument("--ppo-ref", action="store_true",
                    help="with --ppo: run the reference-exact protocol "
                         "(PPOConfig factory defaults = PDEagent.jl:462-512 — "
                         "10 epochs x 32 microbatches, lr 1e-3, "
                         "update_freq-sized rollout) instead of the tuned "
                         "lighter config")
    ap.add_argument("--batched", action="store_true",
                    help="train with the throughput configuration (vmapped "
                         "env batch, fused chunks) instead of the fidelity "
                         "loop; saves the same checkpoint format")
    ap.add_argument("--total-steps", type=int, default=2000,
                    help="fused env steps for --batched training")
    ap.add_argument("--population", type=int, default=None, metavar="P",
                    help="--train --batched: train P population members "
                         "(independent runs / hyper-variants) as ONE fused "
                         "program — members flattened member-major into "
                         "the env axis, only the per-member networks "
                         "vmapped (train/population.py) — so the "
                         "multi-seed study runs at the big-batch rate. "
                         "Members save as standard checkpoints under "
                         "OUT/member_XX plus a population.json ranking. "
                         "Composes with --mesh N: the study shards over a "
                         "pure-dp mesh (per-member envs split across "
                         "devices, per-member gradients pmean'd)")
    ap.add_argument("--pop-overrides", default=None, metavar="JSON",
                    help="per-member variation for --population: a JSON "
                         "object (inline or a file path) of P-length "
                         "lists for any of act_noise / noise_decay / "
                         "learning_rate / learning_rate_critic")
    ap.add_argument("--update-loops", type=int, default=1,
                    help="--batched-family gradient steps per fused env "
                         "step (the reference's update_loops, 20 in "
                         "fidelity mode; the batched default 1 relies on "
                         "the huge per-step batch instead — families with "
                         "LONG episodes may need gradient-budget parity)")
    ap.add_argument("--pop-search", type=int, default=None, metavar="N",
                    help="--train --batched: random search over the "
                         "schedule/optimizer axes (act_noise, noise_decay, "
                         "actor/critic lr), N trials run in fused "
                         "population rounds of --population (default 8) "
                         "members, each scored by its eval-driven best "
                         "(long-horizon with --eval-steps past te). Writes "
                         "search.json + the winner as a standard "
                         "checkpoint in --out")
    ap.add_argument("--eval-steps", type=int, default=50,
                    help="deterministic-eval rollout length (env steps) for "
                         "--batched/--mesh --eval-every runs. Beyond te/dt "
                         "the eval runs on a horizon-overridden env clone "
                         "(the sharded eval scan has no te cap), so e.g. "
                         "500 on KS measures 500 REAL steps of stabilization "
                         "(the plot_heat long-horizon metric) and drives "
                         "best-actor selection on it")
    ap.add_argument("--eval-every", type=int, default=0,
                    help="deterministic eval cadence for --batched and "
                         "--mesh training (fused steps) and --ppo training "
                         "(iterations); evals drive best-actor/params "
                         "selection")
    ap.add_argument("--eval-warmup", type=int, default=0, metavar="K",
                    help="--batched/--population/--pop-search: evolve the "
                         "eval IC batch UNCONTROLLED for K steps before the "
                         "actor engages, scoring only the controlled "
                         "segment — the OOD/delayed-actuation selection "
                         "protocol (plot_heat actuates at te/2 on a "
                         "developed state; the warmup-0 eval measured "
                         "robust-looking Keller-Segel members that fail "
                         "exactly there, RESULTS.md r05 KS-S table)")
    ap.add_argument("--eval-pool", type=int, default=32, metavar="N",
                    help="--eval-warmup: how many held-out generator ICs the "
                         "eval pool draws (default 32). Worst-case selection "
                         "(--eval-score min) is bounded by the pool's "
                         "failure-mode coverage — widen it for "
                         "robustness-critical selection")
    ap.add_argument("--eval-score", choices=["mean", "min"], default="mean",
                    help="--batched/--population/--pop-search eval reduction: "
                         "'mean' = pooled mean step reward; 'min' = WORST-CASE "
                         "(min over per-env masked means) — selects for "
                         "robustness across eval ICs; built after measuring "
                         "that mean scoring dilutes a 1-in-32-IC catastrophic "
                         "failure to invisibility (RESULTS.md r05 KS-S "
                         "OOD-selection A/B)")
    ap.add_argument("--noise-every", type=int, default=None,
                    help="--batched noise-decay cadence in steps "
                         "(default total_steps/loops)")
    ap.add_argument("--noise-decay", type=float, default=None,
                    help="--batched noise-decay factor (default the "
                         "preset's per-loop decay)")
    ap.add_argument("--capacity", type=int, default=None,
                    help="--batched replay capacity override (the preset's "
                         "single-env size wraps in minutes at batched push "
                         "rates: n_envs*n_act transitions per step)")
    ap.add_argument("--profile", action="store_true",
                    help="capture a jax.profiler trace of one training loop "
                         "into <out>/profile/ and print per-phase timings")
    args = ap.parse_args(argv)

    if args.virtual_devices:
        # must precede the first backend query; the axon plugin may force-
        # register itself at import, so re-point explicitly (same dance as
        # __graft_entry__.dryrun_multichip)
        jax.config.update("jax_platforms", "cpu")
        if jax.default_backend() != "cpu" or jax.device_count() < args.virtual_devices:
            from jax.extend.backend import clear_backends

            clear_backends()
            jax.config.update("jax_num_cpu_devices", args.virtual_devices)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if jax.default_backend() in ("tpu", "axon"):
        # cheap-to-compile counter RNG + persistent compile cache: the axon
        # remote compiler is slow on big programs and pathological on the
        # threefry expansion (see bench.py)
        jax.config.update("jax_default_prng_impl", "rbg")
        cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.mesh:
        if args.batched:
            if args.train_multi:
                raise SystemExit("--train-multi --mesh drives the sharded "
                                 "trainers; combine it with a plain --mesh, "
                                 "not --batched")
            if not (args.population or args.pop_search):
                return run_dp_batched(args)
            # population x dp falls through to the --batched population
            # branches below with a dp mesh (train/population.py
            # POPULATION x DP note: every device runs a local
            # mini-population; per-member gradients pmean over dp)
        else:
            return run_sharded(args)

    from distributedconvrl_pde_control_tpu.train import checkpoint
    from distributedconvrl_pde_control_tpu.train.drivers import train, train_multi
    from distributedconvrl_pde_control_tpu.train.eval import actor_policy, energy_trace, rollout
    from distributedconvrl_pde_control_tpu.train.loop import init_train_state
    from distributedconvrl_pde_control_tpu.viz import plotting

    if args.hyperopt:
        from distributedconvrl_pde_control_tpu import configs as C
        from distributedconvrl_pde_control_tpu.train.hyperopt import search

        bases = {
            "KS22_global": (C.KS22_GLOBAL, C.build_ks_global),
            "KS22": (C.KS22, C.build_ks),
            "KS200": (C.KS200, C.build_ks),
            # third family: the reference wires test_setup only to the mono
            # KS script (KSglobalSetup.jl:405-426); extending the protocol
            # to chemotaxis reuses the generic objective unchanged.
            "KellerSegel10_16": (C.KELLER_SEGEL_10_16, C.build_keller_segel),
            "KellerSegel10_16_fast": (C.KELLER_SEGEL_10_16_FAST,
                                      C.build_keller_segel),
        }
        if args.preset not in bases:
            raise SystemExit(f"--hyperopt supports {sorted(bases)}")
        cfg, build_fn = bases[args.preset]
        objective = None
        if args.hyperopt_robust:
            import functools

            from distributedconvrl_pde_control_tpu.train.drivers import (
                hyperopt_objective_robust,
            )
            objective = functools.partial(hyperopt_objective_robust,
                                          n_eval_inits=args.hyperopt_robust)
        search(cfg, build_fn, n_trials=args.hyperopt,
               seed=args.seed if args.seed is not None else 0,
               n_episodes=args.hyperopt_episodes, objective=objective)
        return

    # artifacts trained off-preset (hyperopt winners) ship a
    # config_overrides.json; honoring it here makes them loadable through
    # every CLI mode that takes --load-from (eval/resume/transfer/serve).
    # --config-overrides (inline JSON or a file path) layers on top, so a
    # search winner can be trained straight from the CLI.
    overrides = (checkpoint.load_config_overrides(args.load_from)
                 if args.load_from else None)
    if args.config_overrides:
        raw = args.config_overrides
        explicit = (json.loads(raw) if raw.lstrip().startswith("{")
                    else json.load(open(raw)))
        overrides = {**(overrides or {}), **explicit}
    if overrides and overrides.get("spectral_featurize") and not args.train:
        # trainer-only throughput knob: the sf tier consumes the carried
        # spectrum for featurize/reward and leaves EnvState.y at the reset
        # field BY DESIGN (configs/ks.py spectral_featurize), so eval/plot
        # rollouts must rebuild WITHOUT it to record real fields — the
        # policy itself is tier-independent (same observations either way)
        overrides = {k: v for k, v in overrides.items()
                     if k != "spectral_featurize"}
    setup = build_setup(args.preset, overrides)
    if overrides:
        print(f"applied config overrides: {sorted(overrides)}")
    out_dir = args.out or os.path.join("runs", args.preset)
    os.makedirs(out_dir, exist_ok=True)

    # family-aware eval defaults (plot_heat for KS: te=200, act at 100;
    # testrun for fluid: full episode, immediate actuation)
    if args.p_te is None:
        args.p_te = 6.0 if args.preset.startswith("Fluid") else (
            12.0 if args.preset.startswith("KellerSegel") else 200.0)
    if args.p_t_action is None:
        args.p_t_action = 0.0 if args.preset.startswith("Fluid") else args.p_te / 2.0

    if args.ppo:
        from distributedconvrl_pde_control_tpu.agents.ppo import (
            PPOAgent,
            PPOConfig,
            PPOTrainer,
            ppo_policy,
            train_ppo,
        )

        acfg = setup.agent.cfg
        if args.ppo_ref:
            # the reference-exact protocol: PPOConfig's defaults mirror
            # create_agent_ppo (PDEagent.jl:462-512 — 10 epochs x 32
            # microbatches, lr 1e-3, update_freq-sized rollout)
            pcfg = PPOConfig(ns=acfg.ns, na=acfg.na_rows)
        else:
            # the tuned lighter protocol (measured better on the shipped
            # artifacts; head-to-head RESULTS.md "PPO protocol" row)
            pcfg = PPOConfig(ns=acfg.ns, na=acfg.na_rows, rollout_len=50,
                             n_microbatches=16, n_epochs=4, learning_rate=3e-4)
        pagent = PPOAgent(pcfg)
        if args.train:
            # fluid ICs are host-generated -> pool; KS random_init is traceable
            pool = random_init = eval_pool = None
            if setup.random_init is not None:
                if args.preset.startswith("Fluid"):
                    keys = jax.random.split(jax.random.PRNGKey(setup.seed), 16)
                    pool = jnp.stack([jnp.asarray(setup.random_init(k)) for k in keys])
                    # held-out eval ICs for --eval-warmup selection (without
                    # this a pool-based PPO eval scores training-seen fields)
                    if args.eval_warmup:
                        eval_pool = held_out_eval_pool(setup, args.eval_pool)
                else:
                    random_init = setup.random_init
            trainer = PPOTrainer(setup.env, pagent, n_envs=args.n_envs or 8,
                                 random_init=random_init, y0_pool=pool,
                                 eval_y0_pool=eval_pool)
            pstate, info = train_ppo(
                trainer, iters=args.iters,
                key=jax.random.PRNGKey(args.seed if args.seed is not None else setup.seed),
                eval_every=args.eval_every, eval_steps=args.eval_steps,
                eval_warmup_steps=args.eval_warmup)
            checkpoint.save_ppo(out_dir, pstate, info)
            if overrides:
                checkpoint.save_config_overrides(out_dir, overrides)
            metric = ("deterministic eval" if info["selection"] == "eval"
                      else "mean step")
            print(f"saved PPO to {out_dir}; best {metric} reward "
                  f"{info['best_reward']:.4f} @ iter {info['best_iter']}")
            return
        # --eval: deterministic mean-policy rollout through the standard path
        pstate, info = checkpoint.load_ppo(
            args.load_from or out_dir, pagent.init_state(jax.random.PRNGKey(0)))
        params = info.get("best_params") or pagent._params(pstate)
        policy = ppo_policy(pagent, params)
        y0 = None
        if args.random_init and setup.random_init is not None:
            y0 = setup.random_init(jax.random.PRNGKey(
                args.seed if args.seed is not None else setup.seed))
        if args.preset.startswith("Fluid"):
            # the fluid quality protocol is the testrun ENERGY comparison
            # (FluidSetup.jl:400-537), same as the DDPG eval branch — not
            # the KS suppression metric
            from distributedconvrl_pde_control_tpu.agents.policies import (
                ZeroPolicy,
            )

            tr = rollout(setup.env, policy, y0=y0, te=args.p_te,
                         t_action=args.p_t_action)
            tr["energy"] = energy_trace(tr["y"])
            zero_tr = rollout(setup.env, ZeroPolicy(setup.env.action_shape),
                              te=args.p_te)
            zero_tr["energy"] = energy_trace(zero_tr["y"])
            from distributedconvrl_pde_control_tpu.train.eval import mean_energy

            plotting.plot_energy(
                {"ppo": tr["energy"], "no action": zero_tr["energy"]},
                os.path.join(out_dir, "energy_ppo.png"))
            print(json.dumps({"agent": "ppo",
                              "mean_energy": mean_energy(tr),
                              "no_action": mean_energy(zero_tr),
                              "mean_step_reward": float(
                                  np.asarray(tr["reward"]).mean())}))
            if args.live:
                plotting.live_view(tr, fps=args.fps)
            return
        traces = rollout(setup.env, policy, y0=y0, te=args.p_te,
                         t_action=args.p_t_action)
        plotting.plot_heat(traces, os.path.join(out_dir, "heat_ppo.png"),
                           title=f"{args.preset} PPO")
        n_steps = traces["y"].shape[0]
        act_start = int(round(args.p_t_action / setup.env.dt))
        y = traces["y"]
        if args.preset.startswith("KellerSegel"):
            # deviation from the u = 1 control target, matching the DDPG
            # eval metric (KellerSegelSetup.jl:241-263)
            y = y[:, 0] - 1.0
        pre = float(np.abs(y[max(0, act_start - 100):act_start]).mean())
        post = float(np.abs(y[-max(1, n_steps // 10):]).mean())
        print(json.dumps({"agent": "ppo", "pre_control_mean_abs_dev": pre,
                          "post_control_mean_abs_dev": post,
                          "suppression": post / pre if pre else None}))
        if args.live:
            plotting.live_view(traces, fps=args.fps)
        return

    if args.train and args.batched:
        import numpy as _np

        from distributedconvrl_pde_control_tpu.agents.replay import replay_init
        from distributedconvrl_pde_control_tpu.train.batched import (
            BatchedTrainer,
            BatchedTrainerConfig,
            train_batched,
        )
        from distributedconvrl_pde_control_tpu.train.loop import TrainState

        n_envs = args.n_envs or 256
        if args.capacity:
            import dataclasses as _dc

            from distributedconvrl_pde_control_tpu.agents.ddpg import DDPGAgent

            setup = _dc.replace(
                setup, agent=DDPGAgent(_dc.replace(setup.agent.cfg,
                                                   capacity=args.capacity)))
        # host-precomputed fresh-IC pool (works for every family; fluid's
        # random-vortex generator is host-only)
        pool = None
        if setup.random_init is not None:
            keys = jax.random.split(jax.random.PRNGKey(setup.seed), 32)
            pool = jnp.stack([jnp.asarray(setup.random_init(k)) for k in keys])
        # --eval-warmup = the full OOD selection protocol: delayed actuation
        # AND held-out generator ICs (a disjoint key stream), so the
        # selection metric never scores on training-seen fields.
        eval_pool = None
        if args.eval_warmup and setup.random_init is not None:
            eval_pool = held_out_eval_pool(setup, args.eval_pool)
        pop_mesh = None
        if args.mesh and (args.population or args.pop_search):
            from distributedconvrl_pde_control_tpu.parallel.batched_dp import (
                dp_mesh,
            )

            spec = args.mesh.lower().split("x")
            n_dp = int(spec[0])
            if len(spec) > 1 and int(spec[1]) != 1:
                raise SystemExit(f"--population shards over dp only; use "
                                 f"--mesh {n_dp} or {n_dp}x1, got {args.mesh!r}")
            if len(jax.devices()) < n_dp:
                raise SystemExit(f"mesh {n_dp}x1 needs {n_dp} devices, have "
                                 f"{len(jax.devices())} (hint: "
                                 f"--virtual-devices N)")
            if n_envs % n_dp:
                raise SystemExit(f"--n-envs {n_envs} (per member) must "
                                 f"divide by dp={n_dp}")
            pop_mesh = dp_mesh(n_dp)

        if args.pop_search:
            # schedule/optimizer hyperparameter search, every round of up to
            # --population trials fused as ONE program, scored on the
            # long-horizon eval (train/population.py::population_search)
            from distributedconvrl_pde_control_tpu.train.population import (
                population_search,
            )

            best, trials, best_hook, best_state = population_search(
                setup.env, setup.agent,
                BatchedTrainerConfig(n_envs=n_envs,
                                     batch_size=args.learner_batch or 256,
                                     update_loops=args.update_loops,
                                     min_best_episode=setup.min_best_episode),
                args.pop_search, total_steps=args.total_steps,
                members_per_round=args.population or 8,
                seed=args.seed if args.seed is not None else setup.seed,
                noise_decay_every=args.noise_every or 0,
                eval_every=args.eval_every or 50,
                eval_steps=args.eval_steps,
                eval_warmup_steps=args.eval_warmup,
                eval_score=args.eval_score,
                chunk_len=args.chunk_len or 50,
                y0_pool=pool, eval_y0_pool=eval_pool, mesh=pop_mesh)
            with open(os.path.join(out_dir, "search.json"), "w") as f:
                json.dump({"best": best, "trials": trials,
                           "seed_discipline_note": (
                               "trials within one fused round share per-step "
                               "key draws across the member axis "
                               "(train/population.py ARCHITECTURE note), so "
                               "a trial's score can depend on which "
                               "round-mates it was batched with in a way "
                               "serial trials don't; winners should be "
                               "independently re-validated (the KS22 winner "
                               "was, at 0.24% — RESULTS.md)"),
                           "search_space_note": (
                               "SCHEDULE_SPACE covers per-member state axes "
                               "only (act_noise/decay/lrs); structural axes "
                               "(network scale, batch size) stay with the "
                               "serial --hyperopt search")}, f, indent=1)
            if best_state is not None:
                ts_std = TrainState(
                    agent=best_state,
                    replay=replay_init(1, setup.agent.cfg.ns,
                                       setup.agent.cfg.na_rows),
                    key=np.asarray(jax.random.PRNGKey(
                        args.seed if args.seed is not None else setup.seed)))
                checkpoint.save(out_dir, ts_std, best_hook,
                                include_replay=False,
                                config_overrides=overrides)
            print(f"saved search.json + winner checkpoint to {out_dir}")
            return

        if args.population:
            # P seeds/hyper-variants as ONE fused program (train/population.py)
            from distributedconvrl_pde_control_tpu.train.population import (
                PopulationTrainer,
                save_population,
                train_population,
            )

            P = args.population
            pov = {}
            if args.pop_overrides:
                raw = args.pop_overrides
                pov = (json.loads(raw) if raw.lstrip().startswith("{")
                       else json.load(open(raw)))
                allowed = {"act_noise", "noise_decay",
                           "learning_rate", "learning_rate_critic"}
                bad = set(pov) - allowed
                if bad:
                    raise SystemExit(f"--pop-overrides supports {sorted(allowed)}, "
                                     f"got {sorted(bad)}")
                for k, v in pov.items():
                    if len(v) != P:
                        raise SystemExit(f"--pop-overrides[{k}] needs "
                                         f"{P} values, got {len(v)}")
            base_seed = args.seed if args.seed is not None else setup.seed
            pop = PopulationTrainer(
                setup.env, setup.agent,
                BatchedTrainerConfig(n_envs=n_envs,
                                     batch_size=args.learner_batch or 256,
                                     update_loops=args.update_loops,
                                     min_best_episode=setup.min_best_episode),
                P, y0_pool=pool, eval_y0_pool=eval_pool,
                lr_actor=pov.get("learning_rate"),
                lr_critic=pov.get("learning_rate_critic"), mesh=pop_mesh)
            nd = pov.get("noise_decay",
                         args.noise_decay if args.noise_decay is not None
                         else setup.noise_decay)
            ts, hooks, means = train_population(
                pop, total_steps=args.total_steps,
                key=jax.random.PRNGKey(base_seed),
                act_noise=pov.get("act_noise"),
                noise_decay_every=args.noise_every or max(
                    1, args.total_steps // setup.loops),
                noise_decay=nd,
                chunk_len=args.chunk_len or 50, verbose=True,
                eval_every=args.eval_every, eval_steps=args.eval_steps,
                eval_warmup_steps=args.eval_warmup,
                eval_score=args.eval_score)
            summary = save_population(out_dir, pop, ts, hooks,
                                      overrides=overrides)
            for row in summary["ranking"]:
                print(f"  {row['dir']}: best {row['best_reward']:.4f} "
                      f"@ ep {row['best_episode']} ({row['episodes']} eps)")
            print(f"saved {P} members + population.json to {out_dir}")
            return

        trainer = BatchedTrainer(
            setup.env, setup.agent,
            BatchedTrainerConfig(n_envs=n_envs,
                                 batch_size=args.learner_batch or 256,
                                 update_loops=args.update_loops,
                                 min_best_episode=setup.min_best_episode),
            y0_pool=pool, eval_y0_pool=eval_pool,
        )
        warm = None
        if args.import_jld2:
            from distributedconvrl_pde_control_tpu.train.reference_import import (
                load_warm_start,
            )

            warm = load_warm_start(args.import_jld2)
            print(f"warm-starting from imported reference JLD2 "
                  f"{args.import_jld2} ({sorted(warm)})")
        ts, hook, means = train_batched(
            trainer, total_steps=args.total_steps,
            key=jax.random.PRNGKey(args.seed if args.seed is not None else setup.seed),
            noise_decay_every=args.noise_every or max(1, args.total_steps // setup.loops),
            noise_decay=args.noise_decay if args.noise_decay is not None else setup.noise_decay,
            chunk_len=args.chunk_len or 50,
            verbose=True, eval_every=args.eval_every,
            eval_steps=args.eval_steps, eval_warmup_steps=args.eval_warmup,
            eval_score=args.eval_score, warm_start=warm)
        acfg = setup.agent.cfg
        ts_std = TrainState(agent=jax.tree.map(np.asarray, ts.agent),
                            replay=replay_init(1, acfg.ns, acfg.na_rows),
                            key=np.asarray(ts.key))
        checkpoint.save(out_dir, ts_std, hook, include_replay=False,
                        config_overrides=overrides,
                        backend=args.ckpt_backend)
        print(hook.ascii_curve())
        if hook.evals:
            print("evals:", [(s, round(r, 4)) for s, r in hook.evals])
        print(f"saved to {out_dir}; best reward {hook.bestreward:.4f} @ ep "
              f"{hook.bestepisode}; {int(ts.total_env_steps)} env steps, "
              f"final chunk mean {means[-1]:.4f}")
        return

    if args.train:
        ts = hook = None
        if args.resume:
            if args.import_jld2:
                # the reference's own load(); train() continuation flow
                # (KS22.jl:26-32) straight from its JLD2 saves — resumes
                # with a fresh replay buffer, like our light checkpoints
                from distributedconvrl_pde_control_tpu.train.reference_import import (
                    import_reference_checkpoint,
                )

                ts, hook = import_reference_checkpoint(args.import_jld2, setup)
                print(f"resuming from imported reference JLD2 "
                      f"{args.import_jld2} (ep {hook.ep - 1}, "
                      f"best {hook.bestreward:.4f})")
            else:
                ts_template = init_train_state(setup.env, setup.agent,
                                               jax.random.PRNGKey(0))
                ts, hook = checkpoint.load(args.load_from or out_dir, ts_template)
                print(f"resuming from ep {hook.ep - 1}, best {hook.bestreward:.4f}")
        if args.profile:
            from distributedconvrl_pde_control_tpu.utils.profiling import StepTimer, trace

            timer = StepTimer()
            with trace(os.path.join(out_dir, "profile")):
                with timer.phase("first_loop(compile+train)"):
                    ts, hook = train(setup, loops=1, no_steps=args.no_steps, seed=args.seed,
                                     ts=ts, hook=hook, verbose=False)
            remaining = (args.loops if args.loops is not None else setup.loops) - 1
            if remaining > 0:
                with timer.phase("steady_loops"):
                    ts, hook = train(setup, loops=remaining, no_steps=args.no_steps,
                                     seed=args.seed, ts=ts, hook=hook, verbose=False)
            print(timer.summary())
            print(f"profiler trace -> {out_dir}/profile")
        else:
            ts, hook = train(setup, loops=args.loops, no_steps=args.no_steps, seed=args.seed,
                             ts=ts, hook=hook)
        checkpoint.save(out_dir, ts, hook, config_overrides=overrides,
                        backend=args.ckpt_backend)
        plotting.plot_rewards_curve(hook.rewards, os.path.join(out_dir, "rewards.png"),
                                    hook.bestepisode)
        print(hook.ascii_curve())
        print(f"saved to {out_dir}; best reward {hook.bestreward:.4f} @ ep {hook.bestepisode}")
        return

    if args.train_multi:
        best = train_multi(setup, no_episodes=args.no_episodes or 2800,
                           n_experiments=args.n_experiments,
                           save_fn=lambda n, ts, hook: checkpoint.save(
                               out_dir, ts, hook, n, config_overrides=overrides,
                               backend=args.ckpt_backend))
        print("best rewards per experiment:", best)
        return

    # ---- eval: load checkpoint, plot_heat / testrun protocol
    load_dir = args.load_from or out_dir
    if args.serve:
        from distributedconvrl_pde_control_tpu.experiments import serve

        serve.main([args.preset, "--load-from", load_dir]
                   + (["--cpu"] if args.cpu else []))
        return
    if args.export_controller:
        from distributedconvrl_pde_control_tpu.experiments.export_controller import (
            export_controller,
        )

        template = init_train_state(setup.env, setup.agent, jax.random.PRNGKey(0))
        ts, hook = checkpoint.load(load_dir, template)
        actor = jax.tree.map(jnp.asarray, hook.best_actor or ts.agent.actor)
        manifest = export_controller(setup, actor, args.export_controller,
                                     preset=args.preset)
        print(f"exported {manifest['platforms']} controller to "
              f"{args.export_controller} (args: {manifest['args']})")
        return
    if args.import_jld2:
        from distributedconvrl_pde_control_tpu.train.reference_import import (
            import_reference_checkpoint,
        )

        ts, hook = import_reference_checkpoint(args.import_jld2, setup,
                                               out_dir=out_dir)
        print(f"imported reference JLD2 saves {args.import_jld2} -> {out_dir} "
              f"(standard light checkpoint; reference bestreward "
              f"{hook.bestreward:.4f} @ ep {hook.bestepisode})")
    else:
        ts_template = init_train_state(setup.env, setup.agent, jax.random.PRNGKey(0))
        ts, hook = checkpoint.load(load_dir, ts_template)
    actor = (
        jax.tree.map(jnp.asarray, hook.best_actor) if hook.best_actor is not None else ts.agent.actor
    )
    if args.plot_best:
        if hook.best_trace is None:
            raise SystemExit("checkpoint has no stored best-episode trace")
        plotting.plot_heat(hook.best_trace, os.path.join(out_dir, "heat_best.png"),
                           title=f"{args.preset} best episode")
        print(f"rendered stored best episode (ep {hook.bestepisode}, "
              f"reward {hook.bestreward:.4f}) -> {out_dir}/heat_best.png")
        return
    policy = actor_policy(setup.agent, actor)
    y0 = None
    if args.random_init and setup.random_init is not None:
        y0 = setup.random_init(jax.random.PRNGKey(
            args.seed if args.seed is not None else setup.seed))
    traces = rollout(setup.env, policy, y0=y0, te=args.p_te, t_action=args.p_t_action)

    is_fluid = args.preset.startswith("Fluid")
    if is_fluid:
        from distributedconvrl_pde_control_tpu.agents.policies import (
            NegatePolicy,
            ZeroPolicy,
            negate_center_row,
        )
        from distributedconvrl_pde_control_tpu.train.eval import mean_energy

        # center row derived from the featurizer (window^2 // 2 of the
        # CURRENT temporal block) — ns//2 mis-indexes variant featurizers
        # with temporal_steps > 1 or memory rows (see negate_center_row)
        neg = NegatePolicy(setup.env.action_shape,
                           center_row=negate_center_row(setup.env.featurize))
        zero = ZeroPolicy(setup.env.action_shape)
        runs = {
            "trained": traces,
            "negate": rollout(setup.env, neg, te=args.p_te, t_action=args.p_t_action),
            "no action": rollout(setup.env, zero, te=args.p_te),
        }
        energies = {k: energy_trace(tr["y"]) for k, tr in runs.items()}
        plotting.plot_energy(energies, os.path.join(out_dir, "energy.png"))
        # mask by 'active': early-terminated runs freeze their terminal frame
        print({k: mean_energy(tr) for k, tr in runs.items()})
    else:
        plotting.plot_heat(traces, os.path.join(out_dir, "heat.png"), title=args.preset,
                           plot_separate=args.plot_separate,
                           from_step=args.from_step, to_step=args.to_step)
        plotting.plot_sums(traces, os.path.join(out_dir, "sums.png"))
        plotting.plot_actions(traces, os.path.join(out_dir, "actions.png"))
        n_steps = traces["y"].shape[0]
        act_start = int(round(args.p_t_action / setup.env.dt))
        y = traces["y"]
        if args.preset.startswith("KellerSegel"):
            # the control target is the homogeneous state u = 1
            # (KellerSegelSetup.jl:241-263), so report |u - 1|
            y = y[:, 0] - 1.0
        pre = float(np.abs(y[max(0, act_start - 100):act_start]).mean())
        post = float(np.abs(y[-max(1, n_steps // 10):]).mean())
        print(json.dumps({"pre_control_mean_abs_dev": pre, "post_control_mean_abs_dev": post,
                          "suppression": post / pre if pre else None}))
    if args.live:
        plotting.live_view(traces, fps=args.fps)
    if args.video:
        out = plotting.render_animation(traces, out_dir, fps=int(args.fps))
        print("video:", out)


if __name__ == "__main__":
    main()
