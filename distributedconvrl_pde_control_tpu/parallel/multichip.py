"""Preset-driven multi-chip DDPG training: DP env batch x SP spatial sharding.

This is the scale-out centerpiece: the reference trains the fluid task on a
single GPU at 128^2 and can only afford 256^2 at evaluation time
(/root/reference/scripts/Fluid/setup/FluidSetup.jl:32-47); here the SAME
experiment preset (`configs.fluid.FluidConfig`) trains end-to-end across a
('dp', 'sp') chip mesh, lifting training itself to the big grid:

  * the env batch is sharded over `dp` (each dp group trains on its own
    envs; DDPG gradients are `pmean`'d over dp — synchronous data-parallel);
  * each environment's 2D vorticity field is sharded over `sp`
    (x-pencil spectra / y-pencil real blocks, transpose-FFT solver from
    `parallel.ns_sharded`, sensor readouts as partial matmuls + `psum`);
  * network parameters, optimizer state, and the policy-noise stream are
    replicated (keys are folded with the dp index ONLY, so every sp member
    of a dp group applies identical actions to its slice of the field).

Everything — solver substeps, the preset's real featurization (windowed
sensor dots incl. actuators_to_sensors and temporal/memory rows, via
`Conv2DFeaturizer.from_dots`), reward, policy, replay pushes, gradient
steps, episode auto-reset from a fresh-IC pool, and best-actor tracking —
runs inside one jitted SPMD program; the host only sees per-chunk episode
records.

Observability parity with the fidelity loop (src/PDEhook.jl):
  * per-episode mean-reward accounting (emitted per finished episode),
  * best-actor snapshotting ON DEVICE at episode end (PDEhook.jl:65-76;
    the snapshot is taken the step the episode finishes, after that step's
    gradient updates — the same point the reference's PostEpisode hook sees),
  * checkpoints in the standard light format (`train.checkpoint`), so
    `experiments.run --eval` consumes sharded-trained artifacts unchanged.
  * per-episode error_detection (FluidSetup.jl:263-273 + PDEhook.jl:78-82)
    runs DEVICE-SIDE on the local y-pencil blocks: x-jumps are shard-local,
    y-jumps get the previous shard's boundary row via one `ppermute`, the
    max is `pmax`'d over sp, and diverged episodes whose final field trips
    the neighbor-jump test are surfaced through the chunk records into
    `PDEHook.errored_episodes`.

Replay invariant (load-bearing): the per-dp replay rides in `MCState` with
a leading dp axis sharded P('dp') — locally shape (1, capacity, ...), the
leading 1 asserted at trace time. The learning gate is computed from the
REPLICATED `global_step` counter (every dp shard pushes the same
`n_local_envs * n_actuators` rows per step), so both `lax.cond` branches are
taken uniformly across the mesh and the `pmean` inside `learn_batch` is
always collective — this replaces round 1's comment-based invariant.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from distributedconvrl_pde_control_tpu.agents.ddpg import DDPGAgent, DDPGState
from distributedconvrl_pde_control_tpu.agents.replay import (
    Replay,
    replay_init,
    replay_push_flat,
    replay_sample,
)
from distributedconvrl_pde_control_tpu.configs.fluid import (
    FluidConfig,
    fluid_agent_config,
    fluid_featurizer,
    fluid_kernels,
)
from distributedconvrl_pde_control_tpu.ops.navier_stokes import initial_condition
from distributedconvrl_pde_control_tpu.parallel.ns_sharded import (
    NSShardedSolverRI,
    make_sharded_ops,
)


@dataclasses.dataclass(frozen=True)
class ShardedTrainConfig:
    """Scale-out knobs of the sharded trainer (everything physics/agent
    comes from the `FluidConfig` preset)."""

    n_envs: int = 8  # global env batch, sharded over dp
    batch_size: int = 32  # learner batch (scaled up from the reference's 3)
    update_loops: int = 1  # gradient steps per env step
    capacity_per_dp: int = 100_000
    y0_pool_size: int = 8  # fresh-IC pool for in-graph episode resets
    chunk_len: int = 25  # fused steps per host round-trip
    # Software-pipeline depth of the record consumption in train_sharded:
    # chunk n's packed record array is read on the host only after chunks
    # n+1..n+depth have been dispatched. The axon-tunnel RPC spans SEVERAL
    # small-grid chunk windows (128^2, chunk_len=10: measured overhead
    # 281%/108%/54%/14% at depths 0/1/2/4, flat from 4 to drain-at-end —
    # depth 4 fully hides the latency; the residual is un-pipelineable host
    # work). Accounting stays exact: loop boundaries drain the queue.
    pipeline_depth: int = 4


@struct.dataclass
class MCState:
    """Global (pre-shard_map) training state."""

    w: jnp.ndarray  # (B, ny, nx) float32 — REAL vorticity, y-pencil sharded
    obs: jnp.ndarray  # (B, obs_dim, n_act)
    action: jnp.ndarray  # (B, na_rows, n_act)
    steps: jnp.ndarray  # (B,) int32 — per-env episode step counter
    ep_reward: jnp.ndarray  # (B,) f32 — running sum of per-step mean rewards
    agent: DDPGState  # replicated
    replay: Replay  # arrays lead with the dp dimension
    key: jnp.ndarray  # replicated
    global_step: jnp.ndarray  # i32 replicated — total train steps taken
    ep_count: jnp.ndarray  # i32 replicated — episodes finished (all envs)
    best_reward: jnp.ndarray  # f32 replicated (PDEhook bestreward)
    best_episode: jnp.ndarray  # i32 replicated
    best_actor: list  # replicated actor pytree (PDEhook bestNNA)
    mean_reward: jnp.ndarray  # scalar diagnostics


@struct.dataclass
class EvalState:
    w: jnp.ndarray
    obs: jnp.ndarray
    action: jnp.ndarray
    steps: jnp.ndarray
    done: jnp.ndarray


def _local(x):
    """Strip the leading per-dp axis of a replay leaf; the local size-1
    axis is the shard_map contract, asserted here so layout regressions
    fail at trace time instead of silently training on garbage."""
    assert x.shape[0] == 1, f"per-dp replay leaf has local leading dim {x.shape[0]}, want 1"
    return x[0]


class ShardedFluidTrainer:
    """Builds the sharded arrays and the jitted SPMD programs for a fluid
    experiment preset.

    Stepper dispatch (round-2 ROADMAP gap #2, closed): the trainer honors
    the preset's stepper — `adaptive=True` runs the sharded do_step2
    (`NSShardedSolverRI.step_real_adaptive`, acceptance error pmax'd over sp
    so the while_loop trip count stays uniform across the mesh),
    `stepper="ifrk4"` runs the integrating-factor fast tier, and the default
    is the reference's fixed-step do_step (FluidSetup.jl:163-172) at the
    preset's oversampling."""

    def __init__(self, cfg: FluidConfig, mesh: Mesh,
                 tcfg: ShardedTrainConfig = ShardedTrainConfig()):
        assert "dp" in mesh.axis_names and "sp" in mesh.axis_names
        self.cfg = cfg
        self.tcfg = tcfg
        self.mesh = mesh
        self.n_dp = mesh.shape["dp"]
        self.n_sp = mesh.shape["sp"]
        n = cfg.grid_nx
        self.n = n
        assert n % self.n_sp == 0, "grid must divide over sp"
        assert tcfg.n_envs % self.n_dp == 0, "env batch must divide over dp"
        self.solver = NSShardedSolverRI(
            nu=cfg.nu, sp_axis="sp",
            fft_mode=getattr(cfg, "fft_mode", "auto"),
            nl_fft_mode=getattr(cfg, "nl_fft_mode", None))
        self.ops = make_sharded_ops(n, n, cfg.lx, cfg.lx)

        n_act = cfg.sensors_per_axis**2
        self.n_act = n_act
        sens, acts = fluid_kernels(cfg)
        self.sensor_kernels = jnp.asarray(sens, jnp.float32)  # (n_act, ny, nx)
        self.actuator_kernels = jnp.asarray(acts, jnp.float32)
        self.featurizer = fluid_featurizer(
            cfg, jnp.asarray(sens.reshape(n_act, -1), jnp.float32)
        )
        # round the per-dp capacity up to a multiple of the per-step push
        # width so pushes take the contiguous fast path (replay_push_flat);
        # stored on self so init() builds the replay at the SAME rounded
        # size the agent config claims (they previously disagreed for
        # non-dividing capacities, silently taking the scatter slow path)
        push = (tcfg.n_envs // self.n_dp) * n_act
        self.capacity_per_dp = ((tcfg.capacity_per_dp + push - 1) // push) * push
        self.agent = DDPGAgent(
            fluid_agent_config(cfg, self.featurizer.obs_dim,
                               capacity=self.capacity_per_dp)
        )
        self.max_steps = int(math.ceil((cfg.te - cfg.t0) / cfg.dt - 1e-9))

        acfg = self.agent.cfg
        self._w_spec = P("dp", "sp", None)  # y-pencil: rows sharded over sp
        self._state_specs = MCState(
            w=self._w_spec,
            obs=P("dp"),
            action=P("dp"),
            steps=P("dp"),
            ep_reward=P("dp"),
            agent=P(),
            replay=P("dp"),
            key=P(),
            global_step=P(),
            ep_count=P(),
            best_reward=P(),
            best_episode=P(),
            best_actor=P(),
            mean_reward=P(),
        )
        self._ops_spec = jax.tree.map(lambda _: P(None, "sp"), self.ops)  # x-pencil slices
        self._kern_spec = P(None, "sp", None)  # y-pencil kernel slices
        self._pool_spec = P(None, "sp", None)
        self._acfg = acfg

    # -------------------------------------------------------------- helpers
    def _solver_step(self, w_local, f_local, ops):
        """Preset-honoring stepper dispatch on local shards (see class
        docstring)."""
        cfg = self.cfg
        if cfg.adaptive:
            return self.solver.step_real_adaptive(
                w_local, f_local, ops, cfg.dt,
                rtol=cfg.adaptive_tol, atol=cfg.adaptive_tol)
        if cfg.stepper == "ifrk4":
            return self.solver.step_real_if(w_local, f_local, ops, cfg.dt,
                                            cfg.fast_oversampling_eff)
        return self.solver.step_real(w_local, f_local, ops, cfg.dt,
                                     cfg.oversampling)

    def _forcing(self, actions, akern_local):
        """(Bl, na_rows, n_act) actions -> local real-space forcing block
        (prepare_action, FluidSetup.jl:247-261)."""
        return self.cfg.agent_power * jnp.einsum(
            "bn,nyx->byx", actions[:, 0, :], akern_local)

    def _eval_metric(self, w_local):
        """Per-env eval diagnostic: fluid energy sum|omega|/(nx*ny)
        (testrun, FluidSetup.jl:497-500)."""
        bl = w_local.shape[0]
        return jax.lax.psum(
            jnp.sum(jnp.abs(w_local.reshape(bl, -1)), axis=-1), "sp"
        ) / (self.n * self.n)

    def _error_flags(self, w_local):
        """Per-env corrupted-field detector on local y-pencil blocks: real-
        space neighbor jumps > 10 (FluidSetup.jl:263-273; the reference runs
        it on `real(ifft(y))` — `w_local` is already real space here).

        x-neighbors live inside the local block (x is unsharded); the
        globally-rolled y-neighbor of a block's first row is the PREVIOUS
        sp shard's last row — one boundary-row `ppermute`. NaN fields do NOT
        flag (NaN > 10 is false), matching Julia's `maximum` semantics."""
        bl = w_local.shape[0]
        jump_x = jnp.abs(jnp.roll(w_local, 1, axis=2) - w_local)
        last = w_local[:, -1:, :]
        perm = [(i, (i + 1) % self.n_sp) for i in range(self.n_sp)]
        prev_last = jax.lax.ppermute(last, "sp", perm)
        rolled_y = jnp.concatenate([prev_last, w_local[:, :-1, :]], axis=1)
        jump_y = jnp.abs(rolled_y - w_local)
        local_max = jnp.maximum(
            jnp.max(jump_x.reshape(bl, -1), axis=-1),
            jnp.max(jump_y.reshape(bl, -1), axis=-1),
        )
        return jax.lax.pmax(local_max, "sp") > 10.0

    def _sensor_dots_host(self, w0: np.ndarray) -> jnp.ndarray:
        """Host-side (unsharded) raw sensor dots for init-time observations."""
        return jnp.asarray(
            w0.reshape(w0.shape[0], -1)
            @ np.asarray(self.sensor_kernels).reshape(self.n_act, -1).T)

    def _sensor_dots(self, w_local, sens_local):
        """Per-env raw sensor inner products <omega, g_i> with psum over sp.

        w_local: (Bl, ny/S, nx) real y-pencil blocks -> (Bl, n_act) dots."""
        flat = w_local.reshape(w_local.shape[0], -1)
        partial_dots = flat @ sens_local.reshape(self.n_act, -1).T
        return jax.lax.psum(partial_dots, "sp")

    def _featurize(self, dots, prev_obs, action):
        """(Bl, n_act) raw dots -> (Bl, obs_dim, n_act) via the preset's real
        featurizer (window + actuators_to_sensors + temporal/memory rows)."""
        return jax.vmap(lambda d, po, a: self.featurizer.from_dots(d, po, a))(
            dots, prev_obs, action
        )

    def _featurize_reset(self, dots):
        """Featurize at episode start (prev_obs/action None: temporal blocks
        tiled, memory rows zero — KSSetup.jl:209-228 semantics)."""
        return jax.vmap(lambda d: self.featurizer.from_dots(d, None, None))(dots)

    def _reward(self, dots, actions, delta):
        """The preset's reward (FluidSetup.jl:188-202): -|<w,g>|^pow/norm
        - ap*a^2 - dap*da^2, per actuator."""
        cfg = self.cfg
        rdots = jnp.abs(dots) ** cfg.reward_pow / cfg.reward_norm
        return (
            -jnp.abs(rdots)
            - cfg.action_punish * actions[:, 0, :] ** 2
            - cfg.delta_action_punish * delta[:, 0, :] ** 2
        )

    def _make_pool(self, seed: int) -> np.ndarray:
        """Fresh-IC pool for in-graph resets: the host-side random-vortex
        generator (generate_random_init, FluidSetup.jl:386-394; case 3 train
        / 4 eval), pre-drawn because ifft-of-random-vortices is host code."""
        cfg = self.cfg
        rng = np.random.default_rng(seed)
        case = 4 if cfg.evaluation else 3
        return np.stack([
            np.fft.ifft2(initial_condition(case, self.n, self.n, cfg.lx, cfg.lx, rng)).real
            for _ in range(self.tcfg.y0_pool_size)
        ]).astype(np.float32)

    def _shardings(self, specs):
        return jax.tree.map(lambda s: NamedSharding(self.mesh, s), specs,
                            is_leaf=lambda x: isinstance(x, P))

    # ------------------------------------------------------------------ init
    def init(self, key, seed: int = 0) -> MCState:
        cfg, tcfg = self.cfg, self.tcfg
        pool = self._make_pool(seed)
        self.pool = jax.device_put(
            jnp.asarray(pool), NamedSharding(self.mesh, self._pool_spec)
        )
        w0 = pool[np.arange(tcfg.n_envs) % pool.shape[0]]
        k_agent, k_run = jax.random.split(key)
        astate = self.agent.init_state(k_agent)
        acfg = self._acfg
        replay1 = replay_init(self.capacity_per_dp, acfg.ns, acfg.na_rows)
        replay = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (self.n_dp,) + x.shape), replay1
        )
        # initial observations from the initial fields (host-side one-off)
        obs0 = np.asarray(self._featurize_reset(self._sensor_dots_host(w0)))
        state = MCState(
            w=jnp.asarray(w0),
            obs=jnp.asarray(obs0, jnp.float32),
            action=jnp.zeros((tcfg.n_envs, acfg.na_rows, self.n_act), jnp.float32),
            steps=jnp.zeros((tcfg.n_envs,), jnp.int32),
            ep_reward=jnp.zeros((tcfg.n_envs,), jnp.float32),
            agent=astate,
            replay=replay,
            key=k_run,
            global_step=jnp.asarray(0, jnp.int32),
            ep_count=jnp.asarray(0, jnp.int32),
            best_reward=jnp.asarray(-jnp.inf, jnp.float32),
            best_episode=jnp.asarray(0, jnp.int32),
            best_actor=jax.tree.map(jnp.copy, astate.actor),
            mean_reward=jnp.asarray(0.0, jnp.float32),
        )
        return jax.device_put(state, self._shardings(self._state_specs))

    # ------------------------------------------------------------- the step
    def _local_step(self, state: MCState, ops, sens, akern, pool):
        """One SPMD training step on local shards. Returns (state', records)."""
        cfg, tcfg = self.cfg, self.tcfg
        agent, acfg = self.agent, self._acfg
        n_act = self.n_act

        dp_idx = jax.lax.axis_index("dp")
        key, k_act, k_learn, k_reset = jax.random.split(state.key, 4)
        k_act_dp = jax.random.fold_in(k_act, dp_idx)
        k_learn_dp = jax.random.fold_in(k_learn, dp_idx)
        k_reset_dp = jax.random.fold_in(k_reset, dp_idx)

        bl = state.obs.shape[0]  # local envs per dp group
        astate = state.agent.replace(update_step=state.agent.update_step + 1)
        global_step = state.global_step + 1

        # ---- policy over all local actuator columns (shared-MLP batching)
        obs_flat = jnp.moveaxis(state.obs, 0, 1).reshape(acfg.ns, bl * n_act)
        actions_flat = agent.act(astate, obs_flat, k_act_dp, learning=True)
        actions = jnp.moveaxis(actions_flat.reshape(acfg.na_rows, bl, n_act), 1, 0)
        delta = actions - state.action

        # ---- forcing: real-space smear on the local kernel slices
        # (prepare_action, FluidSetup.jl:247-261; row 0 = the physical action)
        f_real = self._forcing(actions, akern)

        # ---- solver (split-component transpose-FFT, preset's stepper)
        w_new = self._solver_step(state.w, f_real, ops)

        # ---- sensors, obs, reward
        dots = self._sensor_dots(w_new, sens)  # (Bl, n_act) raw
        obs_new = self._featurize(dots, state.obs, actions)
        reward = self._reward(dots, actions, delta)
        steps = state.steps + 1

        # ---- termination (PDEenv.jl:226-240 semantics)
        finite = jnp.all(jnp.isfinite(reward), axis=-1)
        if cfg.check_max_value == "reward":
            blowup = jnp.max(jnp.abs(reward), axis=-1) > cfg.max_value
        elif cfg.check_max_value == "y":
            local_max = jnp.max(jnp.abs(w_new.reshape(bl, -1)), axis=-1)
            blowup = jax.lax.pmax(local_max, "sp") > cfg.max_value
        else:
            blowup = jnp.zeros((bl,), bool)
        blowup = jnp.logical_or(blowup, jnp.logical_not(finite))
        horizon = steps >= self.max_steps
        done = jnp.logical_or(horizon, blowup)
        completed = jnp.logical_and(horizon, jnp.logical_not(blowup))

        # ---- replay push (local, per dp shard; identical across sp);
        # contiguous fast path when capacity_per_dp divides by the push
        # width (ShardedTrainConfig rounds it up, so it always does)
        rb = jax.tree.map(_local, state.replay)
        n_push = bl * n_act
        capacity = rb.s.shape[1]
        t_flat = jnp.repeat(done.astype(jnp.float32), n_act)
        safe_r = jnp.where(jnp.isfinite(reward), reward, -cfg.max_value)
        rb = replay_push_flat(
            rb, obs_flat, actions_flat, safe_r.reshape(-1), t_flat,
            jnp.moveaxis(obs_new, 0, 1).reshape(acfg.ns, -1),
        )

        # ---- learning: local sample, dp-pmean'd gradients. The gate depends
        # only on REPLICATED quantities (global_step), so every mesh member
        # takes the same cond branch and the pmean is always collective.
        size_det = jnp.minimum(global_step * n_push, capacity)
        can = jnp.logical_and(
            size_det > acfg.update_after * n_act,
            astate.update_step % acfg.update_freq == 0,
        )

        def do_learn(a):
            def one(a, k):
                batch = replay_sample(rb, k, tcfg.batch_size, 0)
                return agent.learn_batch(a, batch, axis_name="dp"), None

            a, _ = jax.lax.scan(one, a, jax.random.split(k_learn_dp, tcfg.update_loops))
            return a

        astate = jax.lax.cond(can, do_learn, lambda a: a, astate)

        # ---- episode accounting + on-device best-actor tracking
        step_mean_r = jnp.where(
            jnp.isfinite(reward), reward, -cfg.max_value
        ).mean(axis=-1)  # (Bl,)
        ep_r = state.ep_reward + step_mean_r
        n_finished = jax.lax.psum(jnp.sum(done.astype(jnp.int32)), "dp")
        ep_count = state.ep_count + n_finished
        cand = jnp.where(jnp.logical_and(done, completed), ep_r, -jnp.inf)
        cand_max = jax.lax.pmax(jnp.max(cand), "dp")
        is_better = jnp.logical_and(
            cand_max > state.best_reward, ep_count >= self.cfg.min_best_episode
        )
        best_actor = jax.tree.map(
            lambda b, c: jnp.where(is_better, c, b), state.best_actor, astate.actor
        )
        best_reward = jnp.where(is_better, cand_max, state.best_reward)
        best_episode = jnp.where(is_better, ep_count, state.best_episode)

        # ---- auto-reset finished envs with fresh ICs from the pool
        pool_idx = jax.random.randint(k_reset_dp, (bl,), 0, pool.shape[0])
        w0_local = pool[pool_idx]
        donec = done.reshape(bl, 1, 1)
        w_out = jnp.where(donec, w0_local, w_new)
        obs0 = self._featurize_reset(self._sensor_dots(w0_local, sens))
        obs_out = jnp.where(donec, obs0, obs_new)
        action_out = jnp.where(donec, jnp.zeros_like(actions), actions)
        steps_out = jnp.where(done, 0, steps)
        ep_r_out = jnp.where(done, 0.0, ep_r)

        mean_r = jax.lax.pmean(jnp.mean(step_mean_r), "dp")
        new_state = MCState(
            w=w_out,
            obs=obs_out,
            action=action_out,
            steps=steps_out,
            ep_reward=ep_r_out,
            agent=astate,
            replay=jax.tree.map(lambda x: x[None], rb),
            key=key,
            global_step=global_step,
            ep_count=ep_count,
            best_reward=best_reward,
            best_episode=best_episode,
            best_actor=best_actor,
            mean_reward=mean_r,
        )
        records = {
            "finished": done,  # (Bl,)
            "completed": completed,
            "ep_reward": ep_r,
            "mean_reward": mean_r,
            # diverged episode whose final field trips the corruption test
            # (done & ~completed == blowup, so gate on blowup directly)
            "errored": jnp.logical_and(blowup, self._error_flags(w_new)),
        }
        return new_state, records

    def make_chunk_fn(self, n_steps: int):
        """Compile `n_steps` fused SPMD train steps into one program.

        Returns (state', packed) where packed is the SINGLE (5, n_steps,
        n_envs) f32 record array (train.hooks.unpack_records row order):
        one device->host RPC per chunk for the whole host accounting."""

        def chunk_local(state, ops, sens, akern, pool):
            def body(s, _):
                return self._local_step(s, ops, sens, akern, pool)

            return jax.lax.scan(body, state, None, length=n_steps)

        rec_specs = {
            "finished": P(None, "dp"),
            "completed": P(None, "dp"),
            "ep_reward": P(None, "dp"),
            "mean_reward": P(),
            "errored": P(None, "dp"),
        }
        sharded = shard_map(
            chunk_local,
            mesh=self.mesh,
            in_specs=(self._state_specs, self._ops_spec, self._kern_spec,
                      self._kern_spec, self._pool_spec),
            out_specs=(self._state_specs, rec_specs),
            check_vma=False,
        )

        def chunk(state: MCState):
            state, recs = sharded(state, self.ops, self.sensor_kernels,
                                  self.actuator_kernels, self.pool)
            packed = jnp.stack([
                recs["finished"].astype(jnp.float32),
                recs["completed"].astype(jnp.float32),
                recs["ep_reward"],
                recs["errored"].astype(jnp.float32),
                jnp.broadcast_to(recs["mean_reward"][:, None],
                                 recs["finished"].shape),
            ])
            return state, packed

        return jax.jit(chunk, donate_argnums=0)

    # --------------------------------------------------------------- eval
    def make_eval_fn(self, n_steps: int, t_action_steps: int = 0):
        """Sharded evaluation rollout (the testrun protocol,
        FluidSetup.jl:400-537): deterministic policy, no replay/learning,
        per-step energy sum(|omega|)/(nx*ny). Early-terminated envs freeze.

        Returns a jitted fn (actor_params, w0 (B, ny, nx)) ->
        {energy, reward_mean, active: (n_steps, B)}."""
        cfg = self.cfg
        agent, acfg = self.agent, self._acfg
        n_act = self.n_act

        def local_eval(actor, w0_local, ops, sens, akern):
            bl = w0_local.shape[0]
            obs0 = self._featurize_reset(self._sensor_dots(w0_local, sens))
            est = EvalState(
                w=w0_local,
                obs=obs0,
                action=jnp.zeros((bl, acfg.na_rows, n_act), jnp.float32),
                steps=jnp.zeros((bl,), jnp.int32),
                done=jnp.zeros((bl,), bool),
            )

            def body(est, step_idx):
                obs_flat = jnp.moveaxis(est.obs, 0, 1).reshape(acfg.ns, bl * n_act)
                a_flat = jnp.clip(agent.actor_apply(actor, obs_flat),
                                  -acfg.act_limit, acfg.act_limit)
                actions = jnp.moveaxis(a_flat.reshape(acfg.na_rows, bl, n_act), 1, 0)
                actions = jnp.where(step_idx < t_action_steps,
                                    jnp.zeros_like(actions), actions)
                delta = actions - est.action
                f_real = self._forcing(actions, akern)
                w_new = self._solver_step(est.w, f_real, ops)
                dots = self._sensor_dots(w_new, sens)
                obs_new = self._featurize(dots, est.obs, actions)
                reward = self._reward(dots, actions, delta)
                finite = jnp.all(jnp.isfinite(reward), axis=-1)
                if cfg.check_max_value == "reward":
                    blowup = jnp.max(jnp.abs(reward), axis=-1) > cfg.max_value
                elif cfg.check_max_value == "y":
                    blowup = jax.lax.pmax(
                        jnp.max(jnp.abs(w_new.reshape(bl, -1)), axis=-1), "sp"
                    ) > cfg.max_value
                else:
                    blowup = jnp.zeros((bl,), bool)
                blowup = jnp.logical_or(blowup, jnp.logical_not(finite))
                active = jnp.logical_not(est.done)
                keep = jnp.logical_and(active, jnp.logical_not(blowup))
                keepc = keep.reshape(bl, 1, 1)
                w_out = jnp.where(keepc, w_new, est.w)
                energy = self._eval_metric(w_out)
                est = EvalState(
                    w=w_out,
                    obs=jnp.where(keepc, obs_new, est.obs),
                    action=jnp.where(keepc, actions, est.action),
                    steps=est.steps + active.astype(jnp.int32),
                    done=jnp.logical_or(est.done, blowup),
                )
                rec = {
                    "energy": energy,
                    "reward_mean": jnp.where(keep, reward.mean(-1), 0.0),
                    "active": keep,
                }
                return est, rec

            _, recs = jax.lax.scan(body, est, jnp.arange(n_steps))
            return recs

        rec_specs = {"energy": P(None, "dp"), "reward_mean": P(None, "dp"),
                     "active": P(None, "dp")}
        sharded = shard_map(
            local_eval,
            mesh=self.mesh,
            in_specs=(P(), self._w_spec, self._ops_spec,
                      self._kern_spec, self._kern_spec),
            out_specs=rec_specs,
            check_vma=False,
        )

        def evaluate(actor_params, w0):
            return sharded(actor_params, w0, self.ops, self.sensor_kernels,
                           self.actuator_kernels)

        return jax.jit(evaluate)

    def eval_w0(self, n_envs: int | None = None) -> jnp.ndarray:
        """Evaluation initial fields: the preset's canonical y0 (seeded
        case-4 random vortices, FluidSetup.jl:33-37) replicated over the
        eval env batch."""
        cfg = self.cfg
        n_envs = n_envs or self.tcfg.n_envs
        rng = np.random.default_rng(cfg.grid_seed)
        y0 = np.fft.ifft2(
            initial_condition(4, self.n, self.n, cfg.lx, cfg.lx, rng)
        ).real.astype(np.float32)
        w0 = np.broadcast_to(y0, (n_envs,) + y0.shape)
        return jax.device_put(jnp.asarray(w0),
                              NamedSharding(self.mesh, self._w_spec))


# ------------------------------------------------------------------ drivers
def train_sharded(trainer: ShardedFluidTrainer, loops: int | None = None,
                  no_steps: int | None = None, seed: int = 0,
                  state: MCState | None = None, hook=None, verbose: bool = True,
                  noise_decay: float | None = None, chunk_fn=None,
                  eval_every: int = 0, eval_steps: int = 50):
    """The preset training protocol on the mesh: `loops` rounds of `no_steps`
    fused steps with act_noise decayed per round and rewards clamped
    (FluidSetup.jl:541-556 lifted to chunked SPMD execution).

    `noise_decay` overrides the preset's per-loop factor; `chunk_fn` lets a
    caller reuse one compiled chunk program across many invocations (the
    restart driver train_multi_sharded calls this per round — re-making the
    jitted wrapper each time would retrace).

    `eval_every > 0` additionally runs a DETERMINISTIC sharded evaluation
    rollout (make_eval_fn on the preset's canonical eval fields) every N
    training steps, and those evals then drive the best-actor snapshot —
    the sharded twin of train_batched's eval-driven selection: with
    hundreds of noisy episodes finishing per chunk, the reference's
    best-noisy-episode rule (PDEhook.jl:65-76) selects exploration luck.
    `eval_steps` is the rollout horizon in env steps; the eval scan has no
    te cap (blow-up termination only), so horizons past the training
    episode length measure stabilization — the long-horizon semantics of
    the r04 batched-eval upgrade come built in.

    Returns (MCState, PDEHook). The hook is assembled from the per-chunk
    episode records + the on-device best tracking, in the same format the
    fidelity loop produces, so `train.checkpoint.save` ships it unchanged.
    """
    import time

    from distributedconvrl_pde_control_tpu.train.hooks import PDEHook
    from distributedconvrl_pde_control_tpu.train.records import (
        SPARSE_RECORDS_MIN_BYTES,
        consume_record_read,
        record_bytes,
        start_record_read,
    )

    cfg, tcfg = trainer.cfg, trainer.tcfg
    loops = loops if loops is not None else cfg.loops
    no_steps = no_steps if no_steps is not None else cfg.no_steps
    decay = noise_decay if noise_decay is not None else cfg.noise_decay
    if state is None:
        state = trainer.init(jax.random.PRNGKey(seed), seed=seed)
    if hook is None:
        hook = PDEHook(min_best_episode=cfg.min_best_episode,
                       collect_best_trace=False)
    if chunk_fn is None:
        chunk_fn = trainer.make_chunk_fn(tcfg.chunk_len)

    eval_fn = eval_w0 = None
    best_eval = None  # (mean step reward, step, episode, actor params)
    if eval_every and not hasattr(hook, "evals"):
        hook.evals = []  # (total steps, deterministic mean step reward)
    next_eval = eval_every if eval_every else None
    total_steps = 0

    def run_eval(actor):
        rec = eval_fn(actor, eval_w0)
        rs = np.asarray(rec["reward_mean"])
        active = np.asarray(rec["active"])
        return float(rs[active].mean()) if active.any() else float("nan")

    noise = float(state.agent.act_noise)
    # DEEP software pipeline (deeper than train_batched, whose ~1 s chunks
    # hide the RPC at depth 1): start the ASYNC host copy of chunk n's
    # packed record array at dispatch time and consume it only after
    # dispatching chunks n+1..n+depth, so the ~20-40 ms axon-tunnel RPC
    # (latency-bound — the packed array is tiny) overlaps SEVERAL chunks of
    # device compute. The depth-sweep measurement (ShardedTrainConfig.
    # pipeline_depth note) flattens at depth 4 = the drain-at-end floor.
    # Pending chunks are drained at each loop boundary so reward clamping
    # and the per-loop print see complete accounting.
    depth = max(1, tcfg.pipeline_depth)
    pending: list = []
    # Dense (one full-plane RPC) vs sparse (header + finished-step rows)
    # record reads share the crossover measured for train_batched
    # (train/records.py): the fluid presets' 8-env planes stay dense, a
    # dp-scaled env batch flips to sparse automatically.
    sparse = record_bytes(tcfg.chunk_len, tcfg.n_envs) >= SPARSE_RECORDS_MIN_BYTES
    for i in range(loops):
        state = state.replace(
            agent=state.agent.replace(act_noise=jnp.asarray(noise, jnp.float32)))
        t0 = time.time()
        steps = 0
        while steps < no_steps:
            state, recs = chunk_fn(state)
            pending.append(start_record_read(recs, sparse))
            if len(pending) > depth:
                hook.feed_episode_records(consume_record_read(pending.pop(0)))
            steps += tcfg.chunk_len
            total_steps += tcfg.chunk_len
            if next_eval is not None and total_steps >= next_eval:
                if eval_fn is None:
                    eval_fn = trainer.make_eval_fn(eval_steps)
                    eval_w0 = trainer.eval_w0()
                r_eval = run_eval(state.agent.actor)
                hook.evals.append((total_steps, r_eval))
                if best_eval is None or r_eval > best_eval[0]:
                    # the eval synchronized the host, so reading the device
                    # episode counter costs nothing extra
                    best_eval = (r_eval, total_steps, int(state.ep_count),
                                 jax.tree.map(np.asarray, state.agent.actor))
                next_eval += eval_every
        for handle in pending:
            hook.feed_episode_records(consume_record_read(handle))
        pending.clear()
        if verbose:
            print(f"[{cfg.name} sharded {trainer.n_dp}x{trainer.n_sp}] "
                  f"loop {i + 1}/{loops} noise={noise:.4f} "
                  f"best={float(state.best_reward):.4f} eps={int(state.ep_count)} "
                  f"({time.time() - t0:.1f}s)")
        noise *= decay
        hook.clamp_rewards(-3000.0, 0.0)

    finalize_hook(hook, state)
    if best_eval is not None:
        # deterministic-eval-driven selection overrides the on-device
        # best-noisy-episode snapshot (same rule as train_batched:
        # hook.bestreward then holds the best eval mean STEP reward)
        hook.best_actor = best_eval[3]
        hook.bestreward = best_eval[0]
        hook.bestepisode = best_eval[2]
    return state, hook


def train_multi_sharded(trainer: ShardedFluidTrainer, no_episodes: int = 17,
                        n_experiments: int = 2, save_fn=None, seed: int = 0,
                        restart_noise: float = 0.17, inner_decay: float = 0.7,
                        inner_loops: int = 18, verbose: bool = True):
    """Multi-experiment endless-restart driver ON THE MESH — the sharded
    twin of train.drivers.train_multi.

    Mirrors the reference's fluid train_multi (FluidSetup.jl:559-601; the KS
    variant KSSetup.jl:321-363 differs only in constants): each experiment
    re-seeds and re-initializes everything, then runs rounds of ONE episode's
    worth of fused steps with act_noise reset to `restart_noise` every
    `inner_loops` rounds and decayed by `inner_decay` per round, until the
    hook has recorded `no_episodes` finished episodes; the experiment is then
    checkpointed via `save_fn(n_experiment, state, hook)` (numbered
    save_sharded) and its best reward collected. `n_experiments <= 0`
    restarts endlessly (the reference's `while true`; each experiment's
    checkpoint is already saved by the time you Ctrl-C).

    Note the episode accounting is per-ENV: with n_envs environments on the
    dp axis, one episode-length round finishes n_envs episodes at once, so
    `no_episodes` is reached n_envs x faster in wall-rounds than the
    reference's single-env count — the restart protocol (schedule shape,
    numbered saves) is what's being reproduced, not the single-env pacing.
    """
    from distributedconvrl_pde_control_tpu.train.hooks import PDEHook

    cfg, tcfg = trainer.cfg, trainer.tcfg
    episode_steps = int(round((cfg.te - cfg.t0) / cfg.dt))
    chunk_fn = trainer.make_chunk_fn(tcfg.chunk_len)
    best_rewards = []
    n_exp = 0
    while True:
        n_exp += 1
        if n_experiments > 0 and n_exp > n_experiments:
            break
        exp_seed = seed + 7919 * n_exp  # fresh stream per experiment
        state = trainer.init(jax.random.PRNGKey(exp_seed), seed=exp_seed)
        hook = PDEHook(min_best_episode=cfg.min_best_episode,
                       collect_best_trace=False)
        if verbose:
            print(f"--------- STARTING EXPERIMENT # {n_exp} ---------")
        noise = restart_noise
        rounds = 0
        while hook.ep - 1 < no_episodes:
            if rounds % inner_loops == 0:
                noise = restart_noise
            state = state.replace(agent=state.agent.replace(
                act_noise=jnp.asarray(noise, jnp.float32)))
            state, hook = train_sharded(trainer, loops=1,
                                        no_steps=episode_steps, state=state,
                                        hook=hook, verbose=False,
                                        noise_decay=1.0, chunk_fn=chunk_fn)
            noise *= inner_decay
            rounds += 1
        best_rewards.append(hook.bestreward)
        if save_fn is not None:
            save_fn(n_exp, state, hook)
        if verbose:
            print(f"--------- BEST REWARD: {hook.bestreward} ---------")
    return best_rewards


def finalize_hook(hook, state: MCState) -> None:
    """Copy the on-device best tracking into the host hook."""
    if np.isfinite(float(state.best_reward)):
        hook.bestreward = float(state.best_reward)
        hook.bestepisode = int(state.best_episode)
        hook.best_actor = jax.tree.map(np.asarray, state.best_actor)
    hook.current_actor = state.agent.actor


def save_sharded(out_dir: str, trainer: ShardedFluidTrainer, state: MCState,
                 hook, number=None) -> None:
    """Checkpoint a sharded training run in the STANDARD light format
    (train.checkpoint), so single-chip eval/resume paths consume it
    unchanged. The per-dp replay is not persisted (light semantics)."""
    from distributedconvrl_pde_control_tpu.agents.replay import replay_init
    from distributedconvrl_pde_control_tpu.train import checkpoint
    from distributedconvrl_pde_control_tpu.train.loop import TrainState

    acfg = trainer.agent.cfg
    ts = TrainState(
        agent=jax.tree.map(np.asarray, state.agent),
        replay=replay_init(1, acfg.ns, acfg.na_rows),
        key=np.asarray(state.key),
    )
    checkpoint.save(out_dir, ts, hook, number=number, include_replay=False)


def load_sharded(load_dir: str, trainer: ShardedFluidTrainer, number=None):
    """Load a standard-format checkpoint (full or light) against this
    trainer's agent template. Returns (DDPGState, PDEHook)."""
    from distributedconvrl_pde_control_tpu.train import checkpoint
    from distributedconvrl_pde_control_tpu.train.loop import TrainState

    acfg = trainer.agent.cfg
    ts_template = TrainState(
        agent=trainer.agent.init_state(jax.random.PRNGKey(0)),
        replay=replay_init(1, acfg.ns, acfg.na_rows),
        key=jax.random.PRNGKey(0),
    )
    ts, hook = checkpoint.load(load_dir, ts_template, number=number)
    return ts.agent, hook


def load_actor_for_eval(load_dir: str, trainer: ShardedFluidTrainer):
    """Best actor params from a checkpoint (falling back to the current
    actor) — the plot_heat/testrun bestNNA swap-in (plotting.jl:28-30)."""
    agent_state, hook = load_sharded(load_dir, trainer)
    if hook.best_actor is not None:
        return jax.tree.map(jnp.asarray, hook.best_actor)
    return agent_state.actor
