"""Population trainer — P independent training runs fused into ONE program.

The studies this repo (and the reference's workflow) actually runs are
populations: training-seed robustness tables, noise-schedule ablations,
lr/noise hyperparameter sweeps (RESULTS.md runs 3-5 seeds per recipe; the
reference hand-loops the same study over Julia processes,
scripts/KS/setup/KSSetup.jl:321-363 restart protocol). On a TPU those runs
are embarrassingly parallel AND individually too small to fill the chip —
a 256-env member uses a fraction of the MXU the 16k-env bench config
saturates.

ARCHITECTURE (the measured one, not the obvious one). The obvious design —
vmap the whole fused train step over a member axis — was built first and
measured at 0.9x SERIAL speed at P=8 (i.e. slower than running members one
at a time): under vmap the auto-reset `lax.cond(any(done))` boundary skip
has a batched predicate and lowers to an every-step select (fresh-state
gather + B-wide select, ~50% of the step), and the replay push's
per-member traced pointer turns the contiguous `dynamic_update_slice` into
a scatter (PERFORMANCE.md population note). The shipped design instead
FLATTENS the members into the environment axis: one BatchedTrainer over
P*B envs (member-major), where the solver, featurizer, auto-reset cond
(scalar predicate again — members share episode clocks), replay push (one
contiguous slice at one shared pointer), and accounting are byte-identical
to the single-run 16k-env program that already saturates the chip. Only
what actually differs per member is vmapped: the 580-parameter actor/
critic forwards over member column blocks, the per-member replay-region
sampling, and the per-member Adam updates (`PopulationDDPG`).

Per-member variation supported inside the one program:
* PRNG env/exploration streams (member-major env blocks draw independent
  resets; exploration noise is one draw over all columns).
* `act_noise` and its decay schedule — a (P,) DDPGState leaf, scaled per
  member column block; the driver decays it with a (P,) factor vector.
* actor/critic learning rates — optax `inject_hyperparams(adam)` makes lr
  an optimizer-STATE leaf ((P,) under the stacked member axis). Adam's
  update is linear in lr, so this is exact.

Member ISOLATION is structural: member p's policy sees only its own
columns, its gradients come only from its own replay region (slot
arithmetic below), and its Adam state is its own stacked row — verified by
the 0-lr freeze and region-isolation tests (tests/test_population.py).
Members are statistically independent runs of the same recipe, not
bitwise replicas of standalone seeds. The divergences are pinned exactly
by tests/test_population.py::test_population_p1_matches_solo: the
member-axis init key split and the member-region sampler's two-draw slot
scheme (plus float-ULP rounding reorder in the vmapped learn math) — the
entire P=1 rollout path is bitwise-equal to the solo BatchedTrainer, and
per-step exploration/reset key draws are shared across the member axis.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from distributedconvrl_pde_control_tpu.agents.ddpg import DDPGAgent, DDPGState
from distributedconvrl_pde_control_tpu.train.batched import (
    BatchedTrainer,
    BatchedTrainerConfig,
)


def _replace_hyperparam(opt_state, name: str, value):
    """Functionally set an inject_hyperparams state's hyperparameter leaf."""
    hp = dict(opt_state.hyperparams)
    hp[name] = jnp.asarray(value, jnp.float32)
    return opt_state._replace(hyperparams=hp)


def member_slot_indices(key, n_chunks: int, P: int, block: int, batch_size: int):
    """Per-member uniform slot indices into the member-major replay.

    The flat trainer pushes `P * block` columns per step (block = per-member
    envs x actuators, member-major), so member p owns exactly the slots
    `k * (P*block) + p*block + j` for push index k and offset j < block.
    Returns (P, batch_size) physical slot indices, uniform over each
    member's own filled region — the same per-member distribution as P
    standalone buffers (agents/replay.py replay_sample on each).
    """
    kk, kj = jax.random.split(key)
    n = jnp.maximum(n_chunks, 1)
    k_idx = jax.random.randint(kk, (P, batch_size), 0, n)
    j_idx = jax.random.randint(kj, (P, batch_size), 0, block)
    members = jnp.arange(P, dtype=jnp.int32)[:, None]
    return k_idx * (P * block) + members * block + j_idx


class PopulationDDPG(DDPGAgent):
    """DDPGAgent with a leading (P,) member axis on parameters/optimizers,
    presenting the stock agent interface over MEMBER-MAJOR column blocks so
    `BatchedTrainer._train_step` runs unchanged on the flat P*B env batch.

    `cfg` it exposes to the trainer scales `capacity` and `update_after`
    by P (the shared buffer holds every member's region; the learn gate
    should fire at the same per-member fill as a standalone run).
    """

    def __init__(self, base_cfg, n_members: int, n_envs_per_member: int,
                 lr_actor=None, lr_critic=None, **agent_kwargs):
        self.n_members = int(n_members)
        self.block = n_envs_per_member * base_cfg.n_actuators
        self.base_cfg = base_cfg
        self.lr_actor = None if lr_actor is None else np.asarray(lr_actor, np.float32)
        self.lr_critic = None if lr_critic is None else np.asarray(lr_critic, np.float32)
        for nm, arr in (("lr_actor", self.lr_actor), ("lr_critic", self.lr_critic)):
            if arr is not None and arr.shape != (self.n_members,):
                raise ValueError(f"{nm} must be shape ({self.n_members},), got {arr.shape}")
        cfg = dataclasses.replace(
            base_cfg,
            capacity=base_cfg.capacity * self.n_members,
            update_after=base_cfg.update_after * self.n_members)
        super().__init__(cfg, **agent_kwargs)
        if self.lr_actor is not None or self.lr_critic is not None:
            # traced learning rates: lr becomes an opt-state leaf so each
            # member's stacked Adam row carries its own
            self.opt_a = optax.inject_hyperparams(optax.adam)(
                learning_rate=float(cfg.learning_rate))
            self.opt_c = optax.inject_hyperparams(optax.adam)(
                learning_rate=float(cfg.learning_rate_critic))
        # standalone single-member agent for the vmapped per-member learn
        # math and member init (the stock learn_batch dispatches
        # self.actor_apply — on THIS subclass that is the member-blocked
        # wrapper, wrong inside the per-member vmap). Shares the (possibly
        # injected) optimizers so opt-state structures match.
        self._solo = DDPGAgent(base_cfg, hidden_act=self.hidden_act,
                               hidden_act_critic=self.hidden_act_critic)
        self._solo.opt_a = self.opt_a
        self._solo.opt_c = self.opt_c

    # -------------------------------------------------------- member blocks
    def _to_members(self, x):
        """(rows, P*block_cols) member-major columns -> (P, rows, block_cols)."""
        rows, cols = x.shape
        return jnp.moveaxis(x.reshape(rows, self.n_members, cols // self.n_members),
                            1, 0)

    def _from_members(self, x):
        """(P, rows, block_cols) -> (rows, P*block_cols) member-major."""
        P, rows, bc = x.shape
        return jnp.moveaxis(x, 0, 1).reshape(rows, P * bc)

    # ------------------------------------------------------------- networks
    def actor_apply(self, params, s):
        """Stacked per-member actor over member-major column blocks."""
        outs = jax.vmap(super().actor_apply)(params, self._to_members(s))
        return self._from_members(outs)

    def critic_apply(self, params, s, a):
        outs = jax.vmap(super().critic_apply)(
            params, self._to_members(s), self._to_members(a))
        return self._from_members(outs)

    # ------------------------------------------------------------------ init
    def init_state(self, key) -> DDPGState:
        P = self.n_members
        members = [self._solo.init_state(k) for k in jax.random.split(key, P)]
        st = jax.tree.map(lambda *xs: jnp.stack(xs), *members)
        # update_step stays a SCALAR (members step in lockstep; the learn
        # gate's lax.cond predicate must stay scalar to stay a cond)
        st = st.replace(
            update_step=members[0].update_step,
            act_noise=jnp.full((P,), self.cfg.act_noise, jnp.float32))
        ag = st
        if self.lr_actor is not None:
            ag = ag.replace(opt_actor=_replace_hyperparam(
                ag.opt_actor, "learning_rate", self.lr_actor))
        if self.lr_critic is not None:
            ag = ag.replace(opt_critic=_replace_hyperparam(
                ag.opt_critic, "learning_rate", self.lr_critic))
        return ag

    # ------------------------------------------------------------------- act
    def act(self, astate: DDPGState, obs, key, learning: bool = True):
        """Policy call over the flat member-major columns: per-member actor
        forward, ONE exploration-noise draw scaled by each member's
        act_noise over its column block, shared warmup gate (same
        semantics as DDPGAgent.act per member)."""
        cfg = self.cfg
        k_start, k_noise = jax.random.split(key)
        actions = self.actor_apply(astate.actor, obs)
        shape = actions.shape
        if learning:
            col_scale = jnp.repeat(astate.act_noise, self.block)
            noise = jax.random.normal(k_noise, shape) * col_scale
            if cfg.memory_size > 0:
                noise = noise.at[-cfg.memory_size:, :].set(0.0)
            actions = actions + noise
            in_warmup = astate.update_step <= cfg.start_steps
            actions = jnp.where(in_warmup,
                                self.start_action(k_start, shape, obs), actions)
        return jnp.clip(actions, -cfg.act_limit, cfg.act_limit)

    # ----------------------------------------------------------------- learn
    def sample(self, replay, key, batch_size: int):
        """Member-region sampling: (P, batch) slots via the member-major
        slot arithmetic, gathered once into (P,)-stacked column batches.

        Skinny buffers take the same 128-lane BLOCK-gather fast path as the
        single-run sampler (agents/replay.py replay_sample): a per-element
        lane gather on the slot-minor buffer is the measured whole-step
        cliff the block trick fixes (PERFORMANCE.md block-gather note), and
        member slots are ordinary lanes — the trick applies unchanged."""
        P, block = self.n_members, self.block
        push = P * block
        idx = member_slot_indices(key, replay.size // push, P, block, batch_size)
        capacity = replay.s.shape[1]
        if (capacity % 128 == 0 and replay.s.shape[0] == 1
                and replay.a.shape[0] == 1):
            blk = idx // 128  # (P, batch)
            onehot = jax.nn.one_hot(idx % 128, 128, dtype=replay.r.dtype)
            nblk = capacity // 128

            def g1(x):  # (capacity,) -> (P, batch)
                rows = x.reshape(nblk, 128)[blk]  # (P, batch, 128)
                return jnp.einsum("pbl,pbl->pb", rows, onehot)

            def g2(x):  # (1, capacity) -> (P, 1, batch)
                return g1(x.reshape(capacity))[:, None, :]

            return (g2(replay.s), g2(replay.a), g1(replay.r), g1(replay.t),
                    g2(replay.sn))
        take2 = lambda x: jnp.moveaxis(x[:, idx], 1, 0)  # (d, P, B) -> (P, d, B)
        return (take2(replay.s), take2(replay.a), replay.r[idx], replay.t[idx],
                take2(replay.sn))

    def learn_batch(self, astate: DDPGState, batch, axis_name=None) -> DDPGState:
        """vmap of the stock learn step (same math per member,
        PDEagent.jl:363-418) over the stacked member axis."""
        st_axes = jax.tree.map(lambda _: 0, astate).replace(update_step=None)
        return jax.vmap(partial(self._solo.learn_batch, axis_name=axis_name),
                        in_axes=(st_axes, 0), out_axes=st_axes)(astate, batch)

    # ------------------------------------------------------------- slicing
    def member_state(self, astate: DDPGState, i: int) -> DDPGState:
        """Member i's standalone-format DDPGState (standard Adam structure —
        fresh moments when traced lrs were in play, since those opt states
        carry the inject wrapper; shipping policies never needs them)."""
        take = lambda t: jax.tree.map(lambda x: np.asarray(x[i]), t)  # noqa: E731
        st = DDPGState(
            actor=take(astate.actor), critic=take(astate.critic),
            target_actor=take(astate.target_actor),
            target_critic=take(astate.target_critic),
            opt_actor=take(astate.opt_actor), opt_critic=take(astate.opt_critic),
            act_noise=np.asarray(astate.act_noise[i]),
            update_step=np.asarray(astate.update_step),
            actor_loss=np.asarray(astate.actor_loss[i]),
            critic_loss=np.asarray(astate.critic_loss[i]))
        if self.lr_actor is not None or self.lr_critic is not None:
            st = st.replace(
                opt_actor=optax.adam(self.base_cfg.learning_rate).init(st.actor),
                opt_critic=optax.adam(self.base_cfg.learning_rate_critic).init(st.critic))
        return st


class PopulationTrainer:
    """P-member population as ONE flat BatchedTrainer program.

    `cfg.n_envs` is PER MEMBER; the device program runs P * n_envs
    environments member-major. `lr_actor`/`lr_critic`: optional (P,)
    per-member learning rates (see PopulationDDPG).

    POPULATION x DP (`mesh`): pass a pure-dp mesh (parallel/batched_dp.py
    dp_mesh) to shard the study over devices — exactly how a pod runs the
    robustness studies this trainer productized (reference workflow being
    scaled: scripts/KS/setup/KSSetup.jl:321-363). Every device runs a
    LOCAL mini-population: P members x (n_envs / n_dp) envs member-major,
    so the global env axis is DEVICE-major (device d's slice holds a
    member-major block of every member). The per-member vmapped learner's
    gradient pmean runs INSIDE the member vmap over the dp axis, which
    scopes it per member-shard automatically — member p's gradients
    reduce over p's env sub-blocks on all devices and never mix with
    other members'. Replay regions, slot arithmetic, act-noise blocks,
    and the auto-reset cond all operate on local widths unchanged
    (DPBatchedTrainer wraps the identical per-device program). Member
    evals run on one device's local env batch (params replicated — the
    same convention as DPBatchedTrainer.eval_mean_reward), so the eval IC
    batch per member is n_envs/n_dp. Layout/isolation tests:
    tests/test_population_dp.py.
    """

    def __init__(self, env, agent: DDPGAgent, cfg: BatchedTrainerConfig,
                 n_members: int, random_init=None, y0_pool=None,
                 eval_y0_pool=None, lr_actor=None, lr_critic=None, mesh=None):
        self.n_members = int(n_members)
        self.mesh = mesh
        self.n_dp = 1 if mesh is None else mesh.shape["dp"]
        if cfg.n_envs % self.n_dp:
            raise ValueError(f"per-member n_envs={cfg.n_envs} must divide "
                             f"by dp={self.n_dp}")
        self.n_envs_per_member = cfg.n_envs  # GLOBAL per member
        self.n_envs_member_local = cfg.n_envs // self.n_dp
        self.agent = PopulationDDPG(
            agent.cfg, self.n_members, self.n_envs_member_local,
            lr_actor=lr_actor,
            lr_critic=lr_critic, hidden_act=agent.hidden_act,
            hidden_act_critic=agent.hidden_act_critic)
        flat_cfg = dataclasses.replace(cfg, n_envs=self.n_members * cfg.n_envs)
        if mesh is None:
            self.base = BatchedTrainer(env, self.agent, flat_cfg,
                                       random_init=random_init, y0_pool=y0_pool,
                                       eval_y0_pool=eval_y0_pool)
        else:
            from distributedconvrl_pde_control_tpu.parallel.batched_dp import (
                DPBatchedTrainer,
            )

            self.base = DPBatchedTrainer(env, self.agent, flat_cfg, mesh,
                                         random_init=random_init,
                                         y0_pool=y0_pool,
                                         eval_y0_pool=eval_y0_pool)
        self._eval_fns = {}

    @property
    def _local(self):
        """The per-device BatchedTrainer (the trainer itself when unsharded)."""
        return self.base.local if self.mesh is not None else self.base

    # ------------------------------------------------------------------ init
    def init(self, key):
        return self.base.init(key)

    def make_chunk_fn(self, n_steps: int, learn: bool = True):
        """One program: P members x `n_steps` fused train steps over the
        flat member-major env batch. Records come back as the flat
        (5, n_steps, P*n_envs) plane; slice member p's env columns
        [p*n_envs, (p+1)*n_envs)."""
        return self.base.make_chunk_fn(n_steps, learn)

    # ------------------------------------------------------------------ eval
    def eval_mean_rewards(self, actors, n_steps: int, key=None,
                          warmup_steps: int = 0,
                          score: str = "mean") -> np.ndarray:
        """Deterministic per-member evaluation: every member's actor rolls
        the SAME freshly-drawn initial-condition batch (tiled member-major —
        fair comparison), long-horizon semantics inherited from
        BatchedTrainer._make_eval_fn (te-overridden env clone past the
        episode cap). Returns (P,) mean per-step rewards over active steps.
        On a dp mesh the eval runs one device's LOCAL env batch (params are
        replicated; n_envs/n_dp ICs per member).

        `warmup_steps > 0` = the OOD selection protocol (delayed actuation
        on developed states, batched.py eval_mean_reward docstring) — built
        because the Keller-Segel study measured 2/8 members whose OOD
        failure is INVISIBLE to the warmup-0 eval (RESULTS.md r05 table).
        `score="min"` = worst-case member scoring (min over each member's
        per-env masked means instead of the pooled mean) — the further fix
        after measuring that MEAN scoring dilutes a 1-in-32-IC catastrophic
        failure to invisibility (RESULTS.md r05 OOD-selection A/B)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        B = self.n_envs_member_local
        cache_key = (n_steps, warmup_steps)
        run = self._eval_fns.get(cache_key)
        if run is None:
            run = self._local._make_eval_fn(n_steps, warmup_steps)
            self._eval_fns[cache_key] = run
        y0s = self._local._fresh_eval_y0s(key, B)
        y0s_flat = jnp.concatenate([y0s] * self.n_members, axis=0)
        rs, actives = run(actors, y0s_flat)
        rs, actives = np.asarray(rs), np.asarray(actives)
        out = np.full((self.n_members,), np.nan, np.float64)
        for i in range(self.n_members):
            r, m = rs[:, i * B:(i + 1) * B], actives[:, i * B:(i + 1) * B]
            if not m.any():
                continue
            if score == "min":
                per_env = BatchedTrainer._env_scores(r, m)
                if np.isfinite(per_env).any():
                    out[i] = np.nanmin(per_env)
            else:
                out[i] = r[m].mean()
        return out

    def member_records(self, packed, i: int):
        """Member i's (5, n_steps, n_envs) record slice of the flat plane.
        NB the REC_MEAN_REWARD row is the population-global per-step mean
        (the fused step reduces over all envs, like the DP trainer's global
        scalars); per-member curves come from ep_reward/eval rows.

        Unsharded, the flat env axis is member-major; on a dp mesh it is
        DEVICE-major (device blocks of member-major local slices — the
        DPBatchedTrainer global record order), so member i's columns are
        gathered from every device block."""
        if self.mesh is None:
            B = self.n_envs_per_member
            return packed[:, :, i * B:(i + 1) * B]
        k, n, _ = packed.shape
        D, P, B = self.n_dp, self.n_members, self.n_envs_member_local
        return packed.reshape(k, n, D, P, B)[:, :, :, i, :].reshape(k, n, D * B)


def train_population(trainer: PopulationTrainer, total_steps: int, key=None,
                     act_noise=None, noise_decay_every: int = 0,
                     noise_decay=0.5, chunk_len: int = 50,
                     verbose: bool = False, eval_every: int = 0,
                     eval_steps: int = 50, eval_warmup_steps: int = 0,
                     eval_score: str = "mean", pipeline_depth: int = 4):
    """Chunked population training driver — train_batched semantics per
    member (same pipeline depth, same eval-driven best-actor selection),
    P members at once.

    `act_noise` / `noise_decay`: scalars or (P,) per-member arrays.
    Returns (flat state, list of P PDEHooks, (chunks,) global mean rewards).
    Each hook carries its member's episode accounting and (with
    `eval_every`) its eval-selected best actor, exactly like the
    single-run driver's hook. Episode indices in the hooks are GLOBAL
    population counts (like the DP trainer's global accounting).
    """
    from distributedconvrl_pde_control_tpu.train.hooks import PDEHook
    from distributedconvrl_pde_control_tpu.utils.hostarray import start_host_copies

    P = trainer.n_members
    decay = np.broadcast_to(np.asarray(noise_decay, np.float32), (P,))
    ts = trainer.init(key if key is not None else jax.random.PRNGKey(0))
    if act_noise is not None:
        noise = jnp.asarray(np.asarray(act_noise, np.float32))
        if noise.shape != (P,):
            raise ValueError(f"act_noise must be shape ({P},), got {noise.shape}")
        ts = ts.replace(agent=ts.agent.replace(act_noise=noise))
    chunk_fn = trainer.make_chunk_fn(chunk_len)
    hooks = [PDEHook(min_best_episode=trainer.base.cfg.min_best_episode,
                     collect_best_trace=False) for _ in range(P)]
    for h in hooks:
        h.evals = []
    chunk_means = []
    steps_done = 0
    next_decay = noise_decay_every if noise_decay_every else None
    next_eval = eval_every if eval_every else None
    best_evals = [None] * P  # (reward, step, episode, actor) per member

    def _consume(recs_dev):
        arr = np.asarray(recs_dev)
        for i in range(P):
            hooks[i].feed_episode_records(trainer.member_records(arr, i))
        chunk_means.append(float(arr[4, :, 0].mean()))

    depth = max(1, pipeline_depth)
    pending: list = []
    while steps_done < total_steps:
        ts, recs = chunk_fn(ts)
        steps_done += chunk_len
        start_host_copies(recs)
        pending.append(recs)
        if len(pending) > depth:
            _consume(pending.pop(0))
        if next_decay is not None and steps_done >= next_decay:
            ts = ts.replace(agent=ts.agent.replace(
                act_noise=ts.agent.act_noise * jnp.asarray(decay)))
            next_decay += noise_decay_every
        if next_eval is not None and steps_done >= next_eval:
            rs = trainer.eval_mean_rewards(ts.agent.actor, eval_steps,
                                           warmup_steps=eval_warmup_steps,
                                           score=eval_score)
            ep_count = int(ts.ep_count)
            for i in range(P):
                hooks[i].evals.append((steps_done, float(rs[i])))
                if best_evals[i] is None or rs[i] > best_evals[i][0]:
                    actor_i = jax.tree.map(lambda x: np.asarray(x[i]),
                                           ts.agent.actor)
                    best_evals[i] = (float(rs[i]), steps_done, ep_count,
                                     actor_i)
            next_eval += eval_every
        if verbose and chunk_means:
            print(f"steps {steps_done}: population mean {chunk_means[-1]:.4f} "
                  f"noise {np.asarray(ts.agent.act_noise).round(4)}")
    for recs in pending:
        _consume(recs)
    pending.clear()
    for i in range(P):
        if best_evals[i] is not None:
            hooks[i].best_actor = best_evals[i][3]
            hooks[i].bestreward = best_evals[i][0]
            hooks[i].bestepisode = best_evals[i][2]
            hooks[i].best_eval_step = best_evals[i][1]
        hooks[i].current_actor = jax.tree.map(lambda x: np.asarray(x[i]),
                                              ts.agent.actor)
    return ts, hooks, np.asarray(chunk_means)


# Search axes that can vary INSIDE one fused population program (schedule/
# optimizer knobs — per-member state leaves; structural axes like network
# scale or batch size change program shapes and stay with the serial
# random search, train/hyperopt.py / KSglobalSetup.jl:269).
SCHEDULE_SPACE = {
    "act_noise": ("uniform", 0.3, 2.0),
    "noise_decay": ("uniform", 0.2, 0.9),
    "learning_rate": ("loguniform", 1e-4, 3e-3),
    "learning_rate_critic": ("loguniform", 2e-4, 6e-3),
}


def population_search(env, agent, cfg: BatchedTrainerConfig, n_trials: int,
                      total_steps: int, *, members_per_round: int = 8,
                      space=None, seed: int = 0, noise_decay_every: int = 0,
                      eval_every: int = 50, eval_steps: int = 500,
                      eval_warmup_steps: int = 0, eval_score: str = "mean",
                      chunk_len: int = 50, random_init=None, y0_pool=None,
                      eval_y0_pool=None, verbose: bool = True, mesh=None):
    """Schedule/optimizer hyperparameter search where every round of up to
    `members_per_round` trials trains as ONE fused population program, and
    trials are scored by their eval-driven best (default: the long-horizon
    deterministic eval reward — the stabilization metric artifact selection
    uses, unlike the reference's short test_setup cost).

    Returns (best, trials, best_hook, best_state): `best['params']` is the
    winning schedule, `best_hook` carries its eval-selected actor, and
    `best_state` its standalone-format DDPGState (save both with
    `checkpoint.save` like any run). A 16-trial search costs ~2 population
    runs of wall-clock instead of 16 serial trainings.
    """
    from distributedconvrl_pde_control_tpu.train.hyperopt import sample_trial

    space = space or SCHEDULE_SPACE
    rng = np.random.default_rng(seed)
    params = [sample_trial(rng, space) for _ in range(n_trials)]
    trials = []
    best = {"reward": -np.inf, "params": None, "trial": -1}
    best_hook = best_state = None
    done = 0
    rnd = 0
    while done < n_trials:
        P = min(members_per_round, n_trials - done)
        batch = params[done:done + P]
        trainer = PopulationTrainer(
            env, agent, cfg, P, random_init=random_init, y0_pool=y0_pool,
            eval_y0_pool=eval_y0_pool,
            lr_actor=[p["learning_rate"] for p in batch],
            lr_critic=[p["learning_rate_critic"] for p in batch], mesh=mesh)
        ts, hooks, _ = train_population(
            trainer, total_steps=total_steps,
            key=jax.random.PRNGKey(seed + 1000 * rnd),
            act_noise=[p["act_noise"] for p in batch],
            noise_decay_every=noise_decay_every or max(1, total_steps // 8),
            noise_decay=[p["noise_decay"] for p in batch],
            chunk_len=chunk_len, eval_every=eval_every, eval_steps=eval_steps,
            eval_warmup_steps=eval_warmup_steps, eval_score=eval_score)
        for i, p in enumerate(batch):
            row = {"trial": done + i, "round": rnd,
                   "eval_reward": float(hooks[i].bestreward), **p}
            trials.append(row)
            if verbose:
                import json as _json

                print(_json.dumps({k: (round(v, 6) if isinstance(v, float)
                                       else v) for k, v in row.items()}),
                      flush=True)
            if row["eval_reward"] > best["reward"]:
                best = {"reward": row["eval_reward"], "params": p,
                        "trial": done + i}
                best_hook = hooks[i]
                best_state = trainer.agent.member_state(ts.agent, i)
        done += P
        rnd += 1
    if verbose:
        import json as _json

        print(_json.dumps({"best_trial": best["trial"],
                           "best_eval_reward": round(best["reward"], 6),
                           "best_params": best["params"]}), flush=True)
    return best, trials, best_hook, best_state


def save_population(out_dir: str, trainer: PopulationTrainer, ts, hooks,
                    overrides=None, member_tags=None) -> dict:
    """Write each member as a standard light checkpoint under
    `out_dir/member_XX[_tag]` (checkpoint.save format — --eval/--load-from
    interoperate unchanged) plus a rank summary `population.json`."""
    import json

    from distributedconvrl_pde_control_tpu.agents.replay import replay_init
    from distributedconvrl_pde_control_tpu.train import checkpoint
    from distributedconvrl_pde_control_tpu.train.loop import TrainState

    acfg = trainer.agent.base_cfg
    key_arr = np.asarray(ts.key)
    if key_arr.ndim == 2:  # dp-sharded runs carry a per-device key leaf
        key_arr = key_arr[0]
    rows = []
    for i, hook in enumerate(hooks):
        tag = f"member_{i:02d}" + (f"_{member_tags[i]}" if member_tags else "")
        mdir = os.path.join(out_dir, tag)
        ts_std = TrainState(agent=trainer.agent.member_state(ts.agent, i),
                            replay=replay_init(1, acfg.ns, acfg.na_rows),
                            key=key_arr)
        checkpoint.save(mdir, ts_std, hook, include_replay=False,
                        config_overrides=overrides)
        rows.append({"member": i, "dir": tag,
                     "best_reward": float(hook.bestreward),
                     "best_episode": int(hook.bestepisode),
                     "episodes": int(hook.ep - 1),
                     "evals": getattr(hook, "evals", [])})
    rows_ranked = sorted(rows, key=lambda r: -r["best_reward"])
    summary = {"n_members": trainer.n_members, "ranking": rows_ranked}
    with open(os.path.join(out_dir, "population.json"), "w") as f:
        json.dump(summary, f, indent=1)
    return summary
