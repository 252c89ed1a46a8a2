"""Training drivers: the experiment-layer entry points.

Rebuild of the reference's per-setup `train` / `train_multi` /
`StopAfterEpisodeWithMinSteps` flow (KSSetup.jl:304-363, StopCondition.jl):
noise-decay outer loops, a min-steps-then-finish-episode stop condition, and
an endless multi-experiment restart driver with numbered checkpoints.
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from distributedconvrl_pde_control_tpu.agents.ddpg import DDPGAgent
from distributedconvrl_pde_control_tpu.envs.pde_env import PDEEnv
from distributedconvrl_pde_control_tpu.train.hooks import PDEHook
from distributedconvrl_pde_control_tpu.train.loop import (
    TrainState,
    init_train_state,
    make_episode_fn,
)


@dataclasses.dataclass
class Setup:
    """A fully assembled experiment: env + agent + training protocol.

    Plays the role of a reference setup file's module-level globals + the
    `initialize_setup()` call (e.g. KSSetup.jl:249-300).
    """

    name: str
    env: PDEEnv
    agent: DDPGAgent
    seed: int = 0
    random_init: Optional[Callable] = None  # key -> y0 (generate_random_init)
    loops: int = 8
    no_steps: int = 800
    noise_decay: float = 0.2
    min_best_episode: int = 1
    record: bool = True
    use_random_init: bool = True
    reward_clamp: float = -3000.0
    error_detection: Optional[Callable] = None

    def make_hook(self) -> PDEHook:
        return PDEHook(
            min_best_episode=self.min_best_episode,
            collect_best_trace=self.record,
            error_detection=self.error_detection,
        )


def run_min_steps(episode_fn, ts: TrainState, hook: PDEHook, setup: Setup, min_steps: int,
                  key) -> tuple:
    """`run(agent, env, StopAfterEpisodeWithMinSteps(n), hook)` — run whole
    episodes until the cumulative step count reaches `min_steps`
    (StopCondition.jl:32-37: budget reached AND episode finished)."""
    steps = 0
    while steps < min_steps:
        key, k0 = jax.random.split(key)
        y0 = setup.random_init(k0) if (setup.use_random_init and setup.random_init) else None
        y0 = y0 if y0 is not None else jnp.asarray(setup.env.y0)
        ts, result = episode_fn(ts, y0)
        hook.on_episode(result, ts.agent)
        steps += int(result.steps)
    return ts, key


def train(setup: Setup, loops: Optional[int] = None, no_steps: Optional[int] = None,
          seed: Optional[int] = None, verbose: bool = True,
          ts: Optional[TrainState] = None, hook: Optional[PDEHook] = None):
    """The per-setup `train()` (KSSetup.jl:304-319): `loops` rounds of
    min-steps training with act_noise decayed each round and rewards clamped
    to [reward_clamp, 0]."""
    loops = loops if loops is not None else setup.loops
    no_steps = no_steps if no_steps is not None else setup.no_steps
    key = jax.random.PRNGKey(setup.seed if seed is None else seed)
    key, k_init = jax.random.split(key)

    episode_fn = make_episode_fn(setup.env, setup.agent, learning=True, record=setup.record)
    if ts is None:
        ts = init_train_state(setup.env, setup.agent, k_init)
    if hook is None:
        hook = setup.make_hook()

    noise = setup.agent.cfg.act_noise
    for i in range(loops):
        ts = ts.replace(agent=ts.agent.replace(act_noise=jnp.asarray(noise, jnp.float32)))
        t0 = time.time()
        ts, key = run_min_steps(episode_fn, ts, hook, setup, no_steps, key)
        if verbose:
            print(
                f"[{setup.name}] loop {i + 1}/{loops} noise={noise:.4f} "
                f"best={hook.bestreward:.4f} ep={hook.ep - 1} ({time.time() - t0:.1f}s)"
            )
        noise *= setup.noise_decay
        hook.clamp_rewards(setup.reward_clamp, 0.0)
    return ts, hook


def train_multi(setup: Setup, no_episodes: int = 2800, n_experiments: int = 2,
                inner_episodes: int = 50, inner_loops: int = 14,
                restart_noise: float = 0.15, inner_decay: float = 0.9,
                save_fn: Optional[Callable] = None, verbose: bool = True):
    """Multi-experiment restart driver (KSSetup.jl:321-363): re-seed and
    re-initialize per experiment, run episode-count loops with their own
    noise schedule, collect best rewards (optionally checkpointing each
    experiment via `save_fn(n_experiment, ts, hook)`).

    `n_experiments <= 0` restarts endlessly — the reference's `while true`
    budget (KSSetup.jl:322; stop with Ctrl-C, each experiment's checkpoint
    is already saved by then). A positive count bounds it for testability.
    """
    best_rewards = []
    master_key = jax.random.PRNGKey(setup.seed)
    n_exp = 0
    while True:
        n_exp += 1
        if n_experiments > 0 and n_exp > n_experiments:
            break
        master_key, k_init, key = jax.random.split(master_key, 3)
        episode_fn = make_episode_fn(setup.env, setup.agent, learning=True, record=setup.record)
        ts = init_train_state(setup.env, setup.agent, k_init)
        hook = setup.make_hook()
        if verbose:
            print(f"--------- STARTING EXPERIMENT # {n_exp} ---------")
        n = 0
        while n < no_episodes:
            noise = restart_noise
            for _ in range(inner_loops):
                if n >= no_episodes:
                    break
                ts = ts.replace(agent=ts.agent.replace(act_noise=jnp.asarray(noise, jnp.float32)))
                for _ in range(inner_episodes):
                    key, k0 = jax.random.split(key)
                    y0 = (
                        setup.random_init(k0)
                        if (setup.use_random_init and setup.random_init)
                        else jnp.asarray(setup.env.y0)
                    )
                    ts, result = episode_fn(ts, y0)
                    hook.on_episode(result, ts.agent)
                n += inner_episodes
                noise *= inner_decay
                hook.clamp_rewards(setup.reward_clamp, 0.0)
        best_rewards.append(hook.bestreward)
        if save_fn is not None:
            save_fn(n_exp, ts, hook)
        if verbose:
            print(f"--------- BEST REWARD: {hook.bestreward} ---------")
    return best_rewards


def run_episodes(setup: Setup, n_episodes: int, ts: Optional[TrainState] = None,
                 hook: Optional[PDEHook] = None, key=None, episode_fn=None):
    """`run(agent, env, StopAfterEpisode(n), hook)` — plain episode-count
    stop condition (used by train_multi and the hyperopt objective)."""
    if episode_fn is None:
        episode_fn = make_episode_fn(setup.env, setup.agent, learning=True, record=setup.record)
    key = key if key is not None else jax.random.PRNGKey(setup.seed)
    if ts is None:
        key, k_init = jax.random.split(key)
        ts = init_train_state(setup.env, setup.agent, k_init)
    if hook is None:
        hook = setup.make_hook()
    for _ in range(n_episodes):
        key, k0 = jax.random.split(key)
        y0 = (
            setup.random_init(k0)
            if (setup.use_random_init and setup.random_init)
            else jnp.asarray(setup.env.y0)
        )
        ts, result = episode_fn(ts, y0)
        hook.on_episode(result, ts.agent)
    return ts, hook, key


def hyperopt_objective(setup: Setup, n_episodes: int = 100) -> float:
    """The `test_setup` hyperparameter-search objective
    (KSglobalSetup.jl:405-426): run `n_episodes` with a fixed seed, return
    cost = -mean(tail rewards) - sum over tail of (r > -0.1) * (r + 0.1).

    Lower is better; the second term credits episodes that reach near-zero
    reward. Build `setup` with the candidate hyperparameters (the reference
    threads them through initialize_setup's positional args)."""
    _, hook, _ = run_episodes(setup, n_episodes)
    tail = np.asarray(hook.rewards[-max(1, int(n_episodes * 0.5)) :], dtype=np.float64)
    bonus = np.sum((tail > -0.1) * (tail + 0.1))
    return float(-tail.mean() - bonus)


def hyperopt_objective_robust(setup: Setup, n_episodes: int = 30,
                              n_eval_inits: int = 4,
                              eval_seed0: int = 10_000) -> float:
    """OOD-robust search objective (extension; no reference equivalent).

    The reference's `test_setup` cost (KSglobalSetup.jl:405-426) scores the
    NOISY TRAINING episodes of the candidate run itself, which rewards fast
    convergence on the training-init stream — measured three times in this
    repo (KS22 / KS200 / Keller-Segel searches, RESULTS.md) to NOT select
    for out-of-distribution robustness: every standard-objective winner
    dominates the search cost yet trails the hand-tuned recipes on unseen
    random initial conditions.

    This objective trains the candidate identically (same budget, same
    seeded stream), then scores the TRAINED policy the way the artifact
    tables do: deterministic rollouts (best-actor swap-in, no noise) from
    `n_eval_inits` held-out random initial conditions. Cost is the mean
    over inits of -mean step reward, with steps after an early blow-up
    termination filled at -max_value so diverging policies rank last
    instead of being truncated out of the mean.
    """
    from distributedconvrl_pde_control_tpu.train.eval import actor_policy, rollout

    ts, hook, _ = run_episodes(setup, n_episodes)
    actor = (hook.best_actor if hook.best_actor is not None
             else jax.tree.map(np.asarray, ts.agent.actor))
    policy = actor_policy(setup.agent, actor, setup.agent.cfg.act_limit)
    penalty = -float(setup.env.max_value)
    costs = []
    for i in range(n_eval_inits):
        k = jax.random.PRNGKey(eval_seed0 + i)
        y0 = (setup.random_init(k) if setup.random_init is not None
              else jnp.asarray(setup.env.y0))
        tr = rollout(setup.env, policy, y0=y0, key=k, record_fields=False)
        r = np.asarray(tr["reward"], np.float64)
        r = r.reshape(r.shape[0], -1).mean(axis=1)  # mean over actuators
        active = np.asarray(tr["active"], bool)
        r = np.where(active & np.isfinite(r), r, penalty)
        costs.append(-float(r.mean()))
    return float(np.mean(costs))
