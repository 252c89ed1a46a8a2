"""Fused rollout + learning loop.

The reference delegates its run loop to ReinforcementLearning.jl (stage
callbacks, SURVEY.md §3.2). The TPU-native equivalent compiles one whole
episode — policy forward, exploration noise, `update_loops` DDPG gradient
steps, the PDE solver's oversampled substeps, replay pushes — into a single
XLA program driven by `lax.scan`, with early termination expressed as
freeze-masks (`lax.cond` skips the solver and learner after `done`).

Stage ordering matches the reference exactly (SURVEY.md §3.2):
  1. update_step += 1 (policy call, PDEagent.jl:177)
  2. action = warmup ? start_policy : actor(obs) + noise (:180-204)
  3. PreAct learning gate -> update_loops sampled SGD steps (:342-361)
  4. env step (PDEenv.jl:195-241)
  5. per-actuator replay pushes (:254-289)
Episode end: update_step reset when reset_stage == "post_episode" (:215-224).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from distributedconvrl_pde_control_tpu.agents.ddpg import DDPGAgent, DDPGState
from distributedconvrl_pde_control_tpu.agents.replay import (
    Replay,
    replay_init,
    replay_push_columns,
)
from distributedconvrl_pde_control_tpu.envs.pde_env import PDEEnv


@struct.dataclass
class TrainState:
    agent: DDPGState
    replay: Replay
    key: jnp.ndarray


@struct.dataclass
class EpisodeResult:
    """Per-episode outputs consumed by the hook (host side)."""

    reward_sum: jnp.ndarray  # sum over steps of mean per-actuator reward
    steps: jnp.ndarray  # actual env steps taken (early termination aware)
    completed: jnp.ndarray  # reached time >= te (not a blow-up stop)
    step_rewards: jnp.ndarray  # (max_steps,) masked mean rewards
    actor_loss: jnp.ndarray
    critic_loss: jnp.ndarray
    final_y: jnp.ndarray  # terminal field (error detection reads env.y
    # directly in the reference, PDEhook.jl:78-82 — independent of trace
    # recording)
    # trace block (zeros when record=False)
    y_trace: jnp.ndarray
    action_trace: jnp.ndarray
    forcing_trace: jnp.ndarray
    reward_trace: jnp.ndarray


def init_train_state(env: PDEEnv, agent: DDPGAgent, key) -> TrainState:
    k_init, k_run = jax.random.split(key)
    return TrainState(
        agent=agent.init_state(k_init),
        replay=replay_init(agent.cfg.capacity, agent.cfg.ns, agent.cfg.na_rows),
        key=k_run,
    )


def make_episode_fn(env: PDEEnv, agent: DDPGAgent, learning: bool = True, record: bool = False,
                    max_steps: Optional[int] = None, t_action_steps: int = 0):
    """Build the jitted episode program.

    learning=False gives the evaluation rollout (no noise, no warmup gate, no
    replay/learn — the `plot_heat` path where the reference temporarily sets
    start_steps=-1, src/plotting.jl:7-31). `t_action_steps` forces zero
    actions for the first N steps (the delayed-actuation evaluation protocol,
    plotting.jl:55-73 / FluidSetup.jl testrun start_steps=50).
    record=True returns full (y, forcing, action, reward) traces for the
    hook's DataFrame capture (PDEhook.jl:54-62).
    """
    cfg = agent.cfg
    n_steps = max_steps if max_steps is not None else env.max_steps

    def step(carry, step_idx):
        estate, astate, replay, key = carry
        key, k_act, k_learn = jax.random.split(key, 3)
        active = jnp.logical_not(estate.done)

        if learning:
            astate = astate.replace(
                update_step=astate.update_step + jnp.where(active, 1, 0).astype(jnp.int32)
            )
        action = agent.act(astate, estate.obs, k_act, learning=learning)
        if t_action_steps > 0:
            action = jnp.where(step_idx < t_action_steps, jnp.zeros_like(action), action)

        if learning:
            can_learn = jnp.logical_and(
                replay.size > cfg.update_after * cfg.interleave,
                jnp.logical_and(astate.update_step % cfg.update_freq == 0, active),
            )
            astate = jax.lax.cond(
                can_learn,
                lambda a: agent.learn_many(a, replay, k_learn),
                lambda a: a,
                astate,
            )

        def do_step(operand):
            estate_in, replay_in = operand
            new_estate = env.step(estate_in, action)
            if learning:
                replay_out = replay_push_columns(
                    replay_in,
                    estate_in.obs,
                    action,
                    new_estate.reward,
                    new_estate.done,
                    new_estate.obs,
                )
            else:
                replay_out = replay_in
            return new_estate, replay_out

        estate, replay = jax.lax.cond(active, do_step, lambda op: op, (estate, replay))

        out = {
            "reward_mean": jnp.where(active, jnp.mean(estate.reward), 0.0),
            "active": active,
        }
        if record:
            out["y"] = estate.y
            out["action"] = estate.action
            out["forcing"] = estate.forcing
            out["reward"] = estate.reward
        return (estate, astate, replay, key), out

    def episode(ts: TrainState, y0) -> tuple:
        estate = env.reset(y0)
        (estate, astate, replay, key), outs = jax.lax.scan(
            step, (estate, ts.agent, ts.replay, ts.key), jnp.arange(n_steps)
        )
        if learning and cfg.reset_stage == "post_episode":
            astate = astate.replace(update_step=jnp.asarray(0, jnp.int32))
        steps = jnp.sum(outs["active"].astype(jnp.int32))
        zero = jnp.zeros((), jnp.float32)
        result = EpisodeResult(
            reward_sum=jnp.sum(outs["reward_mean"]),
            steps=steps,
            completed=estate.time >= env.te * (1.0 - 1e-6),
            step_rewards=outs["reward_mean"],
            actor_loss=astate.actor_loss,
            critic_loss=astate.critic_loss,
            final_y=estate.y,
            y_trace=outs["y"] if record else zero,
            action_trace=outs["action"] if record else zero,
            forcing_trace=outs["forcing"] if record else zero,
            reward_trace=outs["reward"] if record else zero,
        )
        return TrainState(agent=astate, replay=replay, key=key), result

    return jax.jit(episode)
