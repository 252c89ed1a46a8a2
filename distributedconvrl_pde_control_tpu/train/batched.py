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
    replay_sample,
)
from distributedconvrl_pde_control_tpu.envs.pde_env import PDEEnv


@struct.dataclass
class BatchedTrainState:
    agent: object  # DDPGState
    replay: Replay
    env_states: object  # vmapped EnvState (leading axis n_envs)
    key: jnp.ndarray
    total_env_steps: jnp.ndarray  # int32


@dataclasses.dataclass(frozen=True)
class BatchedTrainerConfig:
    n_envs: int = 256
    batch_size: int = 256  # learner batch (scaled up from the reference's 3)
    update_loops: int = 1  # gradient steps per env step (20 in fidelity mode)
    update_every: int = 1


class BatchedTrainer:
    """vmap-over-envs DDPG trainer with in-graph episode auto-reset."""

    def __init__(self, env: PDEEnv, agent: DDPGAgent, cfg: BatchedTrainerConfig,
                 random_init: Optional[Callable] = None, y0_pool=None):
        """`random_init` must be jit-traceable (it runs inside the fused
        scan). For host-only initial-condition generators (the fluid
        random-vortex IC, FluidSetup.jl:386-394) pass `y0_pool` instead: a
        precomputed (P, ...) array of initial fields sampled uniformly at
        every auto-reset."""
        self.env = env
        self.agent = agent
        self.cfg = cfg
        self.random_init = random_init
        self.y0_pool = None if y0_pool is None else jnp.asarray(y0_pool)
        self._reset1 = lambda y0: env.reset(y0)
        self._step1 = env.step

    def _fresh_y0s(self, key, n):
        if self.y0_pool is not None:
            idx = jax.random.randint(key, (n,), 0, self.y0_pool.shape[0])
            return self.y0_pool[idx]
        if self.random_init is not None:
            return jax.vmap(self.random_init)(jax.random.split(key, n))
        y0 = jnp.asarray(self.env.y0)
        return jnp.broadcast_to(y0, (n,) + y0.shape)

    # ------------------------------------------------------------------ init
    def init(self, key) -> BatchedTrainState:
        k_agent, k_envs, k_run = jax.random.split(key, 3)
        env_states = jax.vmap(self._reset1)(self._fresh_y0s(k_envs, self.cfg.n_envs))
        acfg = self.agent.cfg
        return BatchedTrainState(
            agent=self.agent.init_state(k_agent),
            replay=replay_init(acfg.capacity, acfg.ns, acfg.na_rows),
            env_states=env_states,
            key=k_run,
            total_env_steps=jnp.asarray(0, jnp.int32),
        )

    # ------------------------------------------------------------- one step
    def _train_step(self, ts: BatchedTrainState, learn: bool):
        env, agent, cfg = self.env, self.agent, self.cfg
        acfg = agent.cfg
        key, k_act, k_learn, k_reset = jax.random.split(ts.key, 4)

        estates = ts.env_states
        B = cfg.n_envs
        n_act = acfg.n_actuators

        # policy forward over ALL actuator columns of ALL envs at once:
        # (B, ns, n_act) -> (ns, B*n_act)
        obs_flat = jnp.moveaxis(estates.obs, 0, 1).reshape(acfg.ns, B * n_act)
        astate = ts.agent.replace(update_step=ts.agent.update_step + 1)
        actions_flat = agent.act(astate, obs_flat, k_act, learning=True)
        actions = jnp.moveaxis(actions_flat.reshape(acfg.na_rows, B, n_act), 1, 0)

        # env step (vmapped)
        new_estates = jax.vmap(self._step1)(estates, actions)

        # push B*n_act transitions
        s_cols = obs_flat
        a_cols = actions_flat
        sn_cols = jnp.moveaxis(new_estates.obs, 0, 1).reshape(acfg.ns, B * n_act)
        r_flat = new_estates.reward.reshape(B * n_act)
        t_flat = jnp.repeat(new_estates.done.astype(jnp.float32), n_act)
        replay = self._push_flat(ts.replay, s_cols, a_cols, r_flat, t_flat, sn_cols)

        # learn
        if learn:
            can = jnp.logical_and(
                replay.size > acfg.update_after * n_act,
                astate.update_step % cfg.update_every == 0,
            )

            def do_learn(a):
                def one(a, k):
                    # next states are stored explicitly, so every entry is a
                    # complete transition — no newest-rows exclusion needed
                    # (that exclusion mirrors the reference's slot arithmetic
                    # in fidelity mode, agents/replay.py docstring)
                    batch = replay_sample(replay, k, cfg.batch_size, 0)
                    return agent.learn_batch(a, batch), None

                a, _ = jax.lax.scan(one, a, jax.random.split(k_learn, cfg.update_loops))
                return a

            astate = jax.lax.cond(can, do_learn, lambda a: a, astate)

        # auto-reset finished episodes with fresh initial conditions
        fresh = jax.vmap(self._reset1)(self._fresh_y0s(k_reset, B))
        done = new_estates.done

        def pick(f, n):
            return jnp.where(done.reshape((B,) + (1,) * (n.ndim - 1)), f, n)

        estates = jax.tree.map(pick, fresh, new_estates)

        mean_reward = jnp.mean(new_estates.reward)
        return (
            BatchedTrainState(
                agent=astate,
                replay=replay,
                env_states=estates,
                key=key,
                total_env_steps=ts.total_env_steps + B,
            ),
            mean_reward,
        )

    @staticmethod
    def _push_flat(rb: Replay, s_cols, a_cols, r_flat, t_flat, sn_cols) -> Replay:
        n = r_flat.shape[0]
        capacity = rb.s.shape[0]
        idx = (rb.ptr + jnp.arange(n, dtype=jnp.int32)) % capacity
        return rb.replace(
            s=rb.s.at[idx].set(s_cols.T),
            a=rb.a.at[idx].set(a_cols.T),
            r=rb.r.at[idx].set(r_flat),
            t=rb.t.at[idx].set(t_flat),
            sn=rb.sn.at[idx].set(sn_cols.T),
            ptr=(rb.ptr + n) % capacity,
            size=jnp.minimum(rb.size + n, capacity),
        )

    # ---------------------------------------------------------------- chunks
    def make_chunk_fn(self, n_steps: int, learn: bool = True):
        """Compile `n_steps` fused train steps into one program; returns the
        new state and the per-step mean rewards."""

        def chunk(ts: BatchedTrainState):
            def body(ts, _):
                ts, r = self._train_step(ts, learn)
                return ts, r

            ts, rewards = jax.lax.scan(body, ts, None, length=n_steps)
            return ts, rewards

        return jax.jit(chunk, donate_argnums=0)


def train_batched(trainer: BatchedTrainer, total_steps: int, key=None,
                  noise_decay_every: int = 0, noise_decay: float = 0.5,
                  chunk_len: int = 50, verbose: bool = False):
    """Throughput-mode training driver: run `total_steps` fused steps in
    chunks, optionally decaying the exploration noise every
    `noise_decay_every` steps (the batched analogue of the reference's
    per-loop `act_noise *= 0.2`, KSSetup.jl:315).

    Returns (state, mean rewards per chunk).
    """
    import numpy as _np

    ts = trainer.init(key if key is not None else jax.random.PRNGKey(0))
    chunk_fn = trainer.make_chunk_fn(chunk_len)
    chunk_means = []
    steps_done = 0
    next_decay = noise_decay_every if noise_decay_every else None
    while steps_done < total_steps:
        ts, rewards = chunk_fn(ts)
        chunk_means.append(float(jnp.mean(rewards)))
        steps_done += chunk_len
        if next_decay is not None and steps_done >= next_decay:
            ts = ts.replace(agent=ts.agent.replace(act_noise=ts.agent.act_noise * noise_decay))
            next_decay += noise_decay_every
        if verbose:
            print(f"steps {steps_done}: mean reward {chunk_means[-1]:.4f} "
                  f"noise {float(ts.agent.act_noise):.4f}")
    return ts, _np.asarray(chunk_means)
