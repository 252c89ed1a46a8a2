"""Multi-agent-via-batching DDPG.

Rebuild of the reference's `CustomDDPGPolicy` + learner (src/PDEagent.jl):
one tiny MLP actor shared by all actuators (the actuator axis is the batch
axis of the forward pass, PDEagent.jl:189), exploration noise on the
non-memory action rows (:201), clamping (:202-204), warmup start policy
(:180-181), and the exact learn step of PDEagent.jl:363-418:

    a'     = target_actor(s')
    qnext  = r + gamma * (1 - t) * target_critic([s'; a'])
    critic <- grad mean((qnext - critic([s; a]))^2)      (ADAM)
    actor  <- grad -mean(critic_updated([s; actor(s)]))  (ADAM)
    targets <- polyak * targets + (1 - polyak) * behavior

All of it — including the `update_loops` sampled SGD steps per env step
(PDEagent.jl:357-360) — is pure-functional on pytrees so the loop layer can
fold it into one jitted rollout program.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from distributedconvrl_pde_control_tpu.agents.replay import Replay, replay_sample
from distributedconvrl_pde_control_tpu.models.mlp import (
    actor_sizes,
    apply_chain,
    critic_sizes,
    init_chain,
)


@dataclasses.dataclass(frozen=True)
class DDPGConfig:
    """Hyperparameters, defaults = the KS setup (KSSetup.jl:39-77).

    `ns`/`na_rows` are the per-actuator observation/action dims (state matrix
    rows); `n_actuators` is the shared-policy batch width. `mono=True` is the
    global-agent ablation: one column, scalar reward (PDEagent.jl:79-83).
    """

    ns: int
    na_rows: int
    n_actuators: int
    gamma: float = 0.99
    polyak: float = 0.995
    batch_size: int = 3
    start_steps: int = 6
    start_policy: str = "zero"  # "zero" | "random" | "negate"
    negate_center_row: int = 0  # obs row for the "negate" start policy
    update_after: int = 10
    update_freq: int = 1
    update_loops: int = 20
    act_limit: float = 1.0
    act_noise: float = 1.2
    memory_size: int = 0
    nna_scale: float = 0.6
    nna_scale_critic: Optional[float] = None
    drop_middle_layer: bool = True
    drop_middle_layer_critic: Optional[bool] = None
    learning_rate: float = 5e-4
    learning_rate_critic: float = 1e-3
    capacity: int = 150_000
    mono: bool = False
    reset_stage: str = "post_episode"  # when update_step resets (PDEagent.jl:215-235)

    @property
    def scale_critic(self) -> float:
        return self.nna_scale if self.nna_scale_critic is None else self.nna_scale_critic

    @property
    def drop_mid_critic(self) -> bool:
        return (
            self.drop_middle_layer
            if self.drop_middle_layer_critic is None
            else self.drop_middle_layer_critic
        )

    @property
    def interleave(self) -> int:
        """Replay interleaving width (1 in mono mode, PDEagent.jl:348-353)."""
        return 1 if self.mono else self.n_actuators

    @property
    def n_rewards(self) -> int:
        return 1 if self.mono else self.n_actuators


@struct.dataclass
class DDPGState:
    """On-device agent state (networks, optimizers, schedule counters)."""

    actor: list
    critic: list
    target_actor: list
    target_critic: list
    opt_actor: optax.OptState
    opt_critic: optax.OptState
    act_noise: jnp.ndarray  # f32 scalar (decayed by the training driver)
    update_step: jnp.ndarray  # int32, reset at reset_stage
    actor_loss: jnp.ndarray
    critic_loss: jnp.ndarray


class DDPGAgent:
    """Static wrapper: config + network applies + optimizers.

    The pytree state lives in `DDPGState`; this object is closed over by
    jitted functions (like the solver dataclasses).
    """

    def __init__(self, cfg: DDPGConfig, hidden_act: Callable = jax.nn.relu,
                 hidden_act_critic: Optional[Callable] = None):
        self.cfg = cfg
        self.hidden_act = hidden_act
        self.hidden_act_critic = hidden_act_critic or hidden_act
        self._asizes = actor_sizes(cfg.ns, cfg.na_rows, cfg.nna_scale, cfg.drop_middle_layer)
        self._csizes = critic_sizes(cfg.ns, cfg.na_rows, cfg.scale_critic, cfg.drop_mid_critic)
        self.opt_a = optax.adam(cfg.learning_rate)
        self.opt_c = optax.adam(cfg.learning_rate_critic)

    # ------------------------------------------------------------- networks
    def actor_apply(self, params, s):
        return apply_chain(params, s, self.hidden_act, jnp.tanh)

    def critic_apply(self, params, s, a):
        return apply_chain(params, jnp.concatenate([s, a], axis=0), self.hidden_act_critic, None)

    # ------------------------------------------------------------------ init
    def init_state(self, key) -> DDPGState:
        ka, kc = jax.random.split(key)
        actor = init_chain(ka, self._asizes)
        critic = init_chain(kc, self._csizes)
        return DDPGState(
            actor=actor,
            critic=critic,
            target_actor=jax.tree.map(jnp.copy, actor),  # force-sync, PDEagent.jl:76-77
            target_critic=jax.tree.map(jnp.copy, critic),
            opt_actor=self.opt_a.init(actor),
            opt_critic=self.opt_c.init(critic),
            act_noise=jnp.asarray(self.cfg.act_noise, jnp.float32),
            update_step=jnp.asarray(0, jnp.int32),
            actor_loss=jnp.asarray(0.0, jnp.float32),
            critic_loss=jnp.asarray(0.0, jnp.float32),
        )

    # ------------------------------------------------------------------- act
    def start_action(self, key, shape, obs=None):
        """Warmup start policy: zeros (ZeroPolicy, PDEagent.jl:420-424),
        uniform random (RandomPolicy, KellerSegelSetup.jl:75), or corrected
        opposition control ("negate" — an extension for warm-starting DDPG
        from the classical baseline)."""
        if self.cfg.start_policy == "random":
            return jax.random.uniform(key, shape, jnp.float32, -1.0, 1.0)
        if self.cfg.start_policy == "negate" and obs is not None:
            act = -obs[self.cfg.negate_center_row].reshape(1, -1)
            return jnp.clip(jnp.broadcast_to(act, shape), -1.0, 1.0)
        return jnp.zeros(shape, jnp.float32)

    def act(self, astate: DDPGState, obs, key, learning: bool = True):
        """Policy call (PDEagent.jl:175-209). `learning` adds exploration
        noise to the non-memory rows and is gated by the warmup phase.
        Does NOT bump update_step — the loop owns that counter."""
        cfg = self.cfg
        k_start, k_noise = jax.random.split(key)
        actions = self.actor_apply(astate.actor, obs)
        shape = actions.shape  # (na_rows, n_cols) — n_cols widens in batched-env mode
        if learning:
            noise = jax.random.normal(k_noise, shape) * astate.act_noise
            if cfg.memory_size > 0:
                noise = noise.at[-cfg.memory_size :, :].set(0.0)
            actions = actions + noise
            # warmup: update_step <= start_steps -> start policy (:180-181)
            in_warmup = astate.update_step <= cfg.start_steps
            actions = jnp.where(in_warmup, self.start_action(k_start, shape, obs), actions)
        return jnp.clip(actions, -cfg.act_limit, cfg.act_limit)

    # ----------------------------------------------------------------- learn
    def sample(self, replay: Replay, key, batch_size: int):
        """Learner-batch sampling route for the batched trainer. Next states
        are stored explicitly, so every entry is a complete transition — no
        newest-rows exclusion needed (that exclusion mirrors the reference's
        slot arithmetic in fidelity mode, agents/replay.py docstring).
        Population agents override this with member-region sampling
        (train/population.py::PopulationDDPG.sample)."""
        return replay_sample(replay, key, batch_size, 0)

    def learn_batch(self, astate: DDPGState, batch, axis_name: Optional[str] = None) -> DDPGState:
        """One sampled SGD step — exact math of PDEagent.jl:363-418.

        `axis_name`: mesh axis to pmean gradients over (data-parallel
        learning; params/optimizer stay replicated)."""
        cfg = self.cfg
        s, a, r, t, sn = batch

        a_next = self.actor_apply(astate.target_actor, sn)
        q_next_t = self.critic_apply(astate.target_critic, sn, a_next).reshape(-1)
        q_target = r + cfg.gamma * (1.0 - t) * q_next_t

        def critic_loss_fn(cp):
            q = self.critic_apply(cp, s, a).reshape(-1)
            return jnp.mean((q_target - q) ** 2)

        c_loss, c_grads = jax.value_and_grad(critic_loss_fn)(astate.critic)
        if axis_name is not None:
            c_grads = jax.lax.pmean(c_grads, axis_name)
        c_updates, opt_critic = self.opt_c.update(c_grads, astate.opt_critic, astate.critic)
        critic = optax.apply_updates(astate.critic, c_updates)

        def actor_loss_fn(ap):
            # uses the *updated* critic, as the reference does (gs2 computed
            # after update!(C, gs1), PDEagent.jl:400-412)
            return -jnp.mean(self.critic_apply(critic, s, self.actor_apply(ap, s)))

        a_loss, a_grads = jax.value_and_grad(actor_loss_fn)(astate.actor)
        if axis_name is not None:
            a_grads = jax.lax.pmean(a_grads, axis_name)
        a_updates, opt_actor = self.opt_a.update(a_grads, astate.opt_actor, astate.actor)
        actor = optax.apply_updates(astate.actor, a_updates)

        # polyak averaging (PDEagent.jl:415-417)
        p = cfg.polyak
        polyak = lambda t_, b_: jax.tree.map(lambda x, y: p * x + (1 - p) * y, t_, b_)
        return astate.replace(
            actor=actor,
            critic=critic,
            target_actor=polyak(astate.target_actor, actor),
            target_critic=polyak(astate.target_critic, critic),
            opt_actor=opt_actor,
            opt_critic=opt_critic,
            actor_loss=a_loss,
            critic_loss=c_loss,
        )

    def learn_many(self, astate: DDPGState, replay: Replay, key) -> DDPGState:
        """`update_loops` sampled SGD steps (PDEagent.jl:357-360)."""
        cfg = self.cfg

        def one(astate, k):
            batch = replay_sample(replay, k, cfg.batch_size, cfg.interleave)
            return self.learn_batch(astate, batch), None

        keys = jax.random.split(key, cfg.update_loops)
        astate, _ = jax.lax.scan(one, astate, keys)
        return astate
