"""Functional PDE-control environment.

Rebuild of `src/PDEenv.jl` as a pytree state + pure step, so the whole
rollout can live inside one jitted/`lax.scan` program:

  * `EnvState` mirrors PDEenv's mutable fields (y, state/obs, action,
    delta_action, p, steps, time, reward, done; PDEenv.jl:26-62);
  * `PDEEnv.step` reproduces the step operator (PDEenv.jl:195-241):
    delta_action, prepare_action, solver step, reward, featurize, time
    advance, and early termination on blow-up (`check_max_value` in
    {"y", "reward", "none"}) — expressed as masks, not host branches;
  * `PDEEnv.reset` reproduces RLBase.reset! (PDEenv.jl:183-193) with an
    optional override y0 (the hook's per-episode random init,
    PDEhook.jl:42-49).

Termination semantics note: the reference ALSO ends the episode when
`time >= te`; both conditions fold into the `done` flag so downstream code
(replay pushes, learning gates) can mask on it inside scans.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct


def create_default_y0(sim_shape) -> jnp.ndarray:
    """The generic default initial condition (PDEenv.jl:8-24): 1.0 inside
    the corner block covering the first 40% of every axis, 0.0 elsewhere.

    Every shipped setup overrides y0, but the env constructor must work
    without one, as the reference's does.
    """
    import numpy as np

    y0 = np.zeros(sim_shape, np.float32)
    region = tuple(slice(0, int(0.4 * n)) for n in sim_shape)
    y0[region] = 1.0
    return jnp.asarray(y0)


@struct.dataclass
class EnvState:
    """Pytree snapshot of the environment (PDEenv.jl:26-62)."""

    y: jnp.ndarray  # PDE field (real everywhere; fluid keeps the real vorticity)
    obs: jnp.ndarray  # featurized state matrix (obs_dim, n_actuators)
    action: jnp.ndarray  # last action matrix (action_rows, n_actuators)
    delta_action: jnp.ndarray
    forcing: jnp.ndarray  # env.p — prepared forcing for the solver
    steps: jnp.ndarray  # int32 scalar
    time: jnp.ndarray  # f32 scalar
    reward: jnp.ndarray  # per-actuator rewards (n_rewards,)
    done: jnp.ndarray  # bool scalar
    # opaque solver carry for spectral-state tiers (None on the standard
    # path): the spectral solvers synthesize real `y` every step anyway, so
    # carrying their (re, im) spectrum here lets them skip the per-step
    # re-analysis transform (configs/ks.py `spectral_carry`)
    carry: Any = None


@dataclasses.dataclass(frozen=True)
class PDEEnv:
    """One PDE control environment: dynamics + featurization + reward.

    All callables are pure:
      step_fn(y, forcing) -> y'                (the L1 solver hot loop)
      featurize(y, prev_obs, action) -> obs    (None args at reset)
      prepare_action(action) -> forcing        (action smearing)
      reward_fn(y, action, delta_action) -> rewards
    """

    step_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]
    featurize: Callable[..., jnp.ndarray]
    prepare_action: Callable[[jnp.ndarray], jnp.ndarray]
    reward_fn: Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]
    y0: Any
    action_shape: tuple  # (action_rows, n_actuators)
    n_rewards: int
    te: float = 2.0
    t0: float = 0.0
    dt: float = 0.005
    max_value: float = 20.0
    check_max_value: str = "y"  # "y" | "reward" | "none" (PDEenv.jl:226-240)
    # Optional spectral-carry pair (perf tier; both or neither):
    #   init_carry(y) -> carry
    #   step_carry_fn(carry, action) -> (carry', y')
    # When set, the solver advances the carried spectrum instead of
    # re-analyzing `y` each step; featurize/reward/termination still see
    # the per-step real field y' (and `prepare_action` still records the
    # real forcing plane), so every downstream semantic is unchanged.
    init_carry: Optional[Callable] = None
    step_carry_fn: Optional[Callable] = None
    # Spectral-FEATURIZE tier (perf tier on top of the carry; all four or
    # none — configs/ks.py `spectral_featurize`): featurize/reward/blow-up
    # guard consume the CARRY directly (sensor readouts are linear in y, so
    # ⟨y, g_i⟩ is an exact Parseval dot on the half-spectrum), and the step
    # skips the last per-step synthesis transform entirely:
    #   step_carry_only(carry, action) -> carry'
    #   featurize_carry(carry, prev_obs, action) -> obs
    #   reward_carry_fn(carry, action, delta_action) -> rewards
    #   carry_guard(carry) -> bool    (check_max_value surrogate; for "y"
    #       mode a SOUND under-trigger: rms(y) > max_value implies
    #       max|y| > max_value, so it never fires spuriously but fires a
    #       step or two later into an exponential blow-up than the exact
    #       max — the non-finite guard still backstops)
    # CONTRACT: EnvState.y then holds the episode's RESET field, not the
    # per-step field — a TRAINER tier (the fused trainers never read y);
    # plotting/eval rollouts use the standard presets.
    step_carry_only: Optional[Callable] = None
    featurize_carry: Optional[Callable] = None
    reward_carry_fn: Optional[Callable] = None
    carry_guard: Optional[Callable] = None

    @property
    def max_steps(self) -> int:
        """Episode length cap: steps until time >= te."""
        import math

        return int(math.ceil((self.te - self.t0) / self.dt - 1e-9))

    def reset(self, y0: Optional[jnp.ndarray] = None) -> EnvState:
        y = jnp.asarray(self.y0 if y0 is None else y0)
        action0 = jnp.zeros(self.action_shape, jnp.float32)
        if self.featurize_carry is not None:
            obs = self.featurize_carry(self.init_carry(y), None, None)
        else:
            obs = self.featurize(y, None, None)
        return EnvState(
            y=y,
            obs=obs,
            action=action0,
            delta_action=jnp.zeros_like(action0),
            forcing=self.prepare_action(action0),
            steps=jnp.asarray(0, jnp.int32),
            time=jnp.asarray(self.t0, jnp.float32),
            reward=jnp.zeros((self.n_rewards,), jnp.float32),
            done=jnp.asarray(False, bool),
            carry=self.init_carry(y) if self.init_carry is not None else None,
        )

    def step(self, state: EnvState, action: jnp.ndarray) -> EnvState:
        """Pure step operator (PDEenv.jl:195-241)."""
        delta_action = action - state.action
        forcing = self.prepare_action(action)
        spectral_io = self.featurize_carry is not None
        if spectral_io:
            carry = self.step_carry_only(state.carry, action)
            y = state.y  # stale: the episode's reset field (tier CONTRACT)
            reward = self.reward_carry_fn(carry, action, delta_action)
            obs = self.featurize_carry(carry, state.obs, action)
        elif self.step_carry_fn is not None:
            carry, y = self.step_carry_fn(state.carry, action)
            reward = self.reward_fn(y, action, delta_action)
            obs = self.featurize(y, state.obs, action)
        else:
            carry, y = None, self.step_fn(state.y, forcing)
            reward = self.reward_fn(y, action, delta_action)
            obs = self.featurize(y, state.obs, action)
        steps = state.steps + 1
        # time = t0 + steps*dt (not accumulated) so the te comparison is
        # exact under f32 — 50 additions of f32(0.1) drift below 5.0
        time = jnp.asarray(self.t0, jnp.float32) + steps.astype(jnp.float32) * jnp.asarray(
            self.dt, jnp.float32
        )
        done = time >= self.te * (1.0 - 1e-6)
        if self.check_max_value == "y":
            if spectral_io:
                blowup = self.carry_guard(carry)
            else:
                blowup = jnp.max(jnp.abs(y)) > self.max_value
            done = jnp.logical_or(done, blowup)
        elif self.check_max_value == "reward":
            blowup = jnp.max(jnp.abs(reward)) > self.max_value
            done = jnp.logical_or(done, blowup)
        # non-finite fields always terminate (jit-safe NaN guard; the
        # reference reaches the same outcome through max() comparisons)
        if spectral_io:
            finite = jnp.all(jnp.asarray(
                [jnp.all(jnp.isfinite(l)) for l in jax.tree_util.tree_leaves(carry)]
            )) & jnp.all(jnp.isfinite(reward))
        else:
            finite = jnp.all(jnp.isfinite(jnp.abs(y.reshape(-1)))) & jnp.all(jnp.isfinite(reward))
        done = jnp.logical_or(done, jnp.logical_not(finite))
        return EnvState(
            y=y,
            obs=obs,
            action=action,
            delta_action=delta_action,
            forcing=forcing,
            steps=steps,
            time=time,
            reward=reward,
            done=done,
            carry=carry,
        )
