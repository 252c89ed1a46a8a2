"""Evaluation rollouts: the plot_heat / testrun protocols.

Rebuild of the reference's evaluation machinery:
  * `rollout`        — policy rollout with horizon override and delayed
                       actuation (plotting.jl:4-73: te/dt overridden, zero
                       action until p_t_action, best-actor swap-in);
  * `energy_eval`    — fluid testrun's per-step energy sum(|omega|)/(nx*ny)
                       (FluidSetup.jl:497-500) for trained vs NegatePolicy
                       vs no-action baselines (:400-410).
All rollouts are single jitted scans; traces come back as host arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from distributedconvrl_pde_control_tpu.envs.pde_env import PDEEnv
from distributedconvrl_pde_control_tpu.utils.hostarray import to_numpy


def rollout(env: PDEEnv, policy_fn: Callable, y0=None, te: Optional[float] = None,
            t_action: float = 0.0, key=None, record_fields: bool = True):
    """Roll `policy_fn(obs, key) -> action` on `env`.

    te overrides the horizon (the reference's p_te); actions are zero until
    time >= t_action (the reference's p_t_action). Returns a dict of traces:
    y (if record_fields), action, forcing, reward, plus steps/completed.
    """
    if te is not None:
        env = dataclasses.replace(env, te=float(te))
    n_steps = env.max_steps
    t_action_steps = int(round(t_action / env.dt))
    key = key if key is not None else jax.random.PRNGKey(0)
    # policies with warmup-agent semantics (NegatePolicy's start_steps,
    # FluidSetup.jl:284-299) receive the scan step index as their counter
    import inspect

    wants_step = "step_idx" in inspect.signature(policy_fn).parameters

    def step(carry, step_idx):
        estate, k = carry
        k, k_act = jax.random.split(k)
        action = (policy_fn(estate.obs, k_act, step_idx=step_idx) if wants_step
                  else policy_fn(estate.obs, k_act))
        action = jnp.where(step_idx < t_action_steps, jnp.zeros_like(action), action)
        active = jnp.logical_not(estate.done)
        new_estate = jax.lax.cond(active, lambda e: env.step(e, action), lambda e: e, estate)
        out = {
            "action": new_estate.action,
            "forcing": new_estate.forcing,
            "reward": new_estate.reward,
            "active": active,
        }
        if record_fields:
            out["y"] = new_estate.y
        return (new_estate, k), out

    @jax.jit
    def run(y0_arr, key):
        estate = env.reset(y0_arr)
        (estate, _), outs = jax.lax.scan(step, (estate, key), jnp.arange(n_steps))
        return estate, outs

    y0_arr = jnp.asarray(env.y0 if y0 is None else y0)
    estate, outs = run(y0_arr, key)
    traces = {k: to_numpy(v) for k, v in outs.items()}
    traces["steps"] = int(traces["active"].sum())
    traces["completed"] = bool(estate.time >= env.te * (1 - 1e-6))
    traces["time"] = env.dt * np.arange(1, n_steps + 1)
    return traces


def actor_policy(agent, actor_params, act_limit: float = 1.0):
    """Deterministic policy from actor params (eval mode: no noise, no
    warmup — the plot_heat start_steps=-1 override, plotting.jl:31)."""

    def policy_fn(obs, key):
        return jnp.clip(agent.actor_apply(actor_params, obs), -act_limit, act_limit)

    return policy_fn


def energy_trace(y_trace: np.ndarray) -> np.ndarray:
    """Fluid energy diagnostic sum(|omega|)/(nx*ny) per step
    (FluidSetup.jl:497-500). Accepts real or spectral traces."""
    steps = y_trace.shape[0]
    n = y_trace.shape[-2] * y_trace.shape[-1]
    omg = np.fft.ifft2(y_trace, axes=(-2, -1)).real if np.iscomplexobj(y_trace) else y_trace
    return np.abs(omg.reshape(steps, -1)).sum(axis=1) / n


def mean_energy(traces: dict) -> float:
    """Mean per-step energy over ACTIVE steps only.

    The rollout scan re-emits the frozen terminal state after early
    termination (fluid check_max_value='reward'); averaging those repeated
    frames would bias trained-vs-baseline comparisons, so mask by the
    recorded 'active' flag."""
    energy = traces["energy"] if "energy" in traces else energy_trace(traces["y"])
    active = np.asarray(traces["active"], bool)
    if not active.any():
        return float("nan")
    return float(np.asarray(energy)[active].mean())


def energy_eval(env: PDEEnv, policy_fn: Callable, y0=None, te: Optional[float] = None,
                t_action: float = 0.0, key=None):
    """testrun-style evaluation: rollout + energy trace (fluid envs)."""
    traces = rollout(env, policy_fn, y0=y0, te=te, t_action=t_action, key=key)
    traces["energy"] = energy_trace(traces["y"])
    traces["mean_energy"] = mean_energy(traces)
    return traces
