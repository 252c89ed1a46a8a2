"""Tensor-parallel (param-sharded) DDPG learn step — the completeness path.

The reference's networks are tiny MLPs (1-140 hidden units,
KSSetup.jl:40-42), so tensor parallelism buys nothing for the shipped
experiments; SURVEY.md §2.3 still lists it as a required axis "for
completeness". This module provides it the idiomatic JAX way: annotate the
parameter shardings (critic hidden axis split over a 'tp' mesh axis,
megatron-style: column-parallel first layer, row-parallel last) and let
`jit` partition the EXISTING `DDPGAgent.learn_batch` — XLA's SPMD
partitioner inserts the all-reduces; no hand-written collectives, no forked
learn-step math.

Numerics are unchanged (tested against the single-device step in
tests/test_parallel.py), so the same code scales to critics wide enough for
TP to matter.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from distributedconvrl_pde_control_tpu.agents.ddpg import DDPGAgent, DDPGState


def make_tp_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.asarray(devices[:n]), axis_names=("tp",))


def critic_tp_spec(critic_params: list) -> list:
    """PartitionSpecs for an n-layer critic chain: hidden dim sharded over
    'tp'. Layer 0 column-parallel (w: (hidden, in) -> P('tp', None),
    b: (hidden,) -> P('tp')); the final layer row-parallel
    (w: (out, hidden) -> P(None, 'tp'), b replicated); middle layers
    sharded on both hidden axes."""
    n = len(critic_params)
    specs = []
    for i in range(n):
        if i == 0:
            specs.append({"w": P("tp", None), "b": P("tp")})
        elif i == n - 1:
            specs.append({"w": P(None, "tp"), "b": P()})
        else:
            specs.append({"w": P("tp", "tp"), "b": P("tp")})
    return specs


def _place_like_critic(tree, cspec, mesh):
    """device_put a pytree shaped like the critic param list (the params
    themselves, the target copy, adam's mu/nu) with the TP layout."""
    return [
        {k: jax.device_put(layer[k], NamedSharding(mesh, spec[k])) for k in layer}
        for layer, spec in zip(tree, cspec)
    ]


def shard_agent_state(astate: DDPGState, mesh: Mesh) -> DDPGState:
    """Place critic + target + its adam moments with the TP layout,
    everything else replicated."""
    cspec = critic_tp_spec(astate.critic)
    rep = lambda t: jax.device_put(t, NamedSharding(mesh, P()))

    def place_opt(opt_state):
        # optax.adam state: (ScaleByAdamState(count, mu, nu), EmptyState());
        # mu/nu mirror the critic param list
        def maybe(tree):
            if (isinstance(tree, list) and len(tree) == len(cspec)
                    and all(isinstance(el, dict) and "w" in el for el in tree)):
                return _place_like_critic(tree, cspec, mesh)
            return rep(tree)

        return jax.tree.map(maybe, opt_state,
                            is_leaf=lambda x: isinstance(x, list))

    return astate.replace(
        critic=_place_like_critic(astate.critic, cspec, mesh),
        target_critic=_place_like_critic(astate.target_critic, cspec, mesh),
        opt_critic=place_opt(astate.opt_critic),
        actor=rep(astate.actor),
        target_actor=rep(astate.target_actor),
        opt_actor=rep(astate.opt_actor),
    )


def make_tp_learn_step(agent: DDPGAgent, mesh: Mesh):
    """jit of the UNMODIFIED agent.learn_batch; the input parameter
    shardings drive XLA's SPMD partitioner (the psum after the
    row-parallel final matmul and over gradient contractions is inserted
    automatically)."""

    @jax.jit
    def step(astate: DDPGState, batch):
        return agent.learn_batch(astate, batch)

    def run(astate: DDPGState, batch, shard_inputs: bool = True):
        if shard_inputs:
            astate = shard_agent_state(astate, mesh)
            batch = jax.device_put(batch, NamedSharding(mesh, P()))
        return step(astate, batch)

    return run
