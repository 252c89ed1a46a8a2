"""Data-parallel scale-out of the flagship batched trainer.

The single-chip throughput trainer (train/batched.py) is one fused jitted
scan over `n_envs` vmapped environments — the unit bench.py measures. This
module scales that SAME program across a device mesh's `dp` axis with
`jax.sharding` + `shard_map`: each device advances `n_envs / n_dp`
environments and pushes into a private replay shard, and the only
cross-device traffic is the DDPG gradient pmean (`agents/ddpg.py
learn_batch(axis_name)` — identical semantics to the sharded fluid
trainer's dp axis, parallel/multichip.py) plus three scalar collectives
per step that keep the PDEhook bookkeeping global (finished-episode psum,
candidate-best pmax, mean-reward pmean) — a few hundred bytes per step
over ICI, so scaling is expected near-linear in n_dp.

State layout is the single-device trainer's GLOBAL logical layout,
sharded along the mesh instead of stacked per device:

* env-indexed leaves split along `dp` — `env_states` (leading env axis),
  `ep_reward`, the replay's slot axis (each device owns a contiguous
  `capacity / n_dp` ring it pushes its own transitions into), and
  `obs_flat`'s column axis (its columns are env-major, so a `dp` split of
  columns IS the env split);
* agent params, optimizer state, and the hook scalars replicated (the
  per-step collectives keep them bitwise-identical across devices);
* one extra leading `(n_dp, ...)` axis ONLY on the PRNG key, so every
  device draws an independent exploration/reset stream.

Because the layout is the single-device one, the pipelined driver
(`train_batched`), the hooks, and the standard checkpoint format all work
UNCHANGED on a `DPBatchedTrainer` — chunk records come back in the same
packed `(5, n_steps, n_envs)` layout with the env axis globally ordered.

Learner semantics: each dp shard samples `batch_size` transitions from
its OWN replay shard and the gradients are pmean'd, so the effective
global batch is `n_dp * batch_size` with per-shard sampling locality —
the same convention as the sharded fluid trainer (capacity_per_dp /
batch_size fields of ShardedTrainConfig).

The reference is single-process Julia (SURVEY.md §2.3 DP row: "no
Distributed/Threads.@spawn/MPI anywhere"); this axis is TPU-native
scale-out the reference cannot express, applied to its KS training
semantics (KSSetup.jl:304-319).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from distributedconvrl_pde_control_tpu.agents.ddpg import DDPGAgent
from distributedconvrl_pde_control_tpu.agents.replay import Replay, replay_init
from distributedconvrl_pde_control_tpu.envs.pde_env import PDEEnv
from distributedconvrl_pde_control_tpu.train.batched import (
    BatchedTrainer,
    BatchedTrainerConfig,
    BatchedTrainState,
)


def dp_mesh(n_devices: Optional[int] = None) -> Mesh:
    """A pure-dp mesh over the first `n_devices` devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(devices[:n], axis_names=("dp",))


class DPBatchedTrainer:
    """train/batched.py's fused trainer, sharded over a mesh's `dp` axis.

    Drop-in for `BatchedTrainer` in `train_batched`: same `init` /
    `make_chunk_fn` / `eval_mean_reward` / `cfg` surface, same record
    layout, same checkpointable state fields (all non-env leaves are
    replicated). `cfg.n_envs` is the GLOBAL env count and must divide by
    the mesh's dp size; `cfg.batch_size` is the PER-DEVICE learner batch
    (global effective batch = n_dp * batch_size, gradients pmean'd).
    """

    def __init__(self, env: PDEEnv, agent: DDPGAgent, cfg: BatchedTrainerConfig,
                 mesh: Mesh, random_init: Optional[Callable] = None,
                 y0_pool=None, eval_y0_pool=None):
        if "dp" not in mesh.axis_names:
            raise ValueError(f"mesh needs a 'dp' axis, got {mesh.axis_names}")
        for ax in mesh.axis_names:
            if ax != "dp" and mesh.shape[ax] != 1:
                raise ValueError(
                    f"DPBatchedTrainer shards only over 'dp'; axis {ax!r} has "
                    f"size {mesh.shape[ax]} (use a pure-dp mesh, e.g. dp_mesh())")
        self.mesh = mesh
        self.n_dp = mesh.shape["dp"]
        if cfg.n_envs % self.n_dp:
            raise ValueError(f"n_envs={cfg.n_envs} must divide by dp={self.n_dp}")
        self.env, self.agent, self.cfg = env, agent, cfg
        # the per-device program is literally the single-device trainer at
        # the local env count
        self.local = BatchedTrainer(
            env, agent, dataclasses.replace(cfg, n_envs=cfg.n_envs // self.n_dp),
            random_init=random_init, y0_pool=y0_pool,
            eval_y0_pool=eval_y0_pool)
        acfg = agent.cfg
        # per-device replay ring: contiguous-push rounding at the LOCAL
        # push width (same rule as BatchedTrainer.init / ShardedTrainConfig)
        push_local = self.local.cfg.n_envs * acfg.n_actuators
        cap_local = max(1, acfg.capacity // self.n_dp)
        self.capacity_local = ((cap_local + push_local - 1) // push_local) * push_local
        # PartitionSpec tree (pytree prefixes: a P() node covers its subtree)
        self._specs = BatchedTrainState(
            agent=P(),
            replay=Replay(s=P(None, "dp"), a=P(None, "dp"), r=P("dp"),
                          t=P("dp"), sn=P(None, "dp"), ptr=P(), size=P()),
            env_states=P("dp"),
            obs_flat=P(None, "dp"),
            key=P("dp"),
            total_env_steps=P(),
            ep_reward=P("dp"),
            ep_count=P(),
            best_reward=P(),
            best_episode=P(),
            best_actor=P(),
        )

    # ------------------------------------------------------------------ init
    def device_put(self, ts: BatchedTrainState) -> BatchedTrainState:
        """Lay a (host or single-device) global state out across the mesh."""
        mesh = self.mesh

        def put(spec, subtree):
            s = NamedSharding(mesh, spec)
            return jax.tree.map(lambda x: jax.device_put(x, s), subtree)

        return jax.tree.map(put, self._specs, ts,
                            is_leaf=lambda x: isinstance(x, P))

    def init(self, key) -> BatchedTrainState:
        k_agent, k_envs, k_run = jax.random.split(key, 3)
        acfg = self.agent.cfg
        astate = self.agent.init_state(k_agent)
        env_states = self.local._fresh_states(k_envs, self.cfg.n_envs)
        # _obs_cols (not a bare moveaxis) so the flat_obs_state carried
        # layout relayouts correctly here too
        obs_flat = self.local._obs_cols(env_states.obs)
        ts = BatchedTrainState(
            agent=astate,
            replay=replay_init(self.capacity_local * self.n_dp, acfg.ns,
                               acfg.na_rows),
            env_states=env_states,
            obs_flat=obs_flat,
            key=jax.random.split(k_run, self.n_dp),
            total_env_steps=jnp.asarray(0, jnp.int32),
            ep_reward=jnp.zeros((self.cfg.n_envs,), jnp.float32),
            ep_count=jnp.asarray(0, jnp.int32),
            best_reward=jnp.asarray(-jnp.inf, jnp.float32),
            best_episode=jnp.asarray(0, jnp.int32),
            best_actor=jax.tree.map(jnp.copy, astate.actor),
        )
        return self.device_put(ts)

    # ---------------------------------------------------------------- chunks
    def make_chunk_fn(self, n_steps: int, learn: bool = True):
        """The sharded twin of BatchedTrainer.make_chunk_fn: one jitted
        program running the per-device chunk body under shard_map, returning
        the new (sharded) state and the packed (5, n_steps, n_envs) record
        array with the env axis in global order."""
        body = self.local.make_chunk_body(n_steps, learn, axis_name="dp")

        def per_device(ts: BatchedTrainState):
            # the only layout difference from the single-device state: the
            # key leaf carries the per-device leading axis
            ts, packed = body(ts.replace(key=ts.key[0]))
            return ts.replace(key=ts.key[None]), packed

        sharded = shard_map(per_device, mesh=self.mesh,
                            in_specs=(self._specs,),
                            out_specs=(self._specs, P(None, None, "dp")),
                            check_vma=False)
        return jax.jit(sharded, donate_argnums=0)

    # ------------------------------------------------------------------ eval
    def eval_mean_reward(self, actor_params, n_steps: int, key=None,
                         warmup_steps: int = 0, score: str = "mean") -> float:
        """Deterministic eval on the LOCAL env batch (params are replicated,
        so one device's worth of eval envs is representative and cheap)."""
        return self.local.eval_mean_reward(actor_params, n_steps, key,
                                           warmup_steps=warmup_steps,
                                           score=score)
