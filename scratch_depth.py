"""Ad-hoc: driver pipeline depth comparison on the real chip, one process.

Times the train_sharded driver loop at pipeline depths 0/1/2/4 over the
same compiled chunk program, interleaved reps to cancel tunnel weather.
"""
import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_prng_impl", "rbg")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath("__file__")), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.sharding import Mesh
from distributedconvrl_pde_control_tpu.configs.fluid import FLUID_8
from distributedconvrl_pde_control_tpu.parallel.multichip import (
    ShardedFluidTrainer, ShardedTrainConfig,
)
from distributedconvrl_pde_control_tpu.train.hooks import PDEHook
from distributedconvrl_pde_control_tpu.utils.hostarray import start_host_copies

nx, n_envs, chunk_len, oversampling = 128, 8, 10, 4
dt = (oversampling + 0.5) / (16.0 * nx)
cfg = dataclasses.replace(FLUID_8, nx=nx, dt=dt, te=1000.0 * dt, adaptive=False)
tcfg = ShardedTrainConfig(n_envs=n_envs, batch_size=32, capacity_per_dp=50_000,
                          y0_pool_size=2, chunk_len=chunk_len)
mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), ("dp", "sp"))
tr = ShardedFluidTrainer(cfg, mesh, tcfg)
state = tr.init(jax.random.PRNGKey(0))
chunk = tr.make_chunk_fn(chunk_len)

state, recs = chunk(state)
print("copy_to_host_async present:", hasattr(recs, "copy_to_host_async"),
      flush=True)
jax.block_until_ready(recs)

sbox = [state]

def run(depth, n_chunks):
    s = sbox[0]
    hook = PDEHook(collect_best_trace=False)
    pending = []
    for _ in range(n_chunks):
        s, r = chunk(s)
        start_host_copies(r)
        pending.append(r)
        if len(pending) > depth:
            hook.feed_episode_records(pending.pop(0))
    for r in pending:
        hook.feed_episode_records(r)
    jax.block_until_ready(s.mean_reward)
    sbox[0] = s

def compute_only(n_chunks):
    s = sbox[0]
    for _ in range(n_chunks):
        s, r = chunk(s)
    jax.block_until_ready(s.mean_reward)
    sbox[0] = s

# warm every shape
compute_only(2)
for d in (2, 4, 6, 8, 12, 999):
    run(d, 2)

N = 20  # chunks per rep
acc = {("c", 0): []}
for d in (2, 4, 6, 8, 12, 999):
    acc[("d", d)] = []
for rep in range(5):
    t0 = time.perf_counter(); compute_only(N)
    acc[("c", 0)].append(time.perf_counter() - t0)
    for d in (2, 4, 6, 8, 12, 999):
        t0 = time.perf_counter(); run(d, N)
        acc[("d", d)].append(time.perf_counter() - t0)

base = min(acc[("c", 0)]) / (N * chunk_len) * 1000
print(json.dumps({"compute_only_ms_per_step": round(base, 3)}), flush=True)
for d in (2, 4, 6, 8, 12, 999):
    best = min(acc[("d", d)]) / (N * chunk_len) * 1000
    med = sorted(acc[("d", d)])[2] / (N * chunk_len) * 1000
    print(json.dumps({"depth": d, "best_ms_per_step": round(best, 3),
                      "median_ms_per_step": round(med, 3),
                      "overhead_pct_best": round((best / base - 1) * 100, 1)}),
          flush=True)
