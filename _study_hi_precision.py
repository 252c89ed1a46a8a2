"""matmul_hi (Precision.HIGH, 3-pass bf16) study on the KS solver path:
per-step accuracy vs HIGHEST, and batched-trainer throughput. Temporary
script; results go to PERFORMANCE.md."""

import dataclasses
import json
import os
import time

import jax

jax.config.update("jax_default_prng_impl", "rbg")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from distributedconvrl_pde_control_tpu.configs import KS22, build_ks
from distributedconvrl_pde_control_tpu.configs.ks import ks_random_init
from distributedconvrl_pde_control_tpu.ops.ks import KSSolver
from distributedconvrl_pde_control_tpu.train.batched import (
    BatchedTrainer,
    BatchedTrainerConfig,
)

# ---------------- accuracy: one env step (30 CNAB2 substeps), 3 precisions
rng = np.random.default_rng(0)
y = (0.5 * rng.standard_normal((64, 192))).astype(np.float32)
f = (0.2 * rng.standard_normal((64, 192))).astype(np.float32)
steps = {}
for mode in ("matmul", "matmul_hi", "matmul_fast"):
    solver = KSSolver(nx=192, lx=22.0, dt=0.1, oversampling=30, fft_mode=mode)
    steps[mode] = np.asarray(solver.step(jnp.asarray(y), jnp.asarray(f)))
ref = steps["matmul"]
scale = np.abs(ref).max()
for mode in ("matmul_hi", "matmul_fast"):
    err = np.abs(steps[mode] - ref).max() / scale
    print(json.dumps({"study": "ks_step_accuracy", "mode": mode,
                      "rel_err_vs_highest": float(f"{err:.3e}")}), flush=True)

# ------------------------------------- throughput: bench.py configuration
N_ENVS, CHUNK = 16384, 50
for mode in ("matmul", "matmul_hi"):
    setup = build_ks(dataclasses.replace(KS22))
    # rebuild the env with the solver in the requested mode
    solver = KSSolver(nx=192, lx=22.0, dt=0.1, oversampling=30, fft_mode=mode)
    env = dataclasses.replace(setup.env, step_fn=solver.step)
    trainer = BatchedTrainer(env, setup.agent,
                             BatchedTrainerConfig(n_envs=N_ENVS, batch_size=4096,
                                                  update_loops=1),
                             random_init=ks_random_init(KS22))
    ts = trainer.init(jax.random.PRNGKey(0))
    chunk_fn = trainer.make_chunk_fn(CHUNK)
    ts, recs = chunk_fn(ts)
    jax.block_until_ready(recs["mean_reward"])
    best = 0.0
    for _ in range(5):
        t0 = time.perf_counter()
        ts, recs = chunk_fn(ts)
        jax.block_until_ready(recs["mean_reward"])
        best = max(best, CHUNK * N_ENVS / (time.perf_counter() - t0))
    print(json.dumps({"study": "batched_throughput", "mode": mode,
                      "env_steps_per_sec": round(best, 1),
                      "final_mean_reward": round(float(jnp.mean(recs["mean_reward"])), 4)}),
          flush=True)
