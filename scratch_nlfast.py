"""Ad-hoc TPU study: 1-pass bf16 NONLINEAR-term transforms in the ETDRK4
KS stepper (VERDICT r2 item 5 — the identified next single-chip lever).

Part A (accuracy): per-env-step relative error on attractor states,
oracle = etdrk4 @ matmul (f32/HIGHEST), for:
  hi      = matmul_hi everywhere            (the bench tier today)
  hi+nlf  = matmul_hi boundary, matmul_fast nonlinear   (the candidate)
  fast    = matmul_fast everywhere          (rejected in r1 — context)

Part B (throughput): the bench.py configuration (16384 envs, fused
rollout+train chunks) with and without nl_fft_mode=matmul_fast.
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
    os.path.join(os.path.abspath("."), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from distributedconvrl_pde_control_tpu.configs import KS22, build_ks
from distributedconvrl_pde_control_tpu.configs.ks import ks_random_init
from distributedconvrl_pde_control_tpu.ops.ks import KSSolverETDRK4

cfg = KS22

# ---- Part A: accuracy on attractor states
mk = lambda **kw: KSSolverETDRK4(nx=cfg.nx, lx=cfg.lx, dt=cfg.dt,
                                 oversampling=1, mu=cfg.mu, **kw)
oracle = mk(fft_mode="matmul")
hi = mk(fft_mode="matmul_hi")
hi_nlf = mk(fft_mode="matmul_hi", nl_fft_mode="matmul_fast")
fast = mk(fft_mode="matmul_fast")

B = 64
key = jax.random.PRNGKey(7)
rinit = ks_random_init(cfg)
y = jax.vmap(rinit)(jax.random.split(key, B))
zero_f = jnp.zeros_like(y)
# settle onto the attractor with the oracle stepper
for _ in range(200):
    y = oracle.step(y, zero_f)
y = jax.block_until_ready(y)

errs = {"hi": [], "hi_nlf": [], "fast": []}
yo = y
for t in range(50):
    y_next = oracle.step(yo, zero_f)
    scale = float(jnp.sqrt(jnp.mean(y_next**2)))
    for name, sv in (("hi", hi), ("hi_nlf", hi_nlf), ("fast", fast)):
        yv = sv.step(yo, zero_f)
        errs[name].append(float(jnp.sqrt(jnp.mean((yv - y_next) ** 2))) / scale)
    yo = y_next
for name, e in errs.items():
    print(json.dumps({"tier": name,
                      "rel_err_per_step_mean": float(np.mean(e)),
                      "rel_err_per_step_max": float(np.max(e))}), flush=True)

# ---- Part B: throughput at the bench configuration
from distributedconvrl_pde_control_tpu.train.batched import (
    BatchedTrainer, BatchedTrainerConfig,
)

N_ENVS, CHUNK, ROUNDS = 16384, 50, 5

def rate(nl_mode):
    setup = build_ks(dataclasses.replace(KS22, fft_mode="matmul_hi",
                                         stepper="etdrk4",
                                         nl_fft_mode=nl_mode))
    trainer = BatchedTrainer(
        setup.env, setup.agent,
        BatchedTrainerConfig(n_envs=N_ENVS, batch_size=4096, update_loops=1),
        random_init=ks_random_init(KS22))
    ts = trainer.init(jax.random.PRNGKey(0))
    chunk_fn = trainer.make_chunk_fn(CHUNK)
    ts, recs = chunk_fn(ts)
    jax.block_until_ready(recs)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ROUNDS):
            ts, recs = chunk_fn(ts)
        jax.block_until_ready(recs)
        best = max(best, ROUNDS * CHUNK * N_ENVS / (time.perf_counter() - t0))
    return best

r_base = rate(None)
print(json.dumps({"tier": "hi", "env_steps_per_sec": round(r_base, 1)}), flush=True)
r_nlf = rate("matmul_fast")
print(json.dumps({"tier": "hi_nlf", "env_steps_per_sec": round(r_nlf, 1),
                  "speedup": round(r_nlf / r_base, 3)}), flush=True)
