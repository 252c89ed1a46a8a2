"""Population-trainer scaling on the real chip: P members x B envs as one
fused program vs the standalone single-member rate (the serial-study
baseline). Study speedup = aggregate rate / solo rate (a serial multi-seed
study advances one member at solo rate; the population advances all P at
once). Members are flattened member-major into the env axis — the program
is the single-run big-batch trainer with vmapped per-member networks
(train/population.py ARCHITECTURE note; the naive whole-step vmap measured
0.9x SERIAL at P=8). Uses the bench tier (etdrk4 + matmul_hi + 1-pass-bf16
nl + spectral carry) with a precomputed y0 pool. Two regimes:

* B=256 — the PRODUCT recipe scale (the lh training recipe trains at 256
  envs): the per-member program badly underfills the chip, so the
  population win is largest here — this is the multi-seed-study use case.
* B=2048 — members big enough that P=8 fills the chip (16k envs total);
  the expected aggregate is the single-run 16k rate.
"""
import dataclasses
import os
import time

import jax

jax.config.update("jax_default_prng_impl", "rbg")
jax.config.update("jax_compilation_cache_dir", os.path.join(os.getcwd(), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from distributedconvrl_pde_control_tpu.configs import KS22, build_ks
from distributedconvrl_pde_control_tpu.train.batched import (
    BatchedTrainer,
    BatchedTrainerConfig,
)
from distributedconvrl_pde_control_tpu.train.population import PopulationTrainer

setup = build_ks(dataclasses.replace(KS22, fft_mode="matmul_hi", stepper="etdrk4",
                                     nl_fft_mode="matmul_fast",
                                     spectral_carry=True))
keys = jax.random.split(jax.random.PRNGKey(99), 32)
POOL = jnp.stack([jnp.asarray(setup.random_init(k)) for k in keys])


def timed(label, init_fn, chunk_fn, n_total_envs, chunks=5, chunk_len=50):
    ts = init_fn()
    ts, _ = chunk_fn(ts)
    jax.block_until_ready(ts.total_env_steps)
    t0 = time.perf_counter()
    for _ in range(chunks):
        ts, _ = chunk_fn(ts)
    jax.block_until_ready(ts.total_env_steps)
    rate = chunks * chunk_len * n_total_envs / (time.perf_counter() - t0)
    print(f"{label}: {rate/1e6:7.2f}M env steps/s", flush=True)
    return rate


for B, batch in ((256, 256), (2048, 1024)):
    tcfg = BatchedTrainerConfig(n_envs=B, batch_size=batch, update_loops=1)
    solo = BatchedTrainer(setup.env, setup.agent, tcfg, y0_pool=POOL)
    r_solo = timed(f"B={B}: solo member          ",
                   lambda: solo.init(jax.random.PRNGKey(0)),
                   solo.make_chunk_fn(50), B)
    for P in (8,) if B == 256 else (2, 4, 8):
        pop = PopulationTrainer(setup.env, setup.agent, tcfg, n_members=P,
                                y0_pool=POOL)
        r = timed(f"B={B}: population P={P}       ",
                  lambda: pop.init(jax.random.PRNGKey(0)),
                  pop.make_chunk_fn(50), P * B)
        print(f"  -> study speedup over {P} serial runs: {r / r_solo:.2f}x "
              f"(ideal {P}.0x)", flush=True)

# per-member traced learning rates (inject_hyperparams): the overhead of
# making lr an opt-state leaf instead of a compile-time constant
import numpy as np

tcfg = BatchedTrainerConfig(n_envs=2048, batch_size=1024, update_loops=1)
pop_lr = PopulationTrainer(setup.env, setup.agent, tcfg, n_members=8,
                           y0_pool=POOL,
                           lr_actor=np.full(8, 5e-4, np.float32),
                           lr_critic=np.full(8, 1e-3, np.float32))
timed("B=2048: population P=8 + traced lrs", lambda: pop_lr.init(jax.random.PRNGKey(0)),
      pop_lr.make_chunk_fn(50), 8 * 2048)
