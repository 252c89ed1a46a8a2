"""Decompose the bench.py headline config: where does step time go?"""
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
    BatchedTrainer, BatchedTrainerConfig)

N = 16384
setup = build_ks(dataclasses.replace(KS22, fft_mode="matmul_hi", stepper="etdrk4",
                                     nl_fft_mode="matmul_fast"))


def timed(label, trainer, learn, chunks=5, chunk_len=50):
    ts = trainer.init(jax.random.PRNGKey(1))
    chunk = trainer.make_chunk_fn(chunk_len, learn=learn)
    ts, _ = chunk(ts)
    jax.block_until_ready(ts.total_env_steps)
    t0 = time.perf_counter()
    for _ in range(chunks):
        ts, _ = chunk(ts)
    jax.block_until_ready(ts.total_env_steps)
    rate = chunks * chunk_len * N / (time.perf_counter() - t0)
    print(f"{label}: {rate/1e6:7.2f}M env steps/s", flush=True)
    return rate


from distributedconvrl_pde_control_tpu.configs.ks import ks_random_init

trainer = BatchedTrainer(setup.env, setup.agent,
                         BatchedTrainerConfig(n_envs=N, batch_size=4096,
                                              update_loops=1),
                         random_init=ks_random_init(KS22))
full = timed("full (rollout+push+learn)", trainer, learn=True)
nolearn = timed("rollout+push (learn=False)", trainer, learn=False)

# flat carried layouts (bitwise-equivalent; tests/test_batched_trainer.py):
# obs-only, then obs+action
for label, fo, fa in (("flat obs carry            ", True, False),
                      ("flat obs+action carry     ", True, True)):
    timed(label, BatchedTrainer(
        setup.env, setup.agent,
        BatchedTrainerConfig(n_envs=N, batch_size=4096, update_loops=1,
                             flat_obs_state=fo, flat_action_state=fa),
        random_init=ks_random_init(KS22)), learn=True)

# spectral carry (r04, now the _tp/bench default): the half-spectrum is
# carried across env steps and the forcing spectrum comes from
# pre-transformed actuator kernels — 2 of the 3 per-step boundary
# transforms vanish (configs/ks.py spectral_carry)
spec_setup = build_ks(dataclasses.replace(
    KS22, fft_mode="matmul_hi", stepper="etdrk4", nl_fft_mode="matmul_fast",
    spectral_carry=True))
timed("spectral carry            ", BatchedTrainer(
    spec_setup.env, spec_setup.agent,
    BatchedTrainerConfig(n_envs=N, batch_size=4096, update_loops=1),
    random_init=ks_random_init(KS22)), learn=True)

# spectral featurize (r05 candidate lever): featurize/reward/guard consume
# the carry via exact Parseval contractions — the LAST full-tier synthesis
# transform per env step vanishes too (configs/ks.py spectral_featurize)
sf_setup = build_ks(dataclasses.replace(
    KS22, fft_mode="matmul_hi", stepper="etdrk4", nl_fft_mode="matmul_fast",
    spectral_carry=True, spectral_featurize=True))
timed("spectral carry+featurize  ", BatchedTrainer(
    sf_setup.env, sf_setup.agent,
    BatchedTrainerConfig(n_envs=N, batch_size=4096, update_loops=1),
    random_init=ks_random_init(KS22)), learn=True)

# solver+policy only: time a bare scan of env steps with a fixed actor
import numpy as np
from distributedconvrl_pde_control_tpu.agents.ddpg import DDPGAgent

env, agent = setup.env, setup.agent
astate = agent.init_state(jax.random.PRNGKey(0))
acfg = agent.cfg
est = jax.vmap(lambda _: env.reset())(jnp.arange(N))

def body(c, _):
    est, key = c
    key, k_act = jax.random.split(key)
    obs_flat = jnp.moveaxis(est.obs, 0, 1).reshape(acfg.ns, N * acfg.n_actuators)
    a_flat = agent.act(astate, obs_flat, k_act, learning=True)
    actions = jnp.moveaxis(a_flat.reshape(acfg.na_rows, N, acfg.n_actuators), 1, 0)
    est = jax.vmap(env.step)(est, actions)
    return (est, key), None

@jax.jit
def roll(est, key):
    (est, key), _ = jax.lax.scan(body, (est, key), None, length=50)
    return est, key

est, key = roll(est, jax.random.PRNGKey(3))
jax.block_until_ready(est.time)
t0 = time.perf_counter()
for _ in range(5):
    est, key = roll(est, key)
jax.block_until_ready(est.time)
rate = 5 * 50 * N / (time.perf_counter() - t0)
print(f"solver+policy only        : {rate/1e6:7.2f}M env steps/s", flush=True)

# --- isolate the reset-generation and replay-push costs (monkeypatch tiers)
import distributedconvrl_pde_control_tpu.train.batched as B

# (a) constant reset states: auto-reset still selects (where) but the fresh
# states are a broadcast jit constant instead of per-step regeneration
st0 = jax.vmap(trainer._reset1)(trainer._fresh_y0s(jax.random.PRNGKey(9), 8))
const_states = jax.tree.map(
    lambda x: jnp.broadcast_to(x[:1], (N,) + x.shape[1:]), st0)
orig_fresh = BatchedTrainer._fresh_states
BatchedTrainer._fresh_states = lambda self, key, n: const_states
timed("no reset regeneration   ", trainer, learn=True)
BatchedTrainer._fresh_states = orig_fresh

# (b) replay push skipped entirely (learn off so sampling never sees it)
orig_push = B.replay_push_flat
B.replay_push_flat = lambda buf, *a, **k: buf
timed("no replay push (nolearn)", trainer, learn=False)
B.replay_push_flat = orig_push

# (c) driver-in-loop: consume the packed records every chunk exactly like
# train_batched (depth-4 pipeline since r04: dispatch up to 4 chunks before
# reading chunk n's records + feeding the hook) — measures the PRODUCT
# training loop including the device->host record reads, not just the chunk
# program. Two read paths: dense = the full (5, 50, N) f32 plane (16.4 MB
# per chunk at N=16384, bandwidth-bound through the axon tunnel), sparse =
# the r04 header + finished-step-rows reader (train/records.py, ~320 kB).
from distributedconvrl_pde_control_tpu.train.hooks import PDEHook
from distributedconvrl_pde_control_tpu.train.records import (
    consume_record_read, start_record_read)


def timed_driver(label, trainer, sparse, chunks=10, chunk_len=50, depth=4):
    ts = trainer.init(jax.random.PRNGKey(1))
    chunk = trainer.make_chunk_fn(chunk_len)
    hook = PDEHook(collect_best_trace=False)
    ts, recs = chunk(ts)
    jax.block_until_ready(recs)
    pending = []
    t0 = time.perf_counter()
    for _ in range(chunks):
        ts, recs = chunk(ts)
        pending.append(start_record_read(recs, sparse))
        if len(pending) > depth:
            hook.feed_episode_records(consume_record_read(pending.pop(0)))
    for h in pending:
        hook.feed_episode_records(consume_record_read(h))
    jax.block_until_ready(ts.total_env_steps)
    rate = chunks * chunk_len * N / (time.perf_counter() - t0)
    print(f"{label}: {rate/1e6:7.2f}M env steps/s", flush=True)
    return rate


timed_driver("driver-in-loop dense reads", trainer, sparse=False)
timed_driver("driver-in-loop sparse reads", trainer, sparse=True)
