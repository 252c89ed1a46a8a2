"""Bandwidth-aware host reads of packed chunk records.

The chunked trainers return ONE packed `(5, n_steps, n_envs)` f32 record
array per chunk (train/hooks.py REC_* row order) so the host accounting
costs a single device->host RPC — the right trade at small env counts,
where the transfer is latency-bound. At LARGE env counts the same design
is bandwidth-bound instead: the bench config (16384 envs x 50-step
chunks) moves 16.4 MB per chunk through the axon tunnel, while the host
accounting actually consumes only

* the rows of steps where at least one episode finished — episodes are
  time-synchronized (auto-reset restarts every env's clock together), so
  normally exactly ONE step per chunk carries every finish, with extra
  rows only for mid-episode blow-up terminations — and
* the `(n_steps,)` per-step mean-reward vector (packed broadcast over the
  env axis, i.e. 99.99% redundant bytes on the wire).

The sparse reader transfers a tiny 2-row header (any-finished flag + mean
reward per step, `4*2*n_steps` bytes), then gathers ONLY the finished
steps' `(5, n_envs)` rows via one cached `dynamic_slice` program per read
— ~0.4 kB + ~320 kB per boundary chunk at the bench config vs 16.4 MB,
with bit-identical values in identical order (equivalence test in
tests/test_batched_trainer.py). Reads are split into start/consume halves
so the chunk pipeline can overlap the RPC latency exactly like the dense
path (`utils/hostarray.start_host_copies`).

Reference parity: the reference's hook accounting is host-synchronous per
episode (src/PDEhook.jl:51-63); packed records and this reader are
rebuild-side machinery that keeps its semantics over fused 16k-env chunks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from distributedconvrl_pde_control_tpu.train.hooks import (
    REC_COMPLETED,
    REC_EP_REWARD,
    REC_ERRORED,
    REC_FINISHED,
    REC_MEAN_REWARD,
    unpack_records,
)
from distributedconvrl_pde_control_tpu.utils.hostarray import start_host_copies

# Below this many record bytes the full read is latency-bound and the dense
# single-RPC path wins (the sparse path costs 1-2 extra RPCs); above it the
# transfer is bandwidth-bound and sparse wins. 1 MB = the measured crossover
# neighborhood on the axon tunnel (PERFORMANCE.md "Record reads at 16k envs").
SPARSE_RECORDS_MIN_BYTES = 1 << 20


@jax.jit
def _records_header(packed):
    """(2, n_steps) f32: row 0 = 1.0 where any env finished at that step,
    row 1 = the per-step mean reward (column 0 of the broadcast plane)."""
    return jnp.stack([
        (packed[REC_FINISHED] > 0.5).any(axis=1).astype(jnp.float32),
        packed[REC_MEAN_REWARD, :, 0],
    ])


@jax.jit
def _records_step(packed, step):
    """One step's (5, n_envs) record rows; `step` is traced so every read
    reuses a single compiled gather."""
    return jax.lax.dynamic_slice_in_dim(packed, step, 1, axis=1)[:, 0]


def record_bytes(n_steps: int, n_envs: int) -> int:
    return 5 * 4 * n_steps * n_envs


def start_record_read(packed, sparse: bool):
    """Kick off the device->host work for one chunk's records; returns an
    opaque handle for `consume_record_read`. Call at dispatch time (before
    queueing more chunks) so the RPC latency overlaps device compute."""
    if not sparse:
        start_host_copies(packed)
        return (False, packed, None)
    header = _records_header(packed)
    start_host_copies(header)
    return (True, packed, header)


def consume_record_read(handle) -> dict:
    """Finish a record read: the dict form `PDEHook.feed_episode_records`
    consumes (finished/completed/ep_reward/errored over finished steps only
    on the sparse path — same values, same step-major order) plus the full
    `(n_steps,)` mean_reward vector either way."""
    is_sparse, packed, header = handle
    if not is_sparse:
        return unpack_records(packed)
    h = np.asarray(header)
    mean_reward = h[1]
    idx = np.flatnonzero(h[0] > 0.5)
    if idx.size:
        rows = np.stack(
            [np.asarray(_records_step(packed, int(s))) for s in idx], axis=1)
    else:
        rows = np.zeros((5, 0, packed.shape[2]), np.float32)
    return {
        "finished": rows[REC_FINISHED] > 0.5,
        "completed": rows[REC_COMPLETED] > 0.5,
        "ep_reward": rows[REC_EP_REWARD],
        "errored": rows[REC_ERRORED] > 0.5,
        "mean_reward": mean_reward,
    }
