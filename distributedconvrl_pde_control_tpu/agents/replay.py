"""On-device per-actuator replay buffer.

The reference interleaves every actuator's (s, a, r, t) as independent rows of
one `CircularArraySARTTrajectory` and resolves the next state as the entry
`n_actuators` slots ahead (src/PDEagent.jl:254-340). Its dummy terminal
state/action pairs (pushed PostEpisode, popped next PreEpisode,
PDEagent.jl:237-252,291-314) exist only so that slot arithmetic stays valid
across episode boundaries; every transition with a cross-episode "next state"
has terminal=true, so the bootstrap term is masked anyway.

Here we store the next state explicitly (SARTS'), which is provably the same
effective transition set:
  * the state pushed at PreAct of step k+1 equals the featurized state after
    step k — exactly what `state[idx + n_actuators]` dereferences;
  * terminal rows mask the bootstrap identically;
  * the reference samples logical indices 1..len-n_actuators, i.e. it
    excludes the newest `n_actuators` rows — kept via `exclude_newest`.

Everything is a fixed-shape pytree so pushes and samples run inside jitted
scans with zero host traffic.

LAYOUT (TPU-deliberate): state/action arrays are stored TRANSPOSED —
`(dim, capacity)`, slot = minor axis — not `(capacity, dim)`. TPU physical
tiles are (8 sublanes, 128 lanes) on the two minor dims, so a `(capacity, 3)`
array would pad its 3-wide minor axis to 128 lanes and every push would move
~43x more HBM bytes than the logical data. With slots on the minor axis the
physical layout equals the logical one, pushes are contiguous lane-aligned
writes, and the column matrices the learner consumes ((dim, batch), actuator
= column, as everywhere else in this rebuild) come out of sampling without a
transpose. Measured: 14% of the whole fused train step at 16k envs
(PERFORMANCE.md replay-layout note).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Replay:
    s: jnp.ndarray  # (ns, capacity)
    a: jnp.ndarray  # (na, capacity)
    r: jnp.ndarray  # (capacity,)
    t: jnp.ndarray  # (capacity,) f32 0/1
    sn: jnp.ndarray  # (ns, capacity)
    ptr: jnp.ndarray  # int32 next write slot
    size: jnp.ndarray  # int32 valid entries


def replay_init(capacity: int, ns: int, na: int) -> Replay:
    return Replay(
        s=jnp.zeros((ns, capacity), jnp.float32),
        a=jnp.zeros((na, capacity), jnp.float32),
        r=jnp.zeros((capacity,), jnp.float32),
        t=jnp.zeros((capacity,), jnp.float32),
        sn=jnp.zeros((ns, capacity), jnp.float32),
        ptr=jnp.asarray(0, jnp.int32),
        size=jnp.asarray(0, jnp.int32),
    )


def replay_push_flat(rb: Replay, s_cols, a_cols, r_vec, t_vec, sn_cols) -> Replay:
    """Push `n` transitions given as COLUMN blocks (dim, n).

    When the capacity divides evenly by the (static) push width — true for
    every shipped preset, whose pushes are always `n_actuators` (or
    n_envs*n_actuators) wide — the write is a CONTIGUOUS
    `dynamic_update_slice` along the slot axis: the pointer only ever visits
    multiples of n, so blocks never wrap, and XLA lowers the update in
    place. The general scatter falls back only for non-dividing widths.
    """
    n = r_vec.shape[0]
    capacity = rb.s.shape[1]
    if capacity % n == 0:
        up = jax.lax.dynamic_update_slice_in_dim
        return rb.replace(
            s=up(rb.s, s_cols, rb.ptr, 1),
            a=up(rb.a, a_cols, rb.ptr, 1),
            r=up(rb.r, r_vec, rb.ptr, 0),
            t=up(rb.t, t_vec, rb.ptr, 0),
            sn=up(rb.sn, sn_cols, rb.ptr, 1),
            ptr=(rb.ptr + n) % capacity,
            size=jnp.minimum(rb.size + n, capacity),
        )
    idx = (rb.ptr + jnp.arange(n, dtype=jnp.int32)) % capacity
    return rb.replace(
        s=rb.s.at[:, idx].set(s_cols),
        a=rb.a.at[:, idx].set(a_cols),
        r=rb.r.at[idx].set(r_vec),
        t=rb.t.at[idx].set(t_vec),
        sn=rb.sn.at[:, idx].set(sn_cols),
        ptr=(rb.ptr + n) % capacity,
        size=jnp.minimum(rb.size + n, capacity),
    )


def replay_push_columns(rb: Replay, s_cols, a_cols, r_vec, terminal, sn_cols) -> Replay:
    """Push one env step's per-actuator transitions.

    s_cols/a_cols/sn_cols: (dim, n_cols) column matrices (actuator = column,
    as in the PreAct/PostAct pushes at PDEagent.jl:254-289); r_vec: (n_cols,)
    — or (1,) in mono mode; terminal: scalar bool shared by all columns.
    """
    n = r_vec.shape[0]
    t_vec = jnp.full((n,), terminal, jnp.float32)
    return replay_push_flat(rb, s_cols, a_cols, r_vec, t_vec, sn_cols)


def replay_sample(rb: Replay, key, batch_size: int, exclude_newest: int):
    """Uniform sample of `batch_size` transitions as column matrices.

    Logical index o in [0, size - exclude_newest) maps to physical slot
    (start + o) % capacity where start is the oldest entry — the same
    distribution as `pde_sample`'s `rand(1:length(t)-number_actuators)`
    (PDEagent.jl:317-321).
    """
    capacity = rb.s.shape[1]
    n_valid = jnp.maximum(rb.size - exclude_newest, 1)
    offs = jax.random.randint(key, (batch_size,), 0, n_valid)
    start = jnp.where(rb.size >= capacity, rb.ptr, 0)
    idx = (start + offs) % capacity

    if capacity % 128 == 0 and rb.s.shape[0] == 1 and rb.a.shape[0] == 1:
        # TPU fast path for SKINNY buffers (1-row state/action columns, e.g.
        # the KS family's scalar per-actuator observations): a gather along
        # the minor (lane) axis lowers to a slow per-element walk; instead
        # gather whole 128-lane BLOCKS (a cheap row gather after the
        # minor-only reshape of slots to (capacity/128, 128)) and reduce
        # out the wanted lane with a one-hot mask. Identical index
        # distribution and values; measured 1.23x on the whole fused train
        # step at 16k envs (PERFORMANCE.md). For multi-row buffers the
        # block gather LOSES (the (dim, nblk, 128) gather relayouts per
        # sample — measured 1.4-2x the whole step on the 12-row
        # Keller-Segel buffers), so those stay on the plain gather below.
        blk = idx // 128
        onehot = jax.nn.one_hot(idx % 128, 128, dtype=rb.r.dtype)  # (B, 128)
        nblk = capacity // 128

        def g1(x):  # (capacity,) -> (B,)
            rows = x.reshape(nblk, 128)[blk]
            return jnp.einsum("bl,bl->b", rows, onehot)

        def g2(x):  # (1, capacity) -> (1, B)
            return g1(x.reshape(capacity))[None, :]

        return (g2(rb.s), g2(rb.a), g1(rb.r), g1(rb.t), g2(rb.sn))

    return (
        rb.s[:, idx],  # (ns, B)
        rb.a[:, idx],  # (na, B)
        rb.r[idx],  # (B,)
        rb.t[idx],  # (B,)
        rb.sn[:, idx],  # (ns, B)
    )
