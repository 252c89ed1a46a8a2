"""Dense chains (plain-JAX pytrees) matching the reference network factory.

Reference `create_NNA` (src/PDEagent.jl:14-56):
  actor : ns -> floor(10*nna_scale) [-> same] -> na, hidden `fun`, tanh head
  critic: ns+na -> floor(20*nna_scale) [-> same] -> 1, hidden `fun`, linear head
with glorot-uniform weights and zero biases (Flux Dense defaults).

Convention: inputs are column-major like the reference — x has shape
(features, batch) and the actuator axis IS the batch axis (the
"convolutional" weight sharing, src/PDEagent.jl:189).
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def glorot_uniform(key, n_out: int, n_in: int) -> jnp.ndarray:
    limit = math.sqrt(6.0 / (n_in + n_out))
    return jax.random.uniform(key, (n_out, n_in), jnp.float32, -limit, limit)


def init_chain(key, sizes: Sequence[int]):
    """Init [(W, b), ...] for a dense chain with the given layer sizes."""
    params = []
    keys = jax.random.split(key, len(sizes) - 1)
    for k, n_in, n_out in zip(keys, sizes[:-1], sizes[1:]):
        params.append({"w": glorot_uniform(k, n_out, n_in), "b": jnp.zeros((n_out,), jnp.float32)})
    return params


def apply_chain(params, x, hidden_act: Callable = jax.nn.relu, final_act: Callable | None = None):
    """y = chain(x) for x of shape (features,) or (features, batch)."""
    squeeze = x.ndim == 1
    h = x[:, None] if squeeze else x
    for i, layer in enumerate(params):
        h = layer["w"] @ h + layer["b"][:, None]
        if i < len(params) - 1:
            h = hidden_act(h)
        elif final_act is not None:
            h = final_act(h)
    return h[:, 0] if squeeze else h


def actor_sizes(ns: int, na: int, nna_scale: float, drop_middle_layer: bool):
    """Layer sizes per create_NNA (PDEagent.jl:15,19-29)."""
    h = int(math.floor(10 * nna_scale))
    return [ns, h, na] if drop_middle_layer else [ns, h, h, na]


def critic_sizes(ns: int, na: int, nna_scale: float, drop_middle_layer: bool):
    """Layer sizes per create_NNA (PDEagent.jl:16,31-43)."""
    h = int(math.floor(20 * nna_scale))
    return [ns + na, h, 1] if drop_middle_layer else [ns + na, h, h, 1]
