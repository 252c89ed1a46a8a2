"""Model layer: tiny shared-weight MLPs used as actor/critic."""

from distributedconvrl_pde_control_tpu.models.mlp import (
    apply_chain,
    init_chain,
    actor_sizes,
    critic_sizes,
)

__all__ = ["apply_chain", "init_chain", "actor_sizes", "critic_sizes"]
