"""Agent layer: DDPG (the workhorse), PPO variant, and baseline policies."""

from distributedconvrl_pde_control_tpu.agents.ddpg import DDPGAgent, DDPGConfig, DDPGState
from distributedconvrl_pde_control_tpu.agents.replay import (
    Replay,
    replay_init,
    replay_push_columns,
    replay_sample,
)

__all__ = [
    "DDPGAgent",
    "DDPGConfig",
    "DDPGState",
    "Replay",
    "replay_init",
    "replay_push_columns",
    "replay_sample",
]
