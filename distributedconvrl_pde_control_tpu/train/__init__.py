"""Training layer: jitted episode runner, hooks, drivers, checkpointing."""

from distributedconvrl_pde_control_tpu.train.loop import (
    EpisodeResult,
    TrainState,
    make_episode_fn,
)
from distributedconvrl_pde_control_tpu.train.hooks import PDEHook

__all__ = ["EpisodeResult", "TrainState", "make_episode_fn", "PDEHook"]
