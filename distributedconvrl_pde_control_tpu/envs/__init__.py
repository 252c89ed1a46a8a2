"""Environment layer: functional PDE-control environments.

TPU-native rebuild of the reference's L2 (`src/PDEenv.jl`) + the featurize/
prepare_action/reward callbacks each experiment setup defines (L5). The env
is a pytree `EnvState` plus pure `reset`/`step`; sensors and actuators are
precomputed kernel matrices so observation and action smearing are matmuls.
"""

from distributedconvrl_pde_control_tpu.envs.pde_env import PDEEnv, EnvState
from distributedconvrl_pde_control_tpu.envs import features

__all__ = ["PDEEnv", "EnvState", "features"]
