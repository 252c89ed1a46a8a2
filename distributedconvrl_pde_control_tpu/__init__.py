"""distributedconvrl_pde_control_tpu — TPU-native distributed convolutional RL
for PDE control.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
janstenner/DistributedConvRL-PDE-Control (arXiv 2301.10737): spatially local
Gaussian sensors/actuators over a PDE field, one weight-shared MLP policy
batched over all actuators ("convolutional" control), DDPG training with a
per-actuator replay buffer, and zero-shot transfer to larger domains.

Design stance (TPU-first, not a port):
  * every solver is a pure function `step(y, forcing) -> y` built from XLA
    FFTs / stencils and `lax.scan` over oversampled substeps;
  * the environment is a pytree `EnvState` + pure `env.step`;
  * sensors/actuators are precomputed kernel matrices so featurization and
    action smearing are single matmuls (MXU-friendly);
  * the whole rollout+learn episode is one jitted program — replay buffer,
    networks, optimizer state all live on device;
  * scale-out is `vmap` over env batches (DP) and `shard_map` spatial
    sharding with collective-based distributed FFT (SP), not processes.

The reference is pure Julia (~6k LoC, no native components); see SURVEY.md
for the full component inventory this package mirrors.
"""

__version__ = "0.1.0"

from distributedconvrl_pde_control_tpu.envs.pde_env import PDEEnv, EnvState
from distributedconvrl_pde_control_tpu.agents.ddpg import DDPGConfig, DDPGAgent

__all__ = ["PDEEnv", "EnvState", "DDPGConfig", "DDPGAgent", "__version__"]
