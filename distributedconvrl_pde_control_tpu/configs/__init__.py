"""Experiment presets replicating every shipped reference script's constants.

The reference configures experiments through Julia globals set in entry
scripts and consumed lexically by included setup files (SURVEY.md §5.6);
here each preset is an explicit dataclass -> `Setup` builder.
"""

from distributedconvrl_pde_control_tpu.configs.ks import (
    KSConfig,
    build_ks,
    KS22,
    KS200,
    KS500,
    KS200_DISTURBED,
    KS22_64,
    KS22_GLOBAL,
    build_ks_global,
)
from distributedconvrl_pde_control_tpu.configs.fluid import FluidConfig, build_fluid, FLUID_8, FLUID_16, FLUID_32, FLUID_8_256, FLUID_16_256
from distributedconvrl_pde_control_tpu.configs.keller_segel import (
    KellerSegelConfig,
    build_keller_segel,
    KELLER_SEGEL_10_16,
    KELLER_SEGEL_10_16_FAST,
)

__all__ = [
    "KSConfig", "build_ks", "KS22", "KS200", "KS500", "KS200_DISTURBED", "KS22_64",
    "KS22_GLOBAL", "build_ks_global",
    "FluidConfig", "build_fluid", "FLUID_8", "FLUID_16", "FLUID_32", "FLUID_8_256", "FLUID_16_256",
    "KellerSegelConfig", "build_keller_segel", "KELLER_SEGEL_10_16",
    "KELLER_SEGEL_10_16_FAST",
]
