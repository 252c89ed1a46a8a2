"""Preset config builders: shapes, lattices, kernel properties."""

import dataclasses

import numpy as np
import pytest

from distributedconvrl_pde_control_tpu import configs as C


@pytest.mark.parametrize("cfg,n_act,ns", [
    (C.FLUID_8, 64, 9),
    (C.FLUID_16, 256, 9),
    (C.FLUID_32, 1024, 9),
])
def test_fluid_lattices(cfg, n_act, ns):
    assert len(cfg.positions) == n_act
    # lattice spans the grid uniformly (FluidSetup.jl:61-63)
    xs = sorted({p[0] for p in cfg.positions})
    assert xs[0] == 1 and len(xs) == cfg.sensors_per_axis
    setup = C.build_fluid(dataclasses.replace(cfg, nx=64))  # small grid, same lattice logic
    assert setup.agent.cfg.n_actuators == n_act
    assert setup.agent.cfg.ns == ns
    assert setup.env.action_shape == (1, n_act)


def test_fluid_eval_variant_grid_and_seed():
    cfg = dataclasses.replace(C.FLUID_8, evaluation=True)
    assert cfg.grid_nx == 256 and cfg.grid_seed == 76  # FluidSetup.jl:33-36
    assert cfg.oversampling == int(np.floor(16 * 256 * 0.02))


def test_ks_presets_match_reference_scripts():
    assert C.KS22.nx == 192 and len(C.KS22.sensor_positions) == 8
    assert C.KS200.nx == 240 and len(C.KS200.sensor_positions) == 80
    assert C.KS500.nx == 600 and len(C.KS500.sensor_positions) == 200
    assert C.KS200_DISTURBED.mu == 0.02
    s = C.build_ks(C.KS22)
    assert s.agent.cfg.ns == 1  # window 1, temporal 1, no memory
    # actor 1 -> 6 -> 1, critic 2 -> 140 -> 1 (nna_scale 0.6 / 7.0, drop mid)
    assert [l["w"].shape for l in s.agent.init_state(
        __import__("jax").random.PRNGKey(0)).actor] == [(6, 1), (1, 6)]


def test_ks_global_preset():
    s = C.build_ks_global(C.KS22_GLOBAL)
    assert s.agent.cfg.mono and s.agent.cfg.n_actuators == 1
    assert s.env.action_shape == (8, 1)  # flat action vector as a column
    assert s.env.n_rewards == 1
    astate = s.agent.init_state(__import__("jax").random.PRNGKey(0))
    # actor 8 -> 48 -> 8 (nna_scale 4.8), critic 16 -> 1120 -> 1 (56.0)
    assert [l["w"].shape for l in astate.actor] == [(48, 8), (8, 48)]
    assert [l["w"].shape for l in astate.critic] == [(1120, 16), (1, 1120)]


def test_keller_segel_preset():
    cfg = C.KELLER_SEGEL_10_16
    assert len(cfg.sensor_positions) == 20
    assert len(cfg.actuators_to_sensors) == 16
    s = C.build_keller_segel(cfg)
    # 2 fields x window 3 x temporal 2 = 12 obs rows
    assert s.agent.cfg.ns == 12
    assert s.agent.cfg.start_steps == -1  # start policy disabled
    assert s.agent.cfg.start_policy == "random"
