"""Multi-chip path tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from distributedconvrl_pde_control_tpu.parallel.dfft import dfft2, difft2
from distributedconvrl_pde_control_tpu.parallel.halo import halo_exchange_1d
from distributedconvrl_pde_control_tpu.parallel.mesh import make_dp_sp_mesh
from distributedconvrl_pde_control_tpu.parallel.ns_sharded import (
    NSShardedSolver,
    make_sharded_ops,
)


def sp_mesh(n=4):
    return Mesh(np.asarray(jax.devices()[:n]), axis_names=("sp",))


def test_dfft2_matches_fft2():
    mesh = sp_mesh(4)
    ny = nx = 32
    rng = np.random.default_rng(0)
    x = rng.standard_normal((ny, nx)).astype(np.float32)

    f = shard_map(
        lambda b: dfft2(b, "sp"), mesh=mesh,
        in_specs=P("sp", None), out_specs=P(None, "sp"),
    )
    got = np.asarray(jax.jit(f)(jnp.asarray(x)))
    want = np.fft.fft2(x)
    assert np.allclose(got, want, atol=1e-3)

    g = shard_map(
        lambda b: difft2(b, "sp"), mesh=mesh,
        in_specs=P(None, "sp"), out_specs=P("sp", None),
    )
    back = np.asarray(jax.jit(g)(jnp.asarray(got)))
    assert np.allclose(back.real, x, atol=1e-4)


def test_dfft2_batched():
    mesh = sp_mesh(4)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 16, 16)).astype(np.float32)
    f = shard_map(
        lambda b: dfft2(b, "sp"), mesh=mesh,
        in_specs=P(None, "sp", None), out_specs=P(None, None, "sp"),
    )
    got = np.asarray(jax.jit(f)(jnp.asarray(x)))
    assert np.allclose(got, np.fft.fft2(x, axes=(-2, -1)), atol=1e-3)


def test_sharded_ns_matches_unsharded_truncated():
    """The sharded RK4 step must match a single-device run of the identical
    2/3-truncated scheme."""
    mesh = sp_mesh(4)
    nx = ny = 32
    nu, dt, oversampling = 5e-4, 0.01, 4
    ops = make_sharded_ops(nx, ny)
    solver = NSShardedSolver(nu=nu, sp_axis="sp")

    rng = np.random.default_rng(2)
    omg = rng.standard_normal((ny, nx)).astype(np.float32)
    w = np.fft.fft2(omg).astype(np.complex64) * np.asarray(ops.mask23)

    step = shard_map(
        lambda wb, ob: solver.step(wb, jnp.zeros_like(wb), ob, dt, oversampling),
        mesh=mesh,
        in_specs=(P(None, "sp"), jax.tree.map(lambda _: P(None, "sp"), ops)),
        out_specs=P(None, "sp"),
        check_vma=False,
    )
    got = np.asarray(jax.jit(step)(jnp.asarray(w), ops))

    # single-device oracle: same scheme with plain fft2
    def rhs(wh):
        psih = wh * np.asarray(ops.inv_k2)
        u = np.fft.ifft2(1j * np.asarray(ops.ky) * psih).real
        v = np.fft.ifft2(-1j * np.asarray(ops.kx) * psih).real
        dwdx = np.fft.ifft2(1j * np.asarray(ops.kx) * wh).real
        dwdy = np.fft.ifft2(1j * np.asarray(ops.ky) * wh).real
        nonlin = np.fft.fft2(-u * dwdx - v * dwdy) * np.asarray(ops.mask23)
        return -nu * np.asarray(ops.k2) * wh + nonlin

    want = w.astype(np.complex128)
    h = dt / oversampling
    for _ in range(oversampling):
        k1 = rhs(want)
        k2 = rhs(want + 0.5 * h * k1)
        k3 = rhs(want + 0.5 * h * k2)
        k4 = rhs(want + h * k3)
        want = want + h / 6 * (k1 + 2 * (k2 + k3) + k4)

    assert np.allclose(got, want, atol=5e-3), np.abs(got - want).max()


def test_halo_exchange_periodic_and_clamped():
    mesh = sp_mesh(4)
    x = np.arange(16, dtype=np.float32)

    f = shard_map(
        lambda b: halo_exchange_1d(b, "sp", halo=1, periodic=True),
        mesh=mesh, in_specs=P("sp"), out_specs=P("sp"), check_vma=False,
    )
    out = np.asarray(jax.jit(f)(jnp.asarray(x))).reshape(4, 6)
    # block 0 holds [15, 0,1,2,3, 4]
    assert np.allclose(out[0], [15, 0, 1, 2, 3, 4])
    assert np.allclose(out[3], [11, 12, 13, 14, 15, 0])

    g = shard_map(
        lambda b: halo_exchange_1d(b, "sp", halo=1, periodic=False),
        mesh=mesh, in_specs=P("sp"), out_specs=P("sp"), check_vma=False,
    )
    out = np.asarray(jax.jit(g)(jnp.asarray(x))).reshape(4, 6)
    assert np.allclose(out[0], [0, 0, 1, 2, 3, 4])  # clamped left ghost
    assert np.allclose(out[3], [11, 12, 13, 14, 15, 15])  # clamped right


def _tiny_fluid_cfg(**over):
    import dataclasses

    from distributedconvrl_pde_control_tpu.configs.fluid import FLUID_8

    return dataclasses.replace(FLUID_8, nx=16, sensors_per_axis=4, **over)


def test_multichip_trainer_one_step():
    from distributedconvrl_pde_control_tpu.parallel.multichip import (
        ShardedFluidTrainer,
        ShardedTrainConfig,
    )

    mesh = make_dp_sp_mesh(8)
    cfg = _tiny_fluid_cfg()
    tcfg = ShardedTrainConfig(n_envs=4, batch_size=8, capacity_per_dp=1024,
                              y0_pool_size=2)
    tr = ShardedFluidTrainer(cfg, mesh, tcfg)
    state = tr.init(jax.random.PRNGKey(0))
    step = tr.make_chunk_fn(1)
    s1, _ = step(state)
    s2, recs = step(s1)
    assert np.isfinite(float(s2.mean_reward))
    # 2 steps x (n_envs/n_dp) local envs x n_act pushes per dp shard
    n_act = cfg.sensors_per_axis**2
    assert int(np.asarray(s2.replay.size)[0]) == 2 * (tcfg.n_envs // 2) * n_act
    # params must remain replicated/identical after dp-pmean learning
    w_actor = s2.agent.actor[0]["w"]
    shards = [np.asarray(s.data) for s in w_actor.addressable_shards]
    for s in shards[1:]:
        assert np.array_equal(s, shards[0])
    assert np.isfinite(shards[0]).all()


def test_sharded_error_detection_2x4():
    """Device-side corrupted-field detection (FluidSetup.jl:263-273 +
    PDEhook.jl:78-82) on a 2x4 mesh: an injected corrupted field flags its
    episode through the chunk records into hook.errored_episodes; a
    diverged-but-smooth field does not. The halo logic is verified directly:
    a field whose only jumps sit across sp-shard boundaries must flag (the
    previous shard's last row arrives by ppermute)."""
    import dataclasses

    from distributedconvrl_pde_control_tpu.parallel.multichip import (
        ShardedFluidTrainer,
        ShardedTrainConfig,
    )
    from distributedconvrl_pde_control_tpu.train.hooks import PDEHook

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("dp", "sp"))
    cfg = _tiny_fluid_cfg(check_max_value="y", adaptive=False)
    tcfg = ShardedTrainConfig(n_envs=4, batch_size=8, capacity_per_dp=1024,
                              y0_pool_size=2)
    tr = ShardedFluidTrainer(cfg, mesh, tcfg)
    n = cfg.grid_nx

    # ---- unit: the sharded detector on hand-built fields
    flags_fn = jax.jit(shard_map(
        tr._error_flags, mesh=mesh, in_specs=(tr._w_spec,),
        out_specs=P("dp"), check_vma=False))
    w = np.zeros((4, n, n), np.float32)
    # env 0: constant per sp block -> jumps ONLY across shard boundaries
    w[0] = np.repeat(np.arange(4.0, dtype=np.float32) * 50.0, n // 4)[:, None]
    # env 1: large but smooth (constant) -> diverged, NOT corrupted
    w[1] = 50.0
    # env 2: x-direction jump inside every local block (shard-local path)
    w[2, :, n // 2:] = 50.0
    w_dev = jax.device_put(jnp.asarray(w), NamedSharding(mesh, tr._w_spec))
    flags = np.asarray(flags_fn(w_dev))
    assert flags.tolist() == [True, False, True, False]

    # ---- end to end: corrupted + blown-up env 0 flags its episode in the
    # hook; blown-up-but-smooth env 1 finishes unflagged
    state = tr.init(jax.random.PRNGKey(0))
    w = np.zeros((4, n, n), np.float32)
    w[0] = np.repeat(np.arange(4.0, dtype=np.float32) * 50.0, n // 4)[:, None]
    w[1] = 50.0  # blows up (check_max_value="y", max 3.0) but is smooth
    state = state.replace(
        w=jax.device_put(jnp.asarray(w), NamedSharding(mesh, tr._w_spec)))
    step = tr.make_chunk_fn(1)
    state, recs = step(state)
    from distributedconvrl_pde_control_tpu.train.hooks import unpack_records

    rec = unpack_records(recs)
    finished = rec["finished"][0]
    errored = rec["errored"][0]
    assert finished.tolist() == [True, True, False, False]
    assert errored.tolist() == [True, False, False, False]

    hook = PDEHook(collect_best_trace=False)
    hook.feed_episode_records(recs)
    assert hook.errored_episodes == [1]  # env 0 = first finished episode
    assert hook.ep - 1 == 2


def test_multichip_trainer_episode_accounting_and_best_tracking():
    """Chunked sharded training produces hook-grade episode records, an
    on-device best-actor snapshot, and a standard-format light checkpoint
    that the single-chip eval path loads."""
    import dataclasses

    from distributedconvrl_pde_control_tpu.parallel.multichip import (
        ShardedFluidTrainer,
        ShardedTrainConfig,
        load_actor_for_eval,
        save_sharded,
        train_sharded,
    )

    mesh = make_dp_sp_mesh(8)
    cfg = _tiny_fluid_cfg(te=0.2)  # 10-step episodes
    tcfg = ShardedTrainConfig(n_envs=8, batch_size=8, capacity_per_dp=2048,
                              y0_pool_size=2, chunk_len=10)
    tr = ShardedFluidTrainer(cfg, mesh, tcfg)
    state, hook = train_sharded(tr, loops=1, no_steps=20, seed=0, verbose=False)
    # 20 steps x 8 envs / 10-step episodes = 16 finished episodes
    assert hook.ep - 1 == 16
    assert len(hook.rewards) == 16
    assert np.isfinite(hook.bestreward)
    assert hook.best_actor is not None
    assert int(state.ep_count) == 16

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        save_sharded(d, tr, state, hook)
        actor = load_actor_for_eval(d, tr)
        got = jax.tree.map(lambda a, b: np.allclose(np.asarray(a), b),
                           actor, hook.best_actor)
        assert all(bool(x["w"]) and bool(x["b"]) for x in got)

        # single-chip checkpoint path loads the same file
        from distributedconvrl_pde_control_tpu.configs.fluid import build_fluid
        from distributedconvrl_pde_control_tpu.train import checkpoint
        from distributedconvrl_pde_control_tpu.train.loop import init_train_state

        setup = build_fluid(cfg)
        tmpl = init_train_state(setup.env, setup.agent, jax.random.PRNGKey(0))
        ts, hook2 = checkpoint.load(d, tmpl)
        assert hook2.bestreward == hook.bestreward


def test_multichip_sparse_records_accounting_matches_dense(monkeypatch):
    """train_sharded's dense/sparse record-read dispatch (train/records.py)
    yields identical hook accounting: forcing the sparse path (threshold 0)
    reproduces the dense run's episode rewards in identical order."""
    import dataclasses

    from distributedconvrl_pde_control_tpu.parallel.multichip import (
        ShardedFluidTrainer,
        ShardedTrainConfig,
        train_sharded,
    )
    from distributedconvrl_pde_control_tpu.train import records as rec_mod

    mesh = make_dp_sp_mesh(8)
    cfg = _tiny_fluid_cfg(te=0.2)  # 10-step episodes
    tcfg = ShardedTrainConfig(n_envs=8, batch_size=8, capacity_per_dp=2048,
                              y0_pool_size=2, chunk_len=10)

    hooks = {}
    for label, min_bytes in (("dense", 1 << 60), ("sparse", 0)):
        monkeypatch.setattr(rec_mod, "SPARSE_RECORDS_MIN_BYTES", min_bytes)
        tr = ShardedFluidTrainer(cfg, mesh, tcfg)
        _, hook = train_sharded(tr, loops=1, no_steps=20, seed=0,
                                verbose=False)
        hooks[label] = hook

    assert hooks["dense"].ep == hooks["sparse"].ep
    np.testing.assert_array_equal(hooks["dense"].rewards,
                                  hooks["sparse"].rewards)
    np.testing.assert_array_equal(hooks["dense"].errored_episodes,
                                  hooks["sparse"].errored_episodes)


def test_multichip_eval_driven_selection():
    """train_sharded with eval_every runs deterministic sharded evals and
    the BEST eval (not the best noisy episode) drives the hook's actor
    snapshot — the sharded twin of train_batched's eval-driven selection."""
    from distributedconvrl_pde_control_tpu.parallel.multichip import (
        ShardedFluidTrainer,
        ShardedTrainConfig,
        train_sharded,
    )

    mesh = make_dp_sp_mesh(8)
    cfg = _tiny_fluid_cfg(te=0.2)  # 10-step episodes
    tcfg = ShardedTrainConfig(n_envs=8, batch_size=8, capacity_per_dp=2048,
                              y0_pool_size=2, chunk_len=10)
    tr = ShardedFluidTrainer(cfg, mesh, tcfg)
    # eval horizon past the 10-step episode cap: the sharded eval scan has
    # no te cap, so all 15 steps are real (long-horizon semantics)
    state, hook = train_sharded(tr, loops=1, no_steps=20, seed=0,
                                verbose=False, eval_every=10, eval_steps=15)
    assert len(hook.evals) == 2
    steps, rewards = zip(*hook.evals)
    assert steps == (10, 20)
    assert all(np.isfinite(r) for r in rewards)
    assert hook.bestreward == max(rewards)
    assert hook.best_actor is not None
    # the snapshot is host-resident numpy (checkpoint-ready)
    assert isinstance(hook.best_actor[0]["w"], np.ndarray)


def test_multichip_eval_rollout():
    from distributedconvrl_pde_control_tpu.parallel.multichip import (
        ShardedFluidTrainer,
        ShardedTrainConfig,
    )

    mesh = make_dp_sp_mesh(8)
    cfg = _tiny_fluid_cfg()
    tcfg = ShardedTrainConfig(n_envs=4, capacity_per_dp=256, y0_pool_size=2)
    tr = ShardedFluidTrainer(cfg, mesh, tcfg)
    actor = tr.agent.init_state(jax.random.PRNGKey(1)).actor
    ev = tr.make_eval_fn(6, t_action_steps=2)
    recs = ev(actor, tr.eval_w0(4))
    energy = np.asarray(recs["energy"])
    active = np.asarray(recs["active"])
    assert energy.shape == (6, 4) and active.shape == (6, 4)
    assert np.isfinite(energy[active]).all()
    # all 4 eval envs start from the same canonical y0 -> identical energies
    assert np.allclose(energy[:, 0], energy[:, 1])


def test_multichip_temporal_and_memory_rows():
    """The sharded path supports the preset's temporal stacking + action
    memory observations (KSSetup.jl:209-228 semantics via
    Conv2DFeaturizer.from_dots)."""
    from distributedconvrl_pde_control_tpu.parallel.multichip import (
        ShardedFluidTrainer,
        ShardedTrainConfig,
    )

    mesh = make_dp_sp_mesh(8)
    cfg = _tiny_fluid_cfg(temporal_steps=2, memory_size=1)
    tcfg = ShardedTrainConfig(n_envs=4, batch_size=8, capacity_per_dp=512,
                              y0_pool_size=2)
    tr = ShardedFluidTrainer(cfg, mesh, tcfg)
    assert tr.featurizer.obs_dim == 9 * 2 + 1
    assert tr.agent.cfg.na_rows == 2
    state = tr.init(jax.random.PRNGKey(0))
    assert state.obs.shape == (4, 19, 16)
    step = tr.make_chunk_fn(2)
    s1, _ = step(state)
    assert np.isfinite(float(s1.mean_reward))


def test_multichip_featurize_matches_single_chip():
    """Sharded sensor readout + featurization == the single-chip
    Conv2DFeaturizer on the same field."""
    from distributedconvrl_pde_control_tpu.configs.fluid import build_fluid
    from distributedconvrl_pde_control_tpu.parallel.multichip import (
        ShardedFluidTrainer,
        ShardedTrainConfig,
    )

    mesh = make_dp_sp_mesh(8)
    cfg = _tiny_fluid_cfg()
    tcfg = ShardedTrainConfig(n_envs=4, capacity_per_dp=256, y0_pool_size=2)
    tr = ShardedFluidTrainer(cfg, mesh, tcfg)
    state = tr.init(jax.random.PRNGKey(0))

    setup = build_fluid(cfg)
    w = np.asarray(state.w)
    for b in range(tcfg.n_envs):
        want = np.asarray(setup.env.featurize(jnp.asarray(w[b]), None, None))
        got = np.asarray(state.obs)[b]
        assert np.allclose(got, want, atol=1e-5), np.abs(got - want).max()


def test_sharded_ri_matches_single_chip_real_path():
    """NSShardedSolverRI.step_real on 4 shards == NSSolver.step_real
    single-device with the same 2/3-mask scheme."""
    from distributedconvrl_pde_control_tpu.ops.navier_stokes import (
        NSSolver,
        initial_condition,
    )
    from distributedconvrl_pde_control_tpu.parallel.ns_sharded import NSShardedSolverRI

    mesh = sp_mesh(4)
    nx = ny = 32
    nu, dt, oversampling = 5e-4, 0.01, 4
    ops = make_sharded_ops(nx, ny)
    solver = NSShardedSolverRI(nu=nu, sp_axis="sp")

    rng = np.random.default_rng(7)
    omg = np.fft.ifft2(initial_condition(2, nx, ny, 1.0, 1.0, rng)).real.astype(np.float32)
    zero = np.zeros_like(omg)

    step = shard_map(
        lambda wb, fb, ob: solver.step_real(wb, fb, ob, dt, oversampling),
        mesh=mesh,
        in_specs=(P("sp", None), P("sp", None), jax.tree.map(lambda _: P(None, "sp"), ops)),
        out_specs=P("sp", None),
        check_vma=False,
    )
    got = np.asarray(jax.jit(step)(jnp.asarray(omg), jnp.asarray(zero), ops))

    # single-chip oracle: identical 2/3-truncated scheme via mask23 on a
    # dealias=False NSSolver rhs -> reuse the sharded ops arrays directly
    def rhs(wh):
        psih = wh * np.asarray(ops.inv_k2)
        u = np.fft.ifft2(1j * np.asarray(ops.ky) * psih).real
        v = np.fft.ifft2(-1j * np.asarray(ops.kx) * psih).real
        dwdx = np.fft.ifft2(1j * np.asarray(ops.kx) * wh).real
        dwdy = np.fft.ifft2(1j * np.asarray(ops.ky) * wh).real
        nonlin = np.fft.fft2(-u * dwdx - v * dwdy) * np.asarray(ops.mask23)
        return -nu * np.asarray(ops.k2) * wh + nonlin

    w = np.fft.fft2(omg)
    h = dt / oversampling
    for _ in range(oversampling):
        k1 = rhs(w)
        k2 = rhs(w + 0.5 * h * k1)
        k3 = rhs(w + 0.5 * h * k2)
        k4 = rhs(w + h * k3)
        w = w + h / 6 * (k1 + 2 * (k2 + k3) + k4)
    want = np.fft.ifft2(w).real

    assert np.allclose(got, want, atol=5e-3), np.abs(got - want).max()


def test_sharded_ifrk4_matches_single_chip_masked_oracle():
    """NSShardedSolverRI.step_real_if on 4 shards == a NumPy IF-RK4 oracle
    on the same 2/3-mask scheme (viscous exp factors exact)."""
    from distributedconvrl_pde_control_tpu.ops.navier_stokes import initial_condition
    from distributedconvrl_pde_control_tpu.parallel.ns_sharded import NSShardedSolverRI

    mesh = sp_mesh(4)
    nx = ny = 32
    nu, dt, oversampling = 5e-4, 0.01, 4
    ops = make_sharded_ops(nx, ny)
    solver = NSShardedSolverRI(nu=nu, sp_axis="sp")

    rng = np.random.default_rng(7)
    omg = np.fft.ifft2(initial_condition(2, nx, ny, 1.0, 1.0, rng)).real.astype(np.float32)
    zero = np.zeros_like(omg)

    step = shard_map(
        lambda wb, fb, ob: solver.step_real_if(wb, fb, ob, dt, oversampling),
        mesh=mesh,
        in_specs=(P("sp", None), P("sp", None), jax.tree.map(lambda _: P(None, "sp"), ops)),
        out_specs=P("sp", None),
        check_vma=False,
    )
    got = np.asarray(jax.jit(step)(jnp.asarray(omg), jnp.asarray(zero), ops))

    def adv(wh):
        psih = wh * np.asarray(ops.inv_k2)
        u = np.fft.ifft2(1j * np.asarray(ops.ky) * psih).real
        v = np.fft.ifft2(-1j * np.asarray(ops.kx) * psih).real
        dwdx = np.fft.ifft2(1j * np.asarray(ops.kx) * wh).real
        dwdy = np.fft.ifft2(1j * np.asarray(ops.ky) * wh).real
        return np.fft.fft2(-u * dwdx - v * dwdy) * np.asarray(ops.mask23)

    w = np.fft.fft2(omg)
    h = dt / oversampling
    e_half = np.exp(-nu * np.asarray(ops.k2) * (h / 2.0))
    e_full = e_half * e_half
    for _ in range(oversampling):
        k1 = adv(w)
        a = e_half * (w + 0.5 * h * k1)
        k2 = adv(a)
        b = e_half * w + 0.5 * h * k2
        k3 = adv(b)
        c = e_full * w + h * e_half * k3
        k4 = adv(c)
        w = e_full * w + h / 6.0 * (e_full * k1 + 2.0 * e_half * (k2 + k3) + k4)
    want = np.fft.ifft2(w).real
    assert np.allclose(got, want, atol=5e-3), np.abs(got - want).max()


def test_sharded_adaptive_matches_fine_fixed_step():
    """NSShardedSolverRI.step_real_adaptive (pmax'd acceptance norm) at a
    tight tolerance converges to the same state as the sharded fixed-step
    solver at fine substeps — validates the uniform-trip-count while_loop
    machinery across shards."""
    from distributedconvrl_pde_control_tpu.ops.navier_stokes import initial_condition
    from distributedconvrl_pde_control_tpu.parallel.ns_sharded import NSShardedSolverRI

    mesh = sp_mesh(4)
    nx = ny = 32
    nu, dt = 5e-4, 0.01
    ops = make_sharded_ops(nx, ny)
    solver = NSShardedSolverRI(nu=nu, sp_axis="sp")

    rng = np.random.default_rng(9)
    omg = np.fft.ifft2(initial_condition(2, nx, ny, 1.0, 1.0, rng)).real.astype(np.float32)
    zero = np.zeros_like(omg)
    specs = (P("sp", None), P("sp", None), jax.tree.map(lambda _: P(None, "sp"), ops))

    adap = shard_map(
        lambda wb, fb, ob: solver.step_real_adaptive(wb, fb, ob, dt,
                                                     rtol=1e-6, atol=1e-6),
        mesh=mesh, in_specs=specs, out_specs=P("sp", None), check_vma=False,
    )
    fixed = shard_map(
        lambda wb, fb, ob: solver.step_real(wb, fb, ob, dt, 32),
        mesh=mesh, in_specs=specs, out_specs=P("sp", None), check_vma=False,
    )
    got = np.asarray(jax.jit(adap)(jnp.asarray(omg), jnp.asarray(zero), ops))
    want = np.asarray(jax.jit(fixed)(jnp.asarray(omg), jnp.asarray(zero), ops))
    assert np.allclose(got, want, atol=1e-4), np.abs(got - want).max()


def test_multichip_stepper_dispatch():
    """The trainer honors the preset's stepper: adaptive -> sharded do_step2,
    stepper='ifrk4' -> IF-RK4 tier, default -> fixed-step RK4. One step of
    each must run and stay finite (the adaptive default is already covered
    by every _tiny_fluid_cfg test; this pins the other two + the dispatch)."""
    import dataclasses

    from distributedconvrl_pde_control_tpu.parallel.multichip import (
        ShardedFluidTrainer,
        ShardedTrainConfig,
    )

    mesh = make_dp_sp_mesh(8)
    tcfg = ShardedTrainConfig(n_envs=4, batch_size=8, capacity_per_dp=1024,
                              y0_pool_size=2)
    for over in (dict(adaptive=False),
                 dict(adaptive=False, stepper="ifrk4", fast_oversampling=2),
                 # the `_tp` tier: bf16 transform tiers through shard_map
                 # (on CPU both tiers are f32 — this pins the plumbing)
                 dict(adaptive=False, stepper="ifrk4", fast_oversampling=2,
                      fft_mode="matmul_hi", nl_fft_mode="matmul_fast")):
        cfg = _tiny_fluid_cfg(**over)
        tr = ShardedFluidTrainer(cfg, mesh, tcfg)
        state = tr.init(jax.random.PRNGKey(0))
        s1, _ = tr.make_chunk_fn(1)(state)
        assert np.isfinite(float(s1.mean_reward)), over


@pytest.mark.slow
def test_multichip_compiles_at_production_grid():
    """One DP x SP step of the FLUID_8_256 preset (dt widened so the
    oversampling property gives 1 substep) on the virtual mesh — validates
    shard layouts and memory at size, not physics."""
    import dataclasses

    from distributedconvrl_pde_control_tpu.configs.fluid import FLUID_8_256
    from distributedconvrl_pde_control_tpu.parallel.multichip import (
        ShardedFluidTrainer,
        ShardedTrainConfig,
    )

    mesh = make_dp_sp_mesh(8)
    # dt=4e-4 -> oversampling=floor(16*256*dt)=1 (keeps the CPU test fast)
    cfg = dataclasses.replace(FLUID_8_256, dt=4e-4)
    tcfg = ShardedTrainConfig(n_envs=2, batch_size=8, capacity_per_dp=2048,
                              y0_pool_size=1)
    tr = ShardedFluidTrainer(cfg, mesh, tcfg)
    assert cfg.oversampling == 1
    state = tr.init(jax.random.PRNGKey(0))
    step = tr.make_chunk_fn(1)
    s1, _ = step(state)
    assert np.isfinite(float(s1.mean_reward))


def test_multichip_keller_segel_trainer():
    """One chunk of the preset-driven sharded Keller-Segel trainer on a
    2x4 mesh: finite rewards, correct replay accounting, replicated params
    after dp-pmean learning, and a sharded eval rollout."""
    import dataclasses

    from distributedconvrl_pde_control_tpu.configs.keller_segel import (
        KELLER_SEGEL_10_16,
    )
    from distributedconvrl_pde_control_tpu.parallel.multichip import (
        ShardedTrainConfig,
    )
    from distributedconvrl_pde_control_tpu.parallel.multichip_keller_segel import (
        ShardedKellerSegelTrainer,
    )

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("dp", "sp"))
    cfg = dataclasses.replace(KELLER_SEGEL_10_16, te=0.06, oversampling=5)
    tcfg = ShardedTrainConfig(n_envs=4, batch_size=8, capacity_per_dp=1024,
                              y0_pool_size=2)
    tr = ShardedKellerSegelTrainer(cfg, mesh, tcfg)
    state = tr.init(jax.random.PRNGKey(0))
    step = tr.make_chunk_fn(2)
    s1, recs = step(state)
    assert np.isfinite(float(s1.mean_reward))
    n_act = tr.n_act
    assert int(np.asarray(s1.replay.size)[0]) == 2 * (tcfg.n_envs // 2) * n_act
    w_actor = s1.agent.actor[0]["w"]
    shards = [np.asarray(s.data) for s in w_actor.addressable_shards]
    for s in shards[1:]:
        assert np.array_equal(s, shards[0])
    # sharded eval: mean |u-1| of a perturbed init must be positive + finite
    ev = tr.make_eval_fn(3)(s1.agent.actor, tr.eval_w0())
    en = np.asarray(ev["energy"])
    assert en.shape == (3, tcfg.n_envs) and np.isfinite(en).all() and (en > 0).all()


def test_two_field_from_dots_matches_call():
    """TwoFieldFeaturizer.from_dots (the sharded path) == __call__ on the
    full field, including temporal stacking across two steps."""
    from distributedconvrl_pde_control_tpu.configs.keller_segel import (
        KELLER_SEGEL_10_16,
        build_keller_segel,
    )

    setup = build_keller_segel(KELLER_SEGEL_10_16)
    feat = setup.env.featurize
    rng = np.random.default_rng(0)
    y1 = jnp.asarray(1.0 + 0.1 * rng.standard_normal((2, 100)), jnp.float32)
    y2 = jnp.asarray(1.0 + 0.1 * rng.standard_normal((2, 100)), jnp.float32)
    a = jnp.asarray(rng.uniform(-1, 1, (1, feat.n_actuators)), jnp.float32)

    obs1 = feat(y1)
    dots1 = jnp.stack([feat.sensor_matrix @ y1[0], feat.sensor_matrix @ y1[1]])
    np.testing.assert_allclose(np.asarray(feat.from_dots(dots1)),
                               np.asarray(obs1), rtol=1e-6)
    obs2 = feat(y2, obs1, a)
    dots2 = jnp.stack([feat.sensor_matrix @ y2[0], feat.sensor_matrix @ y2[1]])
    np.testing.assert_allclose(np.asarray(feat.from_dots(dots2, obs1, a)),
                               np.asarray(obs2), rtol=1e-6)


def test_sharded_keller_segel_matches_single_chip():
    from distributedconvrl_pde_control_tpu.ops.keller_segel import KellerSegelSolver
    from distributedconvrl_pde_control_tpu.parallel.keller_segel_sharded import (
        KellerSegelShardedSolver,
    )

    mesh = sp_mesh(4)
    nx, lx = 100, 10.0
    single = KellerSegelSolver(nx=nx, lx=lx)
    sharded = KellerSegelShardedSolver(nx=nx, lx=lx, sp_axis="sp")

    rng = np.random.default_rng(0)
    y = np.ones((2, nx), np.float32)
    y[0] += 0.05 * rng.standard_normal(nx).astype(np.float32)
    f = 0.1 * rng.standard_normal(nx).astype(np.float32)

    want = np.asarray(single.step(jnp.asarray(y), jnp.asarray(f), 0.006, 10))

    step = shard_map(
        lambda yb, fb: sharded.step(yb, fb, 0.006, 10),
        mesh=mesh, in_specs=(P(None, "sp"), P("sp")), out_specs=P(None, "sp"),
        check_vma=False,
    )
    got = np.asarray(jax.jit(step)(jnp.asarray(y), jnp.asarray(f)))
    assert np.allclose(got, want, atol=1e-4), np.abs(got - want).max()


def test_tp_learn_step_matches_single_device():
    """The TP completeness path (parallel/tp.py): jit-partitioned
    learn_batch with the critic sharded over an 8-way 'tp' mesh reproduces
    the single-device update."""
    from distributedconvrl_pde_control_tpu.agents.ddpg import DDPGAgent, DDPGConfig
    from distributedconvrl_pde_control_tpu.parallel.tp import (
        critic_tp_spec,
        make_tp_learn_step,
        make_tp_mesh,
    )

    cfg = DDPGConfig(ns=4, na_rows=1, n_actuators=8, batch_size=16,
                     nna_scale=1.6, nna_scale_critic=8.0)  # hidden 160 % 8 == 0
    agent = DDPGAgent(cfg)
    astate = agent.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = tuple(jnp.asarray(x, jnp.float32) for x in (
        rng.standard_normal((4, 16)), rng.standard_normal((1, 16)),
        rng.standard_normal(16), np.zeros(16), rng.standard_normal((4, 16))))

    want = agent.learn_batch(astate, batch)

    mesh = make_tp_mesh(8)
    tp_step = make_tp_learn_step(agent, mesh)
    got = tp_step(astate, batch)

    for i in range(len(want.critic)):
        np.testing.assert_allclose(np.asarray(got.critic[i]["w"]),
                                   np.asarray(want.critic[i]["w"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.actor[0]["w"]),
                               np.asarray(want.actor[0]["w"]), atol=1e-5)
    np.testing.assert_allclose(float(got.critic_loss), float(want.critic_loss),
                               atol=1e-5)
    # the critic really is sharded over tp, not replicated
    specs = critic_tp_spec(astate.critic)
    sharded = tp_step(astate, batch, shard_inputs=True)
    w0 = sharded.critic[0]["w"]
    assert len({s.data.shape for s in w0.addressable_shards}) == 1
    assert w0.addressable_shards[0].data.shape[0] == w0.shape[0] // 8, specs[0]
