"""Measured host-side baseline proxy for the Julia reference's KS22 loop.

The reference publishes no throughput numbers and Julia is not installable
in this environment (zero egress), so this script measures a faithful
SINGLE-ENV host loop with the reference's exact per-step work profile
(scripts/KS/KS22/KS22.jl + scripts/KS/setup/KSSetup.jl), implemented in
NumPy on pocketfft (the same performance class as Julia+FFTW):

  per env step:
    * 30 CNAB2 substeps on the 192-point grid, 2 real-FFT transforms each
      (KSSetup.jl:130-160, oversampling=30 at :47)
    * shared-MLP policy forward over the 8 actuator columns
      (actor 1 -> 6 -> 1 tanh; PDEagent.jl:14-56 with nna_scale=0.6)
    * Gaussian-sensor featurize + per-actuator reward (KSSetup.jl:162-229)
    * 8 per-actuator replay pushes (PDEagent.jl:254-289)
    * 20 DDPG updates with batch 3 (KSSetup.jl:66-71): target bootstrap,
      critic MSE grad, actor grad through the updated critic, ADAM on both,
      polyak target averaging (PDEagent.jl:342-418) — hand-written backprop
      (a LOWER-overhead bound on Zygote's per-call reverse-mode AD, so the
      resulting baseline is conservative: the real Julia loop is slower)

Emits one JSON line: {"metric": "baseline proxy (single-env KS22 host loop)",
"env_steps_per_sec": ...}. `bench.py` pins BASELINE_STEPS_PER_SEC to the
value measured by this script (see BASELINE.md).
"""

from __future__ import annotations

import json
import time

import numpy as np

NX, LX, DT, OVERSAMPLING = 192, 22.0, 0.1, 30
N_ACT = 8
MAX_VALUE = 20.0
BATCH, UPDATE_LOOPS = 3, 20
GAMMA, POLYAK = 0.99, 0.995
LR_A, LR_C = 5e-4, 1e-3


# ---------------------------------------------------------------- solver
def make_cnab2():
    """CNAB2 operators (KSSetup.jl:115-135) on the rfft half-spectrum."""
    k = 2.0 * np.pi * np.fft.rfftfreq(NX, d=LX / NX)
    lin = k**2 - k**4
    dt_os = DT / OVERSAMPLING
    a_inv = 1.0 / (1.0 - dt_os / 2.0 * lin)
    b_op = 1.0 + dt_os / 2.0 * lin
    g = -0.5j * k
    return a_inv, b_op, g, dt_os


def ks_step(y, forcing, ops):
    a_inv, b_op, g, dt_os = ops
    uh = np.fft.rfft(y)
    n1 = g * np.fft.rfft(y * y)
    fh = np.fft.rfft(forcing) * dt_os
    for _ in range(OVERSAMPLING):
        u = np.fft.irfft(uh, NX)
        n2 = g * np.fft.rfft(u * u)
        uh = a_inv * (b_op * uh + 1.5 * dt_os * n2 - 0.5 * dt_os * n1 + fh)
        n1 = n2
    return np.fft.irfft(uh, NX)


# ---------------------------------------------------------------- networks
def init_mlp(rng, sizes):
    layers = []
    for nin, nout in zip(sizes[:-1], sizes[1:]):
        lim = np.sqrt(6.0 / (nin + nout))
        layers.append([rng.uniform(-lim, lim, (nout, nin)), np.zeros((nout, 1))])
    return layers


def actor_fwd(p, s):
    h = np.maximum(p[0][0] @ s + p[0][1], 0.0)
    return np.tanh(p[1][0] @ h + p[1][1]), h


def critic_fwd(p, x):
    h = np.maximum(p[0][0] @ x + p[0][1], 0.0)
    return p[1][0] @ h + p[1][1], h


class Adam:
    def __init__(self, params, lr):
        self.lr, self.t = lr, 0
        self.m = [[np.zeros_like(w) for w in l] for l in params]
        self.v = [[np.zeros_like(w) for w in l] for l in params]

    def update(self, params, grads):
        self.t += 1
        b1, b2, eps = 0.9, 0.999, 1e-8
        for li, (pl, gl) in enumerate(zip(params, grads)):
            for wi, (w, g) in enumerate(zip(pl, gl)):
                m = self.m[li][wi] = b1 * self.m[li][wi] + (1 - b1) * g
                v = self.v[li][wi] = b2 * self.v[li][wi] + (1 - b2) * g * g
                mh = m / (1 - b1**self.t)
                vh = v / (1 - b2**self.t)
                w -= self.lr * mh / (np.sqrt(vh) + eps)


def ddpg_update(nets, opts, batch):
    """Exact math of PDEagent.jl:363-418, hand-rolled reverse mode."""
    actor, critic, t_actor, t_critic = nets
    opt_a, opt_c = opts
    s, a, r, t, sn = batch
    B = s.shape[1]

    an, _ = actor_fwd(t_actor, sn)
    qn, _ = critic_fwd(t_critic, np.concatenate([sn, an], axis=0))
    q_target = r + GAMMA * (1.0 - t) * qn.ravel()

    # critic grad: L = mean((qt - q)^2)
    x = np.concatenate([s, a], axis=0)
    q, h = critic_fwd(critic, x)
    dq = 2.0 * (q.ravel() - q_target).reshape(1, B) / B
    gW2 = dq @ h.T
    gb2 = dq.sum(axis=1, keepdims=True)
    dh = (critic[1][0].T @ dq) * (h > 0)
    gW1 = dh @ x.T
    gb1 = dh.sum(axis=1, keepdims=True)
    opt_c.update(critic, [[gW1, gb1], [gW2, gb2]])

    # actor grad through the UPDATED critic: L = -mean(C([s; A(s)]))
    a_pi, ha = actor_fwd(actor, s)
    x2 = np.concatenate([s, a_pi], axis=0)
    q2, h2 = critic_fwd(critic, x2)
    dq = -np.ones((1, B)) / B
    dh2 = (critic[1][0].T @ dq) * (h2 > 0)
    dx = critic[0][0].T @ dh2
    da = dx[s.shape[0]:]
    dz = da * (1.0 - a_pi**2)
    gW2a = dz @ ha.T
    gb2a = dz.sum(axis=1, keepdims=True)
    dha = (actor[1][0].T @ dz) * (ha > 0)
    gW1a = dha @ s.T
    gb1a = dha.sum(axis=1, keepdims=True)
    opt_a.update(actor, [[gW1a, gb1a], [gW2a, gb2a]])

    # polyak
    for tgt, src in ((t_actor, actor), (t_critic, critic)):
        for tl, sl in zip(tgt, src):
            for tw, sw in zip(tl, sl):
                tw *= POLYAK
                tw += (1 - POLYAK) * sw


# ---------------------------------------------------------------- kernels
def gaussians(sigma, norm_mode):
    dx = LX / NX
    extra = 50
    t = np.arange(1 - extra, NX + extra + 1) * dx
    pos = np.arange(1, NX + 1, NX // N_ACT)
    ker = np.zeros((N_ACT, NX))
    for i, p0 in enumerate(pos):
        p = np.exp(-((t - p0 * dx) ** 2) / 2.0 * sigma**2) / np.sqrt(2 * np.pi * sigma)
        p = p / p.sum() if norm_mode == 1 else p / p.max()
        core = p[extra: extra + NX].copy()
        core[NX - extra:] += p[:extra]
        core[: len(p[extra + NX:])] += p[extra + NX:]
        ker[i] = core
    return ker


def run(n_steps: int, seed: int = 0) -> float:
    rng = np.random.default_rng(seed)
    ops = make_cnab2()
    sensors = gaussians(0.7, 1)
    actuators = gaussians(0.7, 2)

    actor = init_mlp(rng, [1, 6, 1])
    critic = init_mlp(rng, [2, 140, 1])
    t_actor = [[w.copy() for w in l] for l in actor]
    t_critic = [[w.copy() for w in l] for l in critic]
    nets = (actor, critic, t_actor, t_critic)
    opts = (Adam(actor, LR_A), Adam(critic, LR_C))

    cap = 150_000
    rb = {k: np.zeros((cap, d)) for k, d in
          (("s", 1), ("a", 1), ("r", 1), ("t", 1), ("sn", 1))}
    ptr = size = 0

    x = np.arange(1, NX + 1) * (LX / NX)
    y = np.sin(2 * np.pi * x / LX) * 30 / np.sqrt(2)
    obs = (sensors @ y / MAX_VALUE).reshape(1, N_ACT)
    prev_action = np.zeros((1, N_ACT))
    act_noise = 1.2

    t0 = time.perf_counter()
    for step in range(n_steps):
        # policy forward + exploration noise + clamp (PDEagent.jl:175-209)
        a, _ = actor_fwd(actor, obs)
        a = np.clip(a + rng.standard_normal(a.shape) * act_noise, -1.0, 1.0)
        # learn gate: 20 sampled updates (PDEagent.jl:342-361)
        if size > 10 * N_ACT:
            for _ in range(UPDATE_LOOPS):
                idx = rng.integers(0, size - N_ACT, BATCH)
                batch = (rb["s"][idx].T, rb["a"][idx].T, rb["r"][idx].ravel(),
                         rb["t"][idx].ravel(), rb["sn"][idx].T)
                ddpg_update(nets, opts, batch)
        # env step (PDEenv.jl:195-241 + KSSetup.jl:130-245)
        forcing = (a[0] * 2.0) @ actuators  # agent_power=2 smear
        y = ks_step(y, forcing, ops)
        dots = sensors @ y
        reward = (-np.abs(dots) ** 1.3 / (3 * MAX_VALUE)
                  - 0.002 * a[0] ** 2 - 0.002 * (a[0] - prev_action[0]) ** 2)
        new_obs = (dots / MAX_VALUE).reshape(1, N_ACT)
        # 8 per-actuator replay pushes (PDEagent.jl:254-289)
        for j in range(N_ACT):
            k = (ptr + j) % cap
            rb["s"][k, 0] = obs[0, j]
            rb["a"][k, 0] = a[0, j]
            rb["r"][k, 0] = reward[j]
            rb["t"][k, 0] = 0.0
            rb["sn"][k, 0] = new_obs[0, j]
        ptr = (ptr + N_ACT) % cap
        size = min(size + N_ACT, cap)
        obs, prev_action = new_obs, a
    return n_steps / (time.perf_counter() - t0)


def run_solver_only(n_steps: int) -> float:
    """Physics-only rate (no policy/learning): the generous upper bound on
    the reference loop — as if Julia's 20 Zygote updates per step were free."""
    ops = make_cnab2()
    x = np.arange(1, NX + 1) * (LX / NX)
    y = np.sin(2 * np.pi * x / LX)
    f = np.zeros(NX)
    for _ in range(50):
        y = ks_step(y, f, ops)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        y = ks_step(y, f, ops)
    return n_steps / (time.perf_counter() - t0)


def main():
    run(100)  # warmup (numpy dispatch, allocator)
    rate = max(run(1000, seed=s) for s in range(3))
    solver_rate = max(run_solver_only(1000) for _ in range(3))
    print(json.dumps({
        "metric": "baseline proxy (single-env KS22 host loop, NumPy/pocketfft)",
        "env_steps_per_sec": round(rate, 1),
        "solver_only_env_steps_per_sec": round(solver_rate, 1),
        "note": "full loop = solver + policy + 20 DDPG updates/step "
                "(hand-written backprop, a lower-overhead bound on Zygote); "
                "bench.py pins its baseline to the GENEROUS solver-only "
                "rate — see BASELINE.md",
    }))


if __name__ == "__main__":
    main()
