"""PPO agent variant.

Rebuild of `create_agent_ppo` (src/PDEagent.jl:462-512): Gaussian-policy
actor (64-64 relu trunk, tanh mu head + logsigma head), 64-64-1 critic,
clip ratio 0.2, 10 epochs x 32 microbatches per update, value coef 0.5,
entropy coef 0.0, max grad norm 0.5, ADAM. The reference ships this factory
unused by any experiment script (SURVEY.md §2.1); here it is a fully working
trainer so the capability is real: rollouts are collected from a vmapped
batch of envs inside one jitted scan, advantages come from GAE(lambda), and
the whole epoch/microbatch optimization runs on device.

The "convolutional" weight sharing carries over: for distributed-control
envs every actuator column is treated as an independent PPO environment
(the reference's PPOTrajectory `n_envs` axis, PDEagent.jl:505-510).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from distributedconvrl_pde_control_tpu.models.mlp import apply_chain, init_chain


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    ns: int
    na: int
    hidden: int = 64  # PDEagent.jl:477-487
    gamma: float = 0.99
    # Deliberate deviation: the reference passes its polyak constant p=0.995
    # as GAE lambda (PDEagent.jl:491), almost certainly an argument-threading
    # accident (lambda ~ 1 defeats the variance-reduction purpose of GAE and
    # the PPO factory ships unused). We default to the conventional 0.95;
    # pass gae_lambda=0.995 to reproduce the reference's literal value.
    gae_lambda: float = 0.95
    clip_range: float = 0.2
    n_epochs: int = 10
    n_microbatches: int = 32
    actor_loss_weight: float = 1.0
    critic_loss_weight: float = 0.5
    entropy_loss_weight: float = 0.0
    max_grad_norm: float = 0.5
    learning_rate: float = 1e-3
    rollout_len: int = 64  # the reference's update_freq / trajectory capacity
    act_limit: float = 1.0


@struct.dataclass
class PPOState:
    trunk: list
    mu: list
    logsig: list
    critic: list
    opt_state: optax.OptState
    update_count: jnp.ndarray


class PPOAgent:
    def __init__(self, cfg: PPOConfig):
        self.cfg = cfg
        self.opt = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.adam(cfg.learning_rate),
        )

    # --------------------------------------------------------------- params
    def init_state(self, key) -> PPOState:
        k1, k2, k3, k4 = jax.random.split(key, 4)
        cfg = self.cfg
        trunk = init_chain(k1, [cfg.ns, cfg.hidden, cfg.hidden])
        mu = init_chain(k2, [cfg.hidden, cfg.na])
        logsig = init_chain(k3, [cfg.hidden, cfg.na])
        critic = init_chain(k4, [cfg.ns, cfg.hidden, cfg.hidden, 1])
        params = {"trunk": trunk, "mu": mu, "logsig": logsig, "critic": critic}
        return PPOState(
            trunk=trunk, mu=mu, logsig=logsig, critic=critic,
            opt_state=self.opt.init(params),
            update_count=jnp.asarray(0, jnp.int32),
        )

    def _params(self, s: PPOState):
        return {"trunk": s.trunk, "mu": s.mu, "logsig": s.logsig, "critic": s.critic}

    # -------------------------------------------------------------- network
    def dist(self, params, obs):
        """obs (ns, B) -> (mu, sigma), each (na, B). Trunk relu-relu, tanh mu
        head (PDEagent.jl:476-482)."""
        h = apply_chain(params["trunk"], obs, jax.nn.relu, jax.nn.relu)
        mu = apply_chain(params["mu"], h, jax.nn.relu, jnp.tanh)
        logsig = jnp.clip(apply_chain(params["logsig"], h, jax.nn.relu, None), -10.0, 2.0)
        return mu, jnp.exp(logsig)

    def value(self, params, obs):
        return apply_chain(params["critic"], obs, jax.nn.relu, None)[0]

    def sample(self, params, obs, key):
        """Returns (raw_action, env_action, logp): the RAW sample goes into
        the batch (its logp must match what `update` recomputes), the clipped
        copy is what the environment executes."""
        mu, sig = self.dist(params, obs)
        eps = jax.random.normal(key, mu.shape)
        action = mu + sig * eps
        logp = self._logp(mu, sig, action)
        return action, jnp.clip(action, -self.cfg.act_limit, self.cfg.act_limit), logp

    @staticmethod
    def _logp(mu, sig, action):
        """Diagonal Gaussian log prob, summed over action dim -> (B,)."""
        z = (action - mu) / sig
        return jnp.sum(-0.5 * z**2 - jnp.log(sig) - 0.5 * jnp.log(2 * jnp.pi), axis=0)

    # ------------------------------------------------------------------ GAE
    def gae(self, rewards, values, dones, last_value):
        """rewards/values/dones: (T, B); returns (advantages, returns)."""
        cfg = self.cfg

        def back(carry, xs):
            adv_next, v_next = carry
            r, v, d = xs
            mask = 1.0 - d
            delta = r + cfg.gamma * v_next * mask - v
            adv = delta + cfg.gamma * cfg.gae_lambda * mask * adv_next
            return (adv, v), adv

        (_, _), advs = jax.lax.scan(
            back,
            (jnp.zeros_like(last_value), last_value),
            (rewards, values, dones),
            reverse=True,
        )
        return advs, advs + values

    # --------------------------------------------------------------- update
    def update(self, state: PPOState, batch, key) -> tuple:
        """batch: dict of flat arrays (N = T*B): obs (ns, N), actions (na, N),
        logp (N,), adv (N,), ret (N,). Runs epochs x microbatches."""
        cfg = self.cfg
        n = batch["logp"].shape[0]
        mb = n // cfg.n_microbatches
        params = self._params(state)

        def loss_fn(p, idx):
            obs = batch["obs"][:, idx]
            act = batch["actions"][:, idx]
            old_logp = batch["logp"][idx]
            adv = batch["adv"][idx]
            adv = (adv - adv.mean()) / (adv.std() + 1e-8)
            ret = batch["ret"][idx]
            mu, sig = self.dist(p, obs)
            logp = self._logp(mu, sig, act)
            ratio = jnp.exp(logp - old_logp)
            surr = jnp.minimum(
                ratio * adv,
                jnp.clip(ratio, 1 - cfg.clip_range, 1 + cfg.clip_range) * adv,
            )
            actor_loss = -jnp.mean(surr)
            v = self.value(p, obs)
            critic_loss = jnp.mean((ret - v) ** 2)
            entropy = jnp.mean(jnp.sum(jnp.log(sig) + 0.5 * jnp.log(2 * jnp.pi * jnp.e), axis=0))
            total = (
                cfg.actor_loss_weight * actor_loss
                + cfg.critic_loss_weight * critic_loss
                - cfg.entropy_loss_weight * entropy
            )
            return total, (actor_loss, critic_loss)

        def epoch(carry, k):
            params, opt_state = carry
            perm = jax.random.permutation(k, n)

            def micro(carry, i):
                params, opt_state = carry
                idx = jax.lax.dynamic_slice_in_dim(perm, i * mb, mb)
                (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, idx)
                updates, opt_state = self.opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), aux

            (params, opt_state), aux = jax.lax.scan(
                micro, (params, opt_state), jnp.arange(cfg.n_microbatches)
            )
            return (params, opt_state), aux

        (params, opt_state), aux = jax.lax.scan(
            epoch, (params, state.opt_state), jax.random.split(key, cfg.n_epochs)
        )
        new_state = PPOState(
            trunk=params["trunk"], mu=params["mu"], logsig=params["logsig"],
            critic=params["critic"], opt_state=opt_state,
            update_count=state.update_count + 1,
        )
        return new_state, aux


class PPOTrainer:
    """Rollout collection + update on a vmapped env batch.

    For distributed-control envs the actuator columns ARE the PPO env axis:
    obs (B_env, ns, n_act) flattens to (ns, B_env*n_act) and every actuator
    transition is an independent sample — the same weight-sharing trick as
    the DDPG path (SURVEY.md §0).
    """

    def __init__(self, env, agent: PPOAgent, n_envs: int,
                 random_init: Optional[Callable] = None, y0_pool=None,
                 eval_y0_pool=None):
        """`random_init` must be jit-traceable; for host-only IC generators
        (the fluid random-vortex case) pass `y0_pool` instead — a (P, ...)
        array sampled uniformly at every reset (as BatchedTrainer does).
        `eval_y0_pool` = HELD-OUT ICs for the deterministic selection eval
        (same semantics as BatchedTrainer: without it a pool-based trainer
        would score the eval on training-seen fields)."""
        self.env = env
        self.agent = agent
        self.n_envs = n_envs
        self.random_init = random_init
        self.y0_pool = None if y0_pool is None else jnp.asarray(y0_pool)
        self.eval_y0_pool = (None if eval_y0_pool is None
                             else jnp.asarray(eval_y0_pool))

    def _y0s(self, key):
        if self.y0_pool is not None:
            idx = jax.random.randint(key, (self.n_envs,), 0, self.y0_pool.shape[0])
            return self.y0_pool[idx]
        if self.random_init is not None:
            return jax.vmap(self.random_init)(jax.random.split(key, self.n_envs))
        y0 = jnp.asarray(self.env.y0)
        return jnp.broadcast_to(y0, (self.n_envs,) + y0.shape)

    def _eval_y0s(self, key):
        """Eval ICs: the held-out `eval_y0_pool` when provided, else the
        training IC source (for jit-traceable generators the eval keys are
        already disjoint from the training reset key chain) — mirrors
        BatchedTrainer._fresh_eval_y0s."""
        if self.eval_y0_pool is not None:
            idx = jax.random.randint(key, (self.n_envs,), 0,
                                     self.eval_y0_pool.shape[0])
            return self.eval_y0_pool[idx]
        return self._y0s(key)

    # ------------------------------------------------------------------ eval
    def eval_mean_reward(self, params, n_steps: int, key=None,
                         warmup_steps: int = 0) -> float:
        """Deterministic mean-policy evaluation over one vmapped episode
        batch: mean per-step reward over active steps. LONG-HORIZON
        SEMANTICS match BatchedTrainer.eval_mean_reward — past the training
        episode cap te/dt the rollout runs on a te-overridden env clone, so
        `n_steps=500` measures 500 REAL steps of stabilization (the
        reference's plot_heat quality metric, /root/reference/src/
        plotting.jl:4-169) instead of the te-capped transient. Blow-up
        termination stays active and masks post-termination steps.
        `warmup_steps > 0` = the OOD/delayed-actuation selection protocol
        (zero actions for the first K steps, only the controlled segment
        scored — batched.py eval_mean_reward docstring)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        if not hasattr(self, "_eval_fns"):
            self._eval_fns = {}
        cache_key = (n_steps, warmup_steps)
        run = self._eval_fns.get(cache_key)
        if run is None:
            run = self._make_eval_fn(n_steps, warmup_steps)
            self._eval_fns[cache_key] = run
        import numpy as np

        rs, actives = run(params, self._eval_y0s(key))
        rs, actives = np.asarray(rs), np.asarray(actives)
        return float(rs[actives].mean()) if actives.any() else float("nan")

    def _make_eval_fn(self, n_steps: int, warmup_steps: int = 0):
        env, agent = self.env, self.agent
        cfg = agent.cfg
        n_act = env.action_shape[1]
        B = self.n_envs
        needed_te = env.t0 + (n_steps + warmup_steps) * env.dt
        eval_env = (dataclasses.replace(env, te=float(needed_te) + env.dt)
                    if needed_te > env.te else env)

        @jax.jit
        def run(params, y0s):
            estates = jax.vmap(eval_env.reset)(y0s)

            if warmup_steps:
                zeros = jnp.zeros((B,) + env.action_shape)

                def wbody(carry, _):
                    estates = carry
                    active = jnp.logical_not(estates.done)
                    new_estates = jax.vmap(eval_env.step)(estates, zeros)
                    estates = jax.tree.map(
                        lambda n, o: jnp.where(
                            active.reshape((B,) + (1,) * (n.ndim - 1)), n, o),
                        new_estates, estates)
                    return estates, None

                estates, _ = jax.lax.scan(wbody, estates, None,
                                          length=warmup_steps)

            def body(carry, _):
                estates = carry
                obs = jnp.moveaxis(estates.obs, 0, 1).reshape(cfg.ns, B * n_act)
                mu, _ = agent.dist(params, obs)
                a = jnp.clip(mu, -cfg.act_limit, cfg.act_limit)
                actions = jnp.moveaxis(a.reshape(cfg.na, B, n_act), 1, 0)
                active = jnp.logical_not(estates.done)
                new_estates = jax.vmap(eval_env.step)(estates, actions)
                estates = jax.tree.map(
                    lambda n, o: jnp.where(
                        active.reshape((B,) + (1,) * (n.ndim - 1)), n, o),
                    new_estates, estates)
                # a blow-up step can carry a non-finite reward (fluid's
                # 'reward' guard fires ON the offending step); exclude it
                # from the mean like the DDPG eval does
                step_r = jnp.mean(new_estates.reward, -1)
                ok = jnp.logical_and(active, jnp.isfinite(step_r))
                return estates, (jnp.where(ok, step_r, 0.0), ok)

            _, (rs, actives) = jax.lax.scan(body, estates, None, length=n_steps)
            return rs, actives

        return run

    def make_train_iter(self):
        env, agent = self.env, self.agent
        cfg = agent.cfg
        n_act = env.action_shape[1]
        B = self.n_envs * n_act

        def collect_and_update(pstate: PPOState, key):
            k_init, k_roll, k_up = jax.random.split(key, 3)
            estates = jax.vmap(env.reset)(self._y0s(k_init))
            params = agent._params(pstate)

            def step(carry, k):
                estates = carry
                obs = jnp.moveaxis(estates.obs, 0, 1).reshape(cfg.ns, B)
                action_raw, action_env, logp = agent.sample(params, obs, k)
                value = agent.value(params, obs)
                actions = jnp.moveaxis(action_env.reshape(cfg.na, self.n_envs, n_act), 1, 0)
                new_estates = jax.vmap(env.step)(estates, actions)
                rewards = new_estates.reward.reshape(B)
                dones = jnp.repeat(new_estates.done.astype(jnp.float32), n_act)
                # auto-reset finished envs
                fresh = jax.vmap(env.reset)(self._y0s(k))
                pick = lambda f, n_: jnp.where(
                    new_estates.done.reshape((self.n_envs,) + (1,) * (n_.ndim - 1)), f, n_
                )
                estates = jax.tree.map(pick, fresh, new_estates)
                out = {"obs": obs, "actions": action_raw, "logp": logp,
                       "rewards": rewards, "values": value, "dones": dones}
                return estates, out

            estates, traj = jax.lax.scan(
                step, estates, jax.random.split(k_roll, cfg.rollout_len)
            )
            last_obs = jnp.moveaxis(estates.obs, 0, 1).reshape(cfg.ns, B)
            last_value = agent.value(params, last_obs)
            adv, ret = agent.gae(traj["rewards"], traj["values"], traj["dones"], last_value)

            # flatten (T, B) sample axes consistently: (ns, T, B)->(ns, T*B)
            batch = {
                "obs": jnp.moveaxis(traj["obs"], 1, 0).reshape(cfg.ns, -1),
                "actions": jnp.moveaxis(traj["actions"], 1, 0).reshape(cfg.na, -1),
                "logp": traj["logp"].reshape(-1),
                "adv": adv.reshape(-1),
                "ret": ret.reshape(-1),
            }
            pstate, aux = agent.update(pstate, batch, k_up)
            return pstate, jnp.mean(traj["rewards"])

        return jax.jit(collect_and_update)


def ppo_policy(agent: PPOAgent, pstate_or_params, deterministic: bool = True):
    """Evaluation policy from PPO params: the clipped mean action (the
    standard deterministic PPO eval). Accepts a PPOState or a params dict."""
    params = (pstate_or_params if isinstance(pstate_or_params, dict)
              else agent._params(pstate_or_params))

    def policy_fn(obs, key):
        mu, sig = agent.dist(params, obs)
        a = mu if deterministic else mu + sig * jax.random.normal(key, mu.shape)
        return jnp.clip(a, -agent.cfg.act_limit, agent.cfg.act_limit)

    return policy_fn


def train_ppo(trainer: PPOTrainer, iters: int, key=None, verbose: bool = True,
              eval_every: int = 0, eval_steps: int = 50,
              eval_warmup_steps: int = 0):
    """PPO training driver: `iters` collect+update iterations with host-side
    reward accounting and best-params snapshotting (the PPO analogue of the
    PDEhook best-actor tracking; the reference ships create_agent_ppo with
    no driver at all, PDEagent.jl:462-512).

    `eval_every > 0` runs a DETERMINISTIC mean-policy evaluation every N
    iterations and selects best params on it — with `eval_steps` past te/dt
    that is the long-horizon stabilization metric (the reference's plot_heat
    protocol, plotting.jl:4-169). The default (eval_every=0) keeps the
    legacy selection on the training iteration's mean rollout reward, which
    is a noisy exploration-contaminated TRANSIENT metric measured to rank
    configs BACKWARDS on the long horizon (RESULTS.md `--ppo-ref` row:
    transient -0.0090 beat -0.0059 at te=200) — prefer eval selection for
    anything shipped, exactly like the DDPG batched/sharded drivers.

    Returns (PPOState, dict with rewards/best_params/best_reward/best_iter/
    evals/selection).
    """
    import numpy as np

    agent = trainer.agent
    key = key if key is not None else jax.random.PRNGKey(0)
    key, k0 = jax.random.split(key)
    pstate = agent.init_state(k0)
    it = trainer.make_train_iter()
    rewards = []
    evals = []
    best = {"reward": -np.inf, "iter": 0, "params": None}
    for i in range(iters):
        key, k = jax.random.split(key)
        pstate, mean_r = it(pstate, k)
        r = float(mean_r)
        rewards.append(r)
        if eval_every:
            if (i + 1) % eval_every == 0 or i + 1 == iters:
                r_eval = trainer.eval_mean_reward(agent._params(pstate),
                                                  eval_steps,
                                                  warmup_steps=eval_warmup_steps)
                evals.append((i + 1, r_eval))
                if r_eval > best["reward"]:
                    best.update(reward=r_eval, iter=i + 1,
                                params=jax.tree.map(np.asarray,
                                                    agent._params(pstate)))
        elif r > best["reward"]:
            best.update(reward=r, iter=i + 1,
                        params=jax.tree.map(np.asarray, agent._params(pstate)))
        if verbose and (i + 1) % max(1, iters // 10) == 0:
            tail = (f" eval {evals[-1][1]:.4f}" if evals else "")
            print(f"[ppo] iter {i + 1}/{iters} mean step reward {r:.4f} "
                  f"(best {best['reward']:.4f} @ {best['iter']}){tail}")
    return pstate, {"rewards": np.asarray(rewards), "best_params": best["params"],
                    "best_reward": best["reward"], "best_iter": best["iter"],
                    "evals": evals,
                    "selection": "eval" if eval_every else "rollout"}
