"""Benchmark: batched KS rollout+train throughput on one chip.

Measures the fused training configuration (BASELINE.json config "Batched 1D
KS: 256 vmapped envs, fused on-device rollout + gradient update"): per env
step this advances the full KS22 physics on the reference's 192-point grid
(via the validated ETDRK4 throughput stepper — the `KS22_tp` tier; the
reference's CNAB2 does the same physics in 30 substeps), the shared-policy
forward over all 16384*8 actuator columns, exploration noise, 131k replay
pushes, and one DDPG gradient update (batch 4096) — all inside a single
jitted scan.

Baseline: the reference publishes no numbers (BASELINE.md); its north-star
target is ">= 50x per-chip batched-env throughput vs the Julia reference".
The reference rate is MEASURED by `baseline_proxy.py` (a faithful NumPy/
pocketfft single-env KS22 host loop with the reference's exact per-step
work): 1,592 env steps/s solver-only, 189 env steps/s for the full loop
with its 20 batch-3 DDPG updates per step (this host's single-core Xeon;
see BASELINE.md for the repeat spread and re-pinning rule). `vs_baseline`
is reported against the GENEROUS bound 50 * 1592 = 79,600 env steps/s
(i.e. as if the reference's learner were free); vs_baseline >= 1.0 means
the north-star target is met, and the ratio against the full measured loop
is ~8x higher still.
"""

import json
import os
import sys
import time

import jax

# rbg PRNG + the persistent compilation cache keep (re)compiles tractable on
# the axon TPU runtime, whose remote compiler is slow on large programs and
# pathological on the counter-based threefry expansion.
jax.config.update("jax_default_prng_impl", "rbg")
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N_ENVS = 16384
CHUNK = 50
TIMED_ROUNDS = 5
# 50x the solver-only reference-loop rate measured by baseline_proxy.py
# (1,592 env steps/s — max of repeated runs on the round-3 host; full loop
# with learning: 189/s). Re-pin when the host changes (BASELINE.md).
# r05 host check: the round-5 single-core host measures 1,385/s idle
# (dropping to ~900-990/s under concurrent load), so keeping the HIGHER
# r03 pin keeps vs_baseline conservative and historical captures
# comparable.
BASELINE_STEPS_PER_SEC = 50.0 * 1592.0


METRIC = "env steps/sec (batched KS rollout+train)"

# Testing hook: BENCH_SIMULATE_FAILURES=N makes the first N attempts raise a
# JaxRuntimeError before any device work, to exercise the retry path end to
# end (tests/test_graft_entry.py and the round-2 verdict's done-criterion).
_sim_failures = int(os.environ.get("BENCH_SIMULATE_FAILURES", "0"))


def run_once():
    """Build, warm up, and measure — self-contained so a backend reset
    between attempts invalidates nothing this attempt reuses."""
    global _sim_failures
    if _sim_failures > 0:
        _sim_failures -= 1
        raise jax.errors.JaxRuntimeError(
            "FAILED_PRECONDITION: simulated transient TPU failure "
            "(BENCH_SIMULATE_FAILURES)"
        )

    import dataclasses

    from distributedconvrl_pde_control_tpu.configs import KS22, build_ks
    from distributedconvrl_pde_control_tpu.configs.ks import ks_random_init
    from distributedconvrl_pde_control_tpu.train.batched import (
        BatchedTrainer,
        BatchedTrainerConfig,
    )

    # throughput configuration (PERFORMANCE.md): matmul_hi DFTs (3-pass
    # bf16, 2.6e-5 rel/step) + the ETDRK4 stepper (exact linear part, ONE
    # step per env step at CNAB2@30-substep accuracy on attractor states;
    # policies transfer across integrators — cross-eval verified) + 1-pass
    # bf16 NONLINEAR transforms (error enters scaled by the O(h)
    # phi-weights: 1.8e-4/step, 1.28x; the `_tp`-trained policy passes the
    # standard-env gate at 0.58% suppression — RESULTS.md) + the spectral
    # carry (r04: the half-spectrum is carried across env steps and the
    # forcing spectrum comes from pre-transformed actuator kernels, so 2 of
    # the 3 boundary transforms per env step vanish; strictly MORE accurate
    # — it removes the per-step rfft∘irfft round-trip — +7.6% measured,
    # PERFORMANCE.md) + spectral FEATURIZE (r05: featurize/reward/blow-up
    # guard consume the carry via exact Parseval contractions, deleting the
    # LAST full-tier synthesis transform; same-process A/B 36.15 -> 38.77M,
    # +7.2%; gate: sf-tier-trained lh artifacts at 0.78%/0.24% on the
    # standard env, RESULTS.md). This is the CLI `KS22_tp` tier plus the
    # trainer-only sf knob (--config-overrides '{"spectral_featurize":
    # true}'; eval/plot paths strip it to record real fields). The fidelity
    # presets keep CNAB2 at f32/HIGHEST with the real carry.
    setup = build_ks(dataclasses.replace(KS22, fft_mode="matmul_hi",
                                         stepper="etdrk4",
                                         nl_fft_mode="matmul_fast",
                                         spectral_carry=True,
                                         spectral_featurize=True))
    trainer = BatchedTrainer(
        setup.env,
        setup.agent,
        BatchedTrainerConfig(n_envs=N_ENVS, batch_size=4096, update_loops=1),
        random_init=ks_random_init(KS22),
    )
    ts = trainer.init(jax.random.PRNGKey(0))
    chunk_fn = trainer.make_chunk_fn(CHUNK)

    # compile + warmup
    ts, recs = chunk_fn(ts)
    jax.block_until_ready(recs)

    # Pipelined steady-state measurement: queue TIMED_ROUNDS chunks
    # back-to-back and synchronize once, exactly how train_batched executes
    # (it defers record reads by one chunk so host accounting overlaps
    # device compute). Synchronizing after EVERY chunk instead serializes
    # the ~20 ms axon-tunnel RPC with the compute and understates the
    # training rate by ~33% (PERFORMANCE.md round 3).
    best_rate = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(TIMED_ROUNDS):
            ts, recs = chunk_fn(ts)
        jax.block_until_ready(recs)
        dt = time.perf_counter() - t0
        best_rate = max(best_rate, TIMED_ROUNDS * CHUNK * N_ENVS / dt)
    return best_rate


def main():
    """Crash-proof driver entry: the round-2 driver capture died with a
    transient axon FAILED_PRECONDITION at the warmup chunk (BENCH_r02.json
    rc=1) while an identical re-run did 23.5M steps/s. Retry with backend
    re-init; if every attempt fails, still emit ONE parseable JSON line with
    an `error` field instead of a traceback."""
    from distributedconvrl_pde_control_tpu.utils.resilience import (
        arm_hard_deadline,
        run_with_backend_retry,
    )

    backoff_s = float(os.environ.get("BENCH_RETRY_BACKOFF_S", "10.0"))
    # per-attempt hang watchdog: a wedged tunnel can BLOCK jax.devices()
    # for many minutes (observed r03) — bound each attempt so the fallback
    # JSON line is still emitted. Generous default: a cold compile of the
    # bench program takes minutes on the axon remote compiler.
    watchdog_s = float(os.environ.get("BENCH_WATCHDOG_S", "900"))
    # ... and the SIGALRM alarm cannot interrupt a hang parked inside a C
    # call (handlers run between bytecodes), so a daemon-thread HARD
    # deadline guarantees the one-line JSON no matter where the process is
    # stuck. Budget: 3 watchdog-bounded attempts + resets + backoff.
    deadline_s = float(os.environ.get("BENCH_DEADLINE_S", str(3 * watchdog_s + 600)))
    deadline = arm_hard_deadline(deadline_s, lambda: print(json.dumps({
        "metric": METRIC,
        "value": 0.0,
        "unit": "env_steps/s",
        "vs_baseline": 0.0,
        "error": f"TimeoutError: bench exceeded the {deadline_s:.0f}s hard "
                 "deadline (wedged backend/tunnel blocked in a C call)",
    })))
    try:
        best_rate = run_with_backend_retry(run_once, attempts=3, backoff_s=backoff_s,
                                           watchdog_s=watchdog_s)
    except Exception as e:
        deadline.cancel()
        print(json.dumps({
            "metric": METRIC,
            "value": 0.0,
            "unit": "env_steps/s",
            "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}"[:500],
        }))
        sys.exit(0)

    deadline.cancel()
    print(json.dumps({
        "metric": METRIC,
        "value": round(best_rate, 1),
        "unit": "env_steps/s",
        "vs_baseline": round(best_rate / BASELINE_STEPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
