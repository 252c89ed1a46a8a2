"""Crash-proofing of the unattended driver artifacts (round-2 verdict #1).

The round-2 driver bench died with a transient axon FAILED_PRECONDITION
(BENCH_r02.json rc=1) while an identical re-run succeeded. These tests pin
the retry wrapper's semantics and the end-to-end guarantee: `python bench.py`
emits exactly ONE parseable JSON line (with an `error` field if every attempt
fails) and exits 0, even under induced first-attempt failures.
"""

import json
import os
import subprocess
import sys

import pytest

from distributedconvrl_pde_control_tpu.utils.resilience import (
    run_with_backend_retry,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _no_reset():
    pass


def _no_sleep(_s):
    pass


def test_retry_succeeds_after_transient_failures():
    calls = {"n": 0}
    resets = {"n": 0}
    sleeps = []

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("FAILED_PRECONDITION: wedged")
        return 42

    def reset():
        resets["n"] += 1

    out = run_with_backend_retry(
        flaky, attempts=3, backoff_s=2.0, sleep=sleeps.append, reset=reset
    )
    assert out == 42
    assert calls["n"] == 3
    # reset + linear backoff between attempts, none after success
    assert resets["n"] == 2
    assert sleeps == [2.0, 4.0]


def test_retry_reraises_after_exhaustion():
    def always_fails():
        raise ValueError("permanent")

    with pytest.raises(ValueError, match="permanent"):
        run_with_backend_retry(
            always_fails, attempts=2, backoff_s=0.0, sleep=_no_sleep, reset=_no_reset
        )


def test_retry_does_not_swallow_keyboard_interrupt():
    calls = {"n": 0}

    def interrupted():
        calls["n"] += 1
        raise KeyboardInterrupt

    with pytest.raises(KeyboardInterrupt):
        run_with_backend_retry(
            interrupted, attempts=3, backoff_s=0.0, sleep=_no_sleep, reset=_no_reset
        )
    assert calls["n"] == 1  # no retry on user interrupt


def test_first_attempt_must_run():
    with pytest.raises(ValueError):
        run_with_backend_retry(lambda: 1, attempts=0)


def _run_bench(n_failures: int) -> dict:
    env = dict(os.environ)
    env.update(
        BENCH_SIMULATE_FAILURES=str(n_failures),
        BENCH_RETRY_BACKOFF_S="0.01",
        JAX_PLATFORMS="cpu",
        # keep the test fast even when the host's axon tunnel is WEDGED:
        # the between-attempt backend reset re-queries jax.devices(), which
        # can park in a C-level gRPC wait that no SIGALRM can interrupt —
        # the daemon-thread hard deadline is what guarantees the JSON line
        BENCH_WATCHDOG_S="30",
        BENCH_DEADLINE_S="90",
    )
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected exactly one stdout line, got: {lines}"
    return json.loads(lines[0])


def test_bench_emits_error_json_when_all_attempts_fail():
    # 3 simulated failures exhaust the 3 attempts before any device work:
    # the one artifact the driver captures unattended must never be a
    # traceback (round-2 verdict, Missing #1).
    out = _run_bench(n_failures=3)
    assert out["metric"] == "env steps/sec (batched KS rollout+train)"
    assert out["value"] == 0.0
    assert out["vs_baseline"] == 0.0
    # healthy host: the simulated JaxRuntimeError surfaces after 3 attempts;
    # wedged-tunnel host: the between-attempt backend reset blocks in a
    # C-level wait and the hard deadline emits the TimeoutError line instead
    assert ("FAILED_PRECONDITION" in out["error"]
            or "hard deadline" in out["error"])


def test_watchdog_converts_hang_into_retryable_failure():
    """A HANGING attempt (wedged tunnel blocking in a syscall) must be cut
    by the SIGALRM watchdog and become an ordinary retryable failure — the
    r03 observed mode where jax.devices() blocked >5 min raising nothing."""
    import time as _time

    calls = []

    def hang_once_then_succeed():
        calls.append(1)
        if len(calls) == 1:
            _time.sleep(30)  # "hang" far past the watchdog
        return "ok"

    out = run_with_backend_retry(
        hang_once_then_succeed, attempts=2, backoff_s=0.0,
        sleep=lambda s: None, reset=lambda: None, watchdog_s=0.5)
    assert out == "ok"
    assert len(calls) == 2


def test_watchdog_bounds_a_hanging_backend_reset():
    """The between-attempt reset re-queries jax.devices(), which a wedged
    tunnel can block exactly like an attempt (observed r03: bench.py hung in
    reset_backend between simulated failures, not in run_once). A hanging
    reset must be cut by the watchdog and treated as best-effort."""
    import time as _time

    calls = []

    def fail_once_then_succeed():
        calls.append(1)
        if len(calls) == 1:
            raise RuntimeError("FAILED_PRECONDITION: transient")
        return "ok"

    def hanging_reset():
        _time.sleep(30)

    out = run_with_backend_retry(
        fail_once_then_succeed, attempts=2, backoff_s=0.0,
        sleep=lambda s: None, reset=hanging_reset, watchdog_s=0.5)
    assert out == "ok"
    assert len(calls) == 2


def test_watchdog_timeout_exhausts_attempts_with_timeouterror():
    def always_hangs():
        import time as _time

        _time.sleep(30)

    with pytest.raises(TimeoutError):
        run_with_backend_retry(always_hangs, attempts=2, backoff_s=0.0,
                               sleep=lambda s: None, reset=lambda: None,
                               watchdog_s=0.3)
