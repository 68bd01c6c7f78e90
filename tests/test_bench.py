"""bench.py phase-guard / subprocess-isolation machinery (host-only logic;
no device touched — the guarded fns here are plain Python)."""

import json
import os
import sys

import pytest


@pytest.fixture()
def bench(monkeypatch):
    monkeypatch.syspath_prepend(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import bench as bench_mod

    # isolate the module-global poison latch per test
    monkeypatch.setattr(bench_mod, "_client_poisoned", False)
    return bench_mod


def test_guard_retries_transient(bench, capsys):
    """A relay-signature fault gets exactly one retry, which can recover."""
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("TPU worker process crashed or restarted")
        return 42.0

    assert bench._guard("flaky", flaky, None) == 42.0
    assert calls["n"] == 2
    assert not bench._client_poisoned


def test_guard_no_retry_deterministic(bench, capsys):
    """A non-relay failure reproduces deterministically: fall straight
    through to the default instead of doubling the wasted wall-clock
    (ADVICE r3), and do NOT latch the poison flag."""
    calls = {"n": 0}

    def dead():
        calls["n"] += 1
        raise ValueError("shape mismatch: this is a bug, not the relay")

    assert bench._guard("dead", dead, (None, None)) == (None, None)
    assert calls["n"] == 1
    assert not bench._client_poisoned
    assert "bench phase 'dead' failed (attempt 1)" in capsys.readouterr().err


def test_guard_poison_latch(bench, capsys):
    """Exhausting the retry on a relay fault latches the poisoned-client
    flag; subsequent TPU phases short-circuit (each would otherwise burn up
    to ~15 min of relay timeout per attempt), but CPU phases still run."""
    def crash():
        raise RuntimeError("UNAVAILABLE: TPU worker process crashed")

    assert bench._guard("crash", crash, None) is None
    assert bench._client_poisoned
    ran = {"n": 0}

    def should_skip():
        ran["n"] += 1
        return 1.0

    assert bench._guard("later-tpu", should_skip, None) is None
    assert ran["n"] == 0
    assert "skipped: TPU client poisoned" in capsys.readouterr().err
    # CPU phases are exempt from the latch
    assert bench._guard("cpu", should_skip, None, tpu=False) == 1.0
    assert ran["n"] == 1


def test_phase_subprocess_roundtrip(bench, monkeypatch, capsys):
    """_phase_in_subprocess parses the child's last JSON line and degrades a
    crash to None without raising (the round-3 fleet failure mode)."""
    import subprocess

    class FakeDone:
        returncode = 0
        stderr = "some warning\n"
        stdout = "noise line\n" + json.dumps({"fleet8_scans_per_s": 195.9})

    monkeypatch.setattr(subprocess, "run", lambda *a, **k: FakeDone())
    assert bench._phase_in_subprocess("fleet") == {"fleet8_scans_per_s": 195.9}

    class FakeCrash:
        returncode = -11
        stderr = ""
        stdout = ""

    monkeypatch.setattr(subprocess, "run", lambda *a, **k: FakeCrash())
    assert bench._phase_in_subprocess("fleet") is None
    assert "exited -11" in capsys.readouterr().err


def test_rnd(bench):
    assert bench._rnd(None) is None
    assert bench._rnd(1.2345, 2) == 1.23
