"""bench.py outage-guard tests (VERDICT r3 weak #1 / next-step #1).

Simulates the failure mode that lost BENCH_r03.json — the relay dying during
backend init — by substituting probe/child commands that fail a few times
before recovering, and asserts the orchestrator rides through it.
No TPU or jax involved: the guard is plain subprocess logic.
"""

import importlib.util
import os
import sys

_spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def _counter_cmd(tmp_path, name, fail_times, then):
    """Shell command failing `fail_times` times, then running `then`."""
    state = tmp_path / f"{name}.count"
    state.write_text("0")
    return (
        f'n=$(cat {state}); echo $((n+1)) > {state}; '
        f'if [ "$n" -lt "{fail_times}" ]; then exit 1; fi; {then}'
    )


def test_orchestrator_rides_out_dead_relay(tmp_path, monkeypatch, capsys):
    # probe: relay down for 2 probes (init would hang/raise), then healthy
    monkeypatch.setenv(
        "BENCH_PROBE_CMD", _counter_cmd(tmp_path, "probe", 2, "exit 0")
    )
    # child: first run dies mid-init (relay relapse), second succeeds
    monkeypatch.setenv(
        "BENCH_CHILD_CMD",
        _counter_cmd(tmp_path, "child", 1, 'echo \'{"metric": "x"}\''),
    )
    monkeypatch.setenv("BENCH_MAX_WAIT", "600")
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench.orchestrate() == 0
    out = capsys.readouterr().out
    assert "probe 1 failed" in out and "probe 2 failed" in out
    assert "child rc=1" in out


def test_orchestrator_gives_up_when_relay_stays_dead(tmp_path, monkeypatch):
    monkeypatch.setenv("BENCH_PROBE_CMD", "exit 1")
    monkeypatch.setenv("BENCH_MAX_WAIT", "1")
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench.orchestrate() == 1


def test_orchestrator_kills_hung_probe(tmp_path, monkeypatch):
    # a probe that HANGS (the failure mode observed live this round) must be
    # killed by the timeout, not inherited as a hang
    monkeypatch.setenv("BENCH_PROBE_CMD", "sleep 60")
    monkeypatch.setenv("BENCH_PROBE_TIMEOUT", "1")
    monkeypatch.setenv("BENCH_MAX_WAIT", "1")
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench.orchestrate() == 1


def test_child_env_flag_set(tmp_path, monkeypatch):
    monkeypatch.setenv("BENCH_PROBE_CMD", "exit 0")
    out = tmp_path / "env.txt"
    monkeypatch.setenv("BENCH_CHILD_CMD", f'echo "$BENCH_CHILD" > {out}')
    monkeypatch.setenv("BENCH_MAX_WAIT", "60")
    assert bench.orchestrate() == 0
    assert out.read_text().strip() == "1"
