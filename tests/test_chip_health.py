"""tools/chip_health.py gate logic: exit codes and --wait behavior.

The r5 capture queue gates hours of chip work on this tool (a degraded
chip looks UP to a tiny-matmul probe but times everything ~25x slow —
see CLAUDE.md 2026-08-19), so the healthy/degraded decision and the
wait-loop budget handling get real tests.  probe_tflops itself needs
the TPU; it is monkeypatched here.
"""

import importlib.util
import sys
from pathlib import Path

_SPEC = importlib.util.spec_from_file_location(
    "chip_health", Path(__file__).resolve().parents[1] / "tools" / "chip_health.py"
)
chip_health = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(chip_health)


def _run(monkeypatch, argv, tflops_seq):
    it = iter(tflops_seq)
    monkeypatch.setattr(chip_health, "probe_tflops",
                        lambda n=4096, length=50: next(it))
    monkeypatch.setattr(chip_health.time, "sleep", lambda s: None)
    monkeypatch.setattr(sys, "argv", ["chip_health.py"] + argv)
    return chip_health.main()


def test_healthy_exits_zero(monkeypatch, capsys):
    assert _run(monkeypatch, [], [120.0]) == 0
    assert "HEALTHY" in capsys.readouterr().out


def test_degraded_exits_nonzero(monkeypatch, capsys):
    assert _run(monkeypatch, [], [1.9]) == 1
    assert "DEGRADED" in capsys.readouterr().out


def test_wait_recovers(monkeypatch, capsys):
    # degraded twice, then healthy -> exit 0 after three probes
    rc = _run(monkeypatch, ["--wait", "--interval-s", "1",
                            "--budget-s", "100"], [1.9, 2.1, 99.0])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count("DEGRADED") == 2 and "HEALTHY" in out


def test_wait_budget_exhausts(monkeypatch, capsys):
    # never recovers; the loop must stop once another interval no longer
    # fits in the budget, not spin forever
    monkeypatch.setattr(chip_health, "probe_tflops",
                        lambda n=4096, length=50: 1.0)
    monkeypatch.setattr(chip_health.time, "sleep", lambda s: None)
    monkeypatch.setattr(sys, "argv",
                        ["chip_health.py", "--wait", "--interval-s", "1e9",
                         "--budget-s", "10"])
    assert chip_health.main() == 1
    assert "budget exhausted" in capsys.readouterr().out


def test_json_mode(monkeypatch, capsys):
    import json

    assert _run(monkeypatch, ["--json", "--min-tflops", "50"], [77.7]) == 0
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["healthy"] is True and rec["tflops"] == 77.7
