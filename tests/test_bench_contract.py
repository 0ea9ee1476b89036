"""bench.py stdout-contract guards (round-4 VERDICT item 1).

The driver records the LAST stdout JSON line as the round's perf number.
BENCH_r04.json was rc=124/parsed=null because the contract line printed
only after BOTH legs; these tests pin the reworked orchestration:

- the contract line is emitted from the best *completed* leg even when a
  later leg is budget-skipped or crashes;
- zero completed legs -> explicit error JSON + nonzero exit;
- the SIGTERM handler (GNU timeout's kill signal) emits before dying;
- legs run headline-first (b7 before b8 before b3).
"""

import json
import signal
import sys

import pytest

import bench


@pytest.fixture(autouse=True)
def _reset_emit(monkeypatch):
    monkeypatch.setattr(bench, "_emitted", False)
    # never touch a real backend in these tests
    monkeypatch.setattr(bench, "wait_for_backend", lambda **kw: "cpu")


def _run_main(monkeypatch, capsys, leg_results, argv=("bench.py",),
              budget="540"):
    """Drive bench.main() with run_leg stubbed to pop from leg_results."""
    calls = []

    def fake_leg(args, batch_size, timeout_s):
        calls.append((batch_size, timeout_s))
        return leg_results.pop(0)

    monkeypatch.setattr(bench, "run_leg", fake_leg)
    monkeypatch.setenv("DYNAMO_BENCH_BUDGET", budget)
    monkeypatch.setattr(sys, "argv", list(argv))
    rc = 0
    try:
        bench.main()
    except SystemExit as e:
        rc = e.code or 0
    out = capsys.readouterr().out
    contract = json.loads(out.strip().splitlines()[-1])
    return rc, contract, calls


def test_headline_leg_runs_first_and_best_wins(monkeypatch, capsys):
    legs = [
        {"batch_size": 7, "examples_per_sec": 40.2, "ms_per_step": 174.2},
        {"batch_size": 8, "examples_per_sec": 39.3, "ms_per_step": 203.4},
        {"batch_size": 3, "examples_per_sec": 31.9, "ms_per_step": 93.9},
    ]
    rc, contract, calls = _run_main(monkeypatch, capsys, legs)
    assert rc == 0
    assert [b for b, _ in calls] == [7, 8, 3]
    # The first leg's slice reserves 150 s per remaining leg, so a cold
    # compile in the headline leg cannot starve the later legs.
    assert calls[0][1] <= 540 - 2 * 150 + 1
    assert calls[-1][1] > calls[0][1] - 60  # later legs get the leftovers
    assert contract["value"] == 40.2
    assert contract["metric"].endswith("_b7")
    assert contract["vs_baseline"] == pytest.approx(40.2 / 20.0, abs=1e-3)


def test_skipped_leg_still_emits_completed_leg(monkeypatch, capsys):
    # b7 completes; b8/b3 time out (run_leg returns None) -> contract from b7
    legs = [
        {"batch_size": 7, "examples_per_sec": 40.2, "ms_per_step": 174.2},
        None,
        None,
    ]
    rc, contract, _ = _run_main(monkeypatch, capsys, legs)
    assert rc == 0
    assert contract["value"] == 40.2 and "error" not in contract


def test_zero_completed_legs_is_explicit_error(monkeypatch, capsys):
    rc, contract, _ = _run_main(monkeypatch, capsys, [None, None, None])
    assert rc == 1
    assert contract["value"] is None and "error" in contract


def test_exhausted_budget_skips_later_legs(monkeypatch, capsys):
    # Budget below MIN_LEG_S after the probe: every leg is skipped up front,
    # run_leg must never be called, and the error JSON still prints.
    called = []
    monkeypatch.setattr(bench, "run_leg",
                        lambda *a, **k: called.append(a) or None)
    monkeypatch.setenv("DYNAMO_BENCH_BUDGET", "1")
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    with pytest.raises(SystemExit):
        bench.main()
    assert not called
    out, err = capsys.readouterr()
    assert json.loads(out.strip().splitlines()[-1])["value"] is None
    assert "skipped" in err


def test_sigterm_handler_emits_contract(monkeypatch, capsys):
    # Simulate the driver's `timeout` SIGTERM landing mid-b8 after the b7
    # leg completed: the handler must print the contract line, then exit 0
    # (a completed headline is a success even if the process was killed).
    exits = []
    monkeypatch.setattr(bench.os, "_exit", lambda code: exits.append(code))

    def leg_then_term(args, batch_size, timeout_s):
        if batch_size == 7:
            return {"batch_size": 7, "examples_per_sec": 40.2,
                    "ms_per_step": 174.2}
        signal.raise_signal(signal.SIGTERM)  # driver timeout fires here
        return None

    monkeypatch.setattr(bench, "run_leg", leg_then_term)
    monkeypatch.setenv("DYNAMO_BENCH_BUDGET", "540")
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    try:
        bench.main()
    except SystemExit:
        pass
    finally:
        signal.signal(signal.SIGTERM, signal.SIG_DFL)
    # os._exit is stubbed so the handler returns and later legs may raise
    # again; every exit code must be 0 (a completed headline is a success)
    assert exits and all(e == 0 for e in exits)
    contract = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert contract["value"] == 40.2


def test_emit_contract_is_idempotent(monkeypatch, capsys):
    class A:
        compute_dtype = "bfloat16"

    res = [{"batch_size": 8, "examples_per_sec": 40.0, "ms_per_step": 200.0}]
    bench.emit_contract(A, res)
    bench.emit_contract(A, res)
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    assert len(lines) == 1
