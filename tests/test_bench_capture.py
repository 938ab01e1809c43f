"""Capture-path resilience for bench.py (VERDICT r2 item 1): the official
round artifact must never record a bare zero because one probe hit a wedged
relay.  These tests drive the resume/emit logic without touching a device."""

import importlib.util
import json
import os
import sys
import time

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def bench(tmp_path, monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(HERE, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod, "PARTIAL_PATH",
                        str(tmp_path / ".bench_partial.json"))
    monkeypatch.setattr(mod, "FULL_PATH",
                        str(tmp_path / "bench_full.json"))
    return mod


def _lines(capsys):
    """(full_record_dict_from_early_line, compact_dict_from_final_line)."""
    lines = capsys.readouterr().out.strip().splitlines()
    return json.loads(lines[0]), json.loads(lines[-1]), lines[-1]


def _rec(model, value):
    return {"model": model, "metric": "elbo_steps_per_s_per_chip",
            "value": value, "unit": "steps/s/chip", "spread": 0.03}


def test_partial_roundtrip(bench):
    done = {"linreg": [_rec("linreg", 100.0)],
            "dlgm": [_rec("dlgm", 50.0), _rec("dlgm_fused", 80.0)]}
    bench.save_partial(done)
    assert bench.load_partial() == done


def test_partial_ttl_expires(bench, monkeypatch):
    bench.save_partial({"linreg": [_rec("linreg", 1.0)]})
    old = time.time() - bench.PARTIAL_TTL_S - 10
    os.utime(bench.PARTIAL_PATH, (old, old))
    assert bench.load_partial() == {}


def test_partial_fresh_env(bench, monkeypatch):
    bench.save_partial({"linreg": [_rec("linreg", 1.0)]})
    monkeypatch.setenv("BENCH_FRESH", "1")
    assert bench.load_partial() == {}


def test_emit_partial_keeps_records(bench, capsys):
    """A mid-sweep relay death must still emit the measured records."""
    done = {"linreg": [_rec("linreg", 123.0)]}
    rc = bench.emit(done, error="TPU lost mid-sweep at gmm")
    full, compact, _ = _lines(capsys)
    assert rc == 1
    assert full["workloads"]["linreg"]["value"] == 123.0
    assert "error" in full and "error" in compact
    assert compact["value"] == 0.0


def test_emit_headline_prefers_fused(bench, capsys):
    done = {name: [_rec(name, 10.0)] for name in bench.WORKLOADS}
    done["dlgm"] = [_rec("dlgm", 50.0), _rec("dlgm_fused", 80.0)]
    rc = bench.emit(done)
    _, compact, _ = _lines(capsys)
    assert rc == 0
    assert compact["value"] == 80.0
    assert compact["vs_baseline"] == round(80.0 / bench.R1_HEADLINE, 4)


def test_emit_final_line_is_compact_and_parseable(bench, capsys):
    """VERDICT r3 item 1: the driver parses the LAST line of a bounded
    stdout tail.  The final line must json.loads, stay ≤ 500 bytes even
    with every workload populated with rich records, and contain the
    headline fields; the per-workload dict must NOT be on it."""
    rich = dict(_rec("x", 1.0), mfu=0.455, hbm_util=0.9, bound="compute",
                reps=25, min_ess=1234.5, max_rhat=1.0008, converged=True,
                achieved_tflops=89.1, platform="tpu", stages=21,
                chains=1024)
    done = {name: [dict(rich, model=name), dict(rich, model=name + "_fused")]
            for name in bench.WORKLOADS}
    rc = bench.emit(done)
    full, compact, raw_last = _lines(capsys)
    assert rc == 0
    assert len(raw_last) <= 500
    assert set(compact) == {"metric", "value", "unit", "vs_baseline",
                            "spread"}
    assert "workloads" in full and len(full["workloads"]) == 10
    # the full dict is also persisted for the judge
    with open(bench.FULL_PATH) as f:
        assert json.load(f)["workloads"] == full["workloads"]


def test_emit_final_line_compact_even_on_error(bench, capsys):
    long_err = "TPU unreachable: " + "x" * 400
    rc = bench.emit({}, error=long_err)
    _, compact, raw_last = _lines(capsys)
    assert rc == 1
    assert len(raw_last) <= 500 and compact["error"].startswith("TPU")


def test_wait_for_tpu_retries_through_outage(bench, monkeypatch):
    """The round-2 failure mode: first probes fail (wedged relay), a later
    one succeeds — wait_for_tpu must keep trying, not give up at one."""
    calls = {"n": 0}

    def fake_probe(timeout=None):
        calls["n"] += 1
        return calls["n"] >= 3

    monkeypatch.setattr(bench, "probe_once", fake_probe)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench.wait_for_tpu(budget_s=10_000)
    assert calls["n"] == 3


def test_wait_for_tpu_respects_budget(bench, monkeypatch):
    monkeypatch.setattr(bench, "probe_once", lambda timeout=None: False)
    sleeps = []
    monkeypatch.setattr(bench.time, "sleep", sleeps.append)
    t = {"now": 0.0}

    def fake_time():
        t["now"] += 200.0
        return t["now"]

    monkeypatch.setattr(bench.time, "time", fake_time)
    assert not bench.wait_for_tpu(budget_s=1000)
    assert len(sleeps) <= 3


def test_main_resumes_and_skips_done(bench, monkeypatch, capsys):
    """main() must not re-run workloads already checkpointed."""
    bench.save_partial({n: [_rec(n, 5.0)] for n in bench.WORKLOADS[:-1]})
    monkeypatch.setattr(bench, "wait_for_tpu", lambda *a, **k: True)
    ran = []

    def fake_run(name):
        ran.append(name)
        return [_rec(name, 7.0), _rec("dlgm_fused", 9.0)]

    monkeypatch.setattr(bench, "run_workload", fake_run)
    rc = bench.main()
    last = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(last)
    assert ran == ["dlgm"]
    assert rc == 0 and out["value"] == 9.0
    assert len(last) <= 500 and "workloads" not in out
    assert not os.path.exists(bench.PARTIAL_PATH)   # cleaned on success
