"""bench.py supervisor logic: synthesis from committed progress events,
always-one-JSON-line guarantees, deadline behavior (no JAX, no TPU).

VERDICT r3 missing #1: the driver's capture must succeed even when the chip
is dead or the run is killed mid-phase."""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def _write_progress(tmp_path, events):
    p = tmp_path / "prog.jsonl"
    with open(p, "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")
    return str(p)


def test_synthesize_full_run(tmp_path):
    """All phases committed: headline = fastest gate-passing mode with MALA
    amortized in; two-sided gate evaluated from committed events."""
    spread = 14.6
    p = _write_progress(tmp_path, [
        {"event": "gt_spread", "spread": spread},
        {"event": "timed", "mode": "hutch_ess_k10", "cps": 46000.0,
         "n_chains": 2048, "n_steps": 100},
        {"event": "quality", "mode": "hutch_ess_k10", "wall_s": 30.0,
         "exact_arm": "committed-asset",
         "hutch_ess_k10_vs_groundtruth_energy_w2": 20.9,
         "exact_vs_hutch_ess_k10_energy_w2": 1.9},
        {"event": "mala", "mala30_wall_s": 2.0, "n_chains": 2048},
        {"event": "timed", "mode": "exact", "cps": 600.0,
         "n_chains": 2048, "n_steps": 100},
    ])
    out, ok = bench._synthesize(p, time.time(), "")
    assert ok
    d = out["details"]
    assert d["headline_mode"] == "hutch_ess_k10"
    assert d["quality_gate_ok"] is True
    assert "hutch_ess_k10" in d["modes_passing_gate"]
    # amortized headline: 2048*1000/(2048*1000/46000 + 2.0)
    expect = 2048 * 1000 / (2048 * 1000 / 46000.0 + 2.0)
    assert abs(out["value"] - expect) < 1.0
    assert out["value"] < d["headline_raw_rate"]  # MALA cost folded in
    assert d["mala_amortized"] is True
    assert out["vs_baseline"] == round(out["value"] / 3400.0, 3)


def test_synthesize_keeps_best_rung_per_mode(tmp_path):
    """The worker may time a mode at several chain counts (rung sweep); the
    supervisor reports the max cps per mode and records the winning rung."""
    spread = 14.6
    p = _write_progress(tmp_path, [
        {"event": "gt_spread", "spread": spread},
        {"event": "timed", "mode": "hutch_ess_k10", "cps": 34900.0,
         "n_chains": 2048, "n_steps": 100},
        {"event": "timed", "mode": "hutch_ess_k10", "cps": 46600.0,
         "n_chains": 512, "n_steps": 100},
        {"event": "quality", "mode": "hutch_ess_k10", "wall_s": 30.0,
         "exact_arm": "committed-asset",
         "hutch_ess_k10_vs_groundtruth_energy_w2": 20.9,
         "exact_vs_hutch_ess_k10_energy_w2": 1.9},
        {"event": "mala", "mala30_wall_s": 0.2, "n_chains": 2048},
    ])
    out, ok = bench._synthesize(p, time.time(), "")
    assert ok
    d = out["details"]
    assert d["headline_raw_rate"] == 46600.0
    assert d["headline_chains"] == 512
    assert d["hutch_ess_k10"] == 46600.0
    # order must not matter: a slower later rung cannot overwrite the best
    p2 = _write_progress(tmp_path, [
        {"event": "gt_spread", "spread": spread},
        {"event": "timed", "mode": "hutch_ess_k10", "cps": 46600.0,
         "n_chains": 512, "n_steps": 100},
        {"event": "timed", "mode": "hutch_ess_k10", "cps": 34900.0,
         "n_chains": 2048, "n_steps": 100},
        {"event": "quality", "mode": "hutch_ess_k10", "wall_s": 30.0,
         "exact_arm": "committed-asset",
         "hutch_ess_k10_vs_groundtruth_energy_w2": 20.9,
         "exact_vs_hutch_ess_k10_energy_w2": 1.9},
    ])
    out2, _ = bench._synthesize(p2, time.time(), "")
    assert out2["details"]["headline_raw_rate"] == 46600.0
    assert out2["details"]["headline_chains"] == 512
    # VERDICT r4 next #6: every timed rung is auditable inside the artifact
    # as <mode>@<chains>, not just the winning rung
    for out_i in (out, out2):
        assert out_i["details"]["hutch_ess_k10@512"] == 46600.0
        assert out_i["details"]["hutch_ess_k10@2048"] == 34900.0


def test_synthesize_gate_failure_falls_back_to_slowest(tmp_path):
    """A fast mode that fails the gate must not become the headline."""
    p = _write_progress(tmp_path, [
        {"event": "gt_spread", "spread": 10.0},
        {"event": "timed", "mode": "hutch_ess_k10", "cps": 46000.0,
         "n_chains": 2048, "n_steps": 100},
        {"event": "timed", "mode": "exact", "cps": 600.0,
         "n_chains": 2048, "n_steps": 100},
        {"event": "quality", "mode": "hutch_ess_k10", "wall_s": 30.0,
         "exact_arm": "committed-asset",
         "hutch_ess_k10_vs_groundtruth_energy_w2": 50.0,  # > 2*spread
         "exact_vs_hutch_ess_k10_energy_w2": 1.9},
    ])
    out, ok = bench._synthesize(p, time.time(), "")
    assert ok
    assert out["details"]["headline_mode"] == "exact"
    assert out["details"]["quality_gate_ok"] is False


def test_synthesize_partial_run_timing_only(tmp_path):
    """Watchdog fires after only a timing phase: degraded but parseable."""
    p = _write_progress(tmp_path, [
        {"event": "timed", "mode": "hutch_ess_k10", "cps": 46000.0,
         "n_chains": 2048, "n_steps": 100},
    ])
    out, ok = bench._synthesize(p, time.time(), "deadline reached")
    assert ok
    assert out["value"] == 46000.0
    assert out["details"]["quality_gate_ok"] is False
    assert out["details"]["quality_gate_ran"] is False
    assert out["details"]["note"] == "deadline reached"


def test_synthesize_nothing_measured_carries_last_committed(tmp_path,
                                                            monkeypatch):
    """Dead chip: structured failure with details.last_committed."""
    last = tmp_path / "last.json"
    last.write_text(json.dumps({"metric": bench.METRIC, "value": 46581.5}))
    monkeypatch.setattr(bench, "LAST_COMMITTED", str(last))
    p = _write_progress(tmp_path, [])
    out, ok = bench._synthesize(p, time.time(), "device probe never succeeded")
    assert not ok
    assert out["value"] == 0.0
    assert out["details"]["all_attempts_failed"] is True
    assert out["details"]["last_committed"]["value"] == 46581.5
    # still a complete, driver-parseable record
    json.loads(json.dumps(out))


def test_emit_prints_exactly_once(capsys, monkeypatch, tmp_path):
    monkeypatch.setattr(bench, "LAST_COMMITTED",
                        str(tmp_path / "last.json"))
    bench._EMITTED.clear()
    bench._emit({"metric": bench.METRIC, "value": 1.0, "details": {}})
    bench._emit({"metric": bench.METRIC, "value": 2.0, "details": {}})
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    assert json.loads(out[0])["value"] == 1.0
    bench._EMITTED.clear()


@pytest.mark.slow
def test_sigterm_emits_json_and_exits_zero(tmp_path):
    """timeout(1)'s SIGTERM mid-probe must still yield one JSON line, rc=0
    (the exact failure shape of BENCH_r03.json)."""
    env = dict(
        os.environ,
        PITA_BENCH_DEADLINE_S="3600",
        JAX_PLATFORMS="cpu",
        PITA_BENCH_FAKE_DEAD_DEVICE="1",  # forces the probe loop
    )
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    time.sleep(8)  # let it settle into the probe loop
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=60)
    assert proc.returncode == 0
    lines = [ln for ln in out.strip().splitlines() if ln.startswith("{")]
    assert len(lines) == 1
    parsed = json.loads(lines[0])
    assert parsed["metric"] == bench.METRIC


@pytest.mark.slow
def test_deadline_watchdog_emits_json(tmp_path):
    """A dead device + short deadline: the watchdog prints the failure JSON
    and exits 0 before any driver timeout can SIGKILL."""
    env = dict(
        os.environ,
        PITA_BENCH_DEADLINE_S="25",
        JAX_PLATFORMS="cpu",
        PITA_BENCH_FAKE_DEAD_DEVICE="1",
    )
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=60,
    )
    assert proc.returncode == 0
    assert time.time() - t0 < 40
    lines = [ln for ln in proc.stdout.strip().splitlines()
             if ln.startswith("{")]
    assert len(lines) == 1
    parsed = json.loads(lines[0])
    assert parsed["value"] == 0.0
    assert parsed["details"]["all_attempts_failed"] is True


@pytest.mark.slow
def test_worker_end_to_end_tiny_cpu(tmp_path):
    """The real worker (asset load, all modes, quality gate, MALA probe,
    progress commits) at tiny shapes on CPU — catches IntegratorConfig
    field drift before a chip run burns the driver's window."""
    prog = tmp_path / "prog.jsonl"
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        PITA_BENCH_PROGRESS=str(prog),
        PITA_BENCH_WORKER_DEADLINE=str(time.time() + 60),  # skip optionals
        PITA_BENCH_WORKER=json.dumps(
            dict(n_chains=4, n_steps_t=2, n_chains_q=4, n_steps_q=4,
                 exact_timing=False, timing_reps=1, degraded=9)
        ),
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    events = [json.loads(ln) for ln in prog.read_text().splitlines()]
    kinds = [e["event"] for e in events]
    assert "gt_spread" in kinds
    assert any(e["event"] == "timed" and e["mode"] == "hutch_ess_k10"
               for e in events)
    assert any(e["event"] == "quality" for e in events)
    assert kinds[-1] == "done"
    # the tiny problem must never write the committed gate anchor
    assert not os.path.exists(bench.EXACT_ENERGIES_ASSET) or (
        len(__import__("numpy").load(bench.EXACT_ENERGIES_ASSET)) >= 512
    )
    # and the synthesized result from these events is parseable
    out, ok = bench._synthesize(str(prog), time.time(), "")
    assert out["metric"] == bench.METRIC and ok


def test_gate_gt_bound_tightens_with_exact_anchor(tmp_path):
    """With the exact-parity GT anchor known, the GT arm requires
    'no worse than exact + 0.5 sigma' (the calibrated run-to-run spread of
    512-sample W2 estimates, docs/gate_noise_floor.json), not merely within
    2 sigma."""
    spread = 14.6
    base = [
        {"event": "gt_spread", "spread": spread},
        {"event": "timed", "mode": "hutch_ess_k10", "cps": 46000.0,
         "n_chains": 512, "n_steps": 100},
        {"event": "timed", "mode": "exact", "cps": 600.0,
         "n_chains": 512, "n_steps": 100},
    ]
    # candidate at 27.0: inside 2*sigma (29.2) but OUTSIDE exact_gt+0.5s
    # (18.0 + 7.3 = 25.3) -> must FAIL the tightened gate
    p = _write_progress(tmp_path, base + [
        {"event": "quality", "mode": "hutch_ess_k10", "wall_s": 30.0,
         "exact_arm": "committed-asset",
         "hutch_ess_k10_vs_groundtruth_energy_w2": 27.0,
         "exact_vs_hutch_ess_k10_energy_w2": 1.9,
         "exact_vs_groundtruth_energy_w2": 18.0},
    ])
    out, _ = bench._synthesize(p, time.time(), "")
    assert out["details"]["gate_gt_bound"] == round(18.0 + 0.5 * spread, 4)
    assert "hutch_ess_k10" not in out["details"]["modes_passing_gate"]
    assert out["details"]["headline_mode"] == "exact"
    # candidate at 20.9 passes the tightened bound; an exact-arm pair
    # distance at the r4-longrun level (5.46 = 0.37 sigma, within the
    # calibrated run-to-run spread) must NOT fail the gate
    p2 = _write_progress(tmp_path, base + [
        {"event": "quality", "mode": "hutch_ess_k10", "wall_s": 30.0,
         "exact_arm": "committed-asset",
         "hutch_ess_k10_vs_groundtruth_energy_w2": 20.9,
         "exact_vs_hutch_ess_k10_energy_w2": 5.46,
         "exact_vs_groundtruth_energy_w2": 18.0},
    ])
    out2, _ = bench._synthesize(p2, time.time(), "")
    assert out2["details"]["headline_mode"] == "hutch_ess_k10"
    assert out2["details"]["quality_gate_ok"] is True
    # a genuinely divergent population (>= 0.5 sigma from exact) still fails
    p3 = _write_progress(tmp_path, base + [
        {"event": "quality", "mode": "hutch_ess_k10", "wall_s": 30.0,
         "exact_arm": "committed-asset",
         "hutch_ess_k10_vs_groundtruth_energy_w2": 20.9,
         "exact_vs_hutch_ess_k10_energy_w2": 8.0,
         "exact_vs_groundtruth_energy_w2": 18.0},
    ])
    out3, _ = bench._synthesize(p3, time.time(), "")
    assert "hutch_ess_k10" not in out3["details"]["modes_passing_gate"]


def test_g_kernel_validated_requires_both_onchip_checks(tmp_path, monkeypatch):
    """The exact_gop bench arm may only compile experimental Pallas on the
    shared chip after BOTH on-chip validations passed (operator parity AND
    the resampling-off e2e wiring check, docs/g_op_onchip.json)."""
    art = tmp_path / "g_op_onchip.json"
    monkeypatch.setattr(bench, "G_OP_ONCHIP", str(art))

    assert bench._g_kernel_validated() is False  # artifact absent

    def write(kernel_ok, e2e_ok, extra=None):
        d = {"phases": {"kernel_parity": {"ok": kernel_ok},
                        "e2e_parity": {"ok": e2e_ok}}}
        if extra is not None:
            d["phases"].update(extra)
        art.write_text(json.dumps(d))

    write(True, False)
    assert bench._g_kernel_validated() is False
    write(False, True)
    assert bench._g_kernel_validated() is False
    write(True, True)
    assert bench._g_kernel_validated() is True

    art.write_text("{not json")
    assert bench._g_kernel_validated() is False
    art.write_text(json.dumps({"phases": {"kernel_parity": {"ok": True}}}))
    assert bench._g_kernel_validated() is False  # e2e phase missing
