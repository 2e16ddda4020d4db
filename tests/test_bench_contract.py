"""The bench artifact contract: `python bench.py` must ALWAYS leave a
parseable JSON line carrying the driver-required fields, whatever the
relay weather does to individual sections.

Round 3 (rc=1) and round 4 (rc=124) both left `parsed: null` driver
artifacts; the round-5 orchestrator emits a best-effort line after every
section and fills the contract fields from labeled prior measurements
when a section is starved. These tests drive the REAL orchestrator
process with canned section results (CAPDEC_BENCH_FAKE hook in
bench._child) — no jax import, no chip, ~seconds.

Contract fields (VERDICT round 4, item 1): value, train_mfu_best,
train_vs_baseline, torch_cpu_train_sps — plus vs_baseline from the
original bench spec.
"""
import json
import os
import signal
import subprocess
import sys
import time

BENCH = os.path.join(os.path.dirname(__file__), os.pardir, "bench.py")

GOOD = {
    "beam": {"captions_per_sec": 254.4, "n": 512},
    "train": {"train_samples_per_sec_contract": 1595.0,
              "train_samples_per_sec_best": 1715.0,
              "train_best_batch": 120,
              "train_model_flops_per_step": 6.29e12},
    "train_baseline": {"baseline_train_sps": 912.0},
    "train_baseline_torch": {"torch_cpu_train_sps": 0.9},
    "peak": {"peak_flops": 1.837e14},
    "embed": {"embed_text_captions_per_sec": 8152.0,
              "embed_text_batch1_per_sec": 30.3},
    "greedy": {"greedy_captions_per_sec": 1310.0},
    "serve": {"serve_captions_per_sec": 242.2,
              "serve_sync_captions_per_sec": 233.8,
              "serve_latency_p99_s": 6.3},
    "naive_decode": {"baseline_captions_per_sec": 0.5},
}


def _run(tmp_path, table, budget="600", timeout=120):
    fake = tmp_path / "fake.json"
    fake.write_text(json.dumps(table))
    env = dict(os.environ, CAPDEC_BENCH_FAKE=str(fake),
               CAPDEC_BENCH_BUDGET=budget)
    # -S: skip this container's sitecustomize (it imports all of jax,
    # ~2.3 s per interpreter); bench propagates the flag to its children.
    proc = subprocess.run([sys.executable, "-S", BENCH], env=env,
                          timeout=timeout, capture_output=True, text=True)
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln]
    assert lines, f"no stdout at all (stderr: {proc.stderr[-2000:]})"
    # EVERY stdout line must parse (the driver takes the last one, but a
    # partial/corrupt intermediate emit would mean the same bug class).
    parsed = [json.loads(ln) for ln in lines]
    return proc, parsed[-1], parsed


def test_all_sections_land(tmp_path):
    proc, out, emits = _run(tmp_path, GOOD)
    assert proc.returncode == 0
    assert out["value"] == 254.4
    assert out["vs_baseline"] == round(254.4 / 0.5, 2)
    assert out["train_samples_per_sec_contract"] == 1595.0
    assert out["train_vs_baseline"] == round(1595.0 / 912.0, 2)
    assert out["torch_cpu_train_sps"] == 0.9
    assert out["train_mfu_best"] == round(
        6.29e12 / (120 / 1715.0) / 1.837e14, 3)
    assert out["peak_source"] == "measured_this_run"
    assert out["serve_captions_per_sec"] == 242.2
    assert out["int8_kv_captions_per_sec"] == 254.4  # beam fake reused
    # no fallback labels when everything measured
    for k in ("vs_baseline_source", "train_vs_baseline_source",
              "torch_cpu_train_sps_source"):
        assert k not in out
    assert "sections_failed" not in out
    # the line is emitted incrementally, not once at the end
    assert len(emits) >= 8


def test_starved_sections_fall_back_labeled(tmp_path):
    table = dict(GOOD)
    for dead in ("peak", "naive_decode", "train_baseline",
                 "train_baseline_torch"):
        table[dead] = "fail"
    proc, out, _ = _run(tmp_path, table)
    assert proc.returncode == 0
    # every contract field still present, each labeled with its source
    assert out["value"] == 254.4
    assert out["vs_baseline"] == round(254.4 / 0.5057, 2)
    assert out["vs_baseline_source"].startswith("prior_best")
    assert out["train_vs_baseline"] == round(1595.0 / 920.0, 2)
    assert out["train_vs_baseline_source"].startswith("prior_best")
    assert out["torch_cpu_train_sps"] == 1.03
    assert out["torch_cpu_train_sps_source"].startswith("prior_best")
    # MFU falls back to the prior-best peak denominator (lower bound)
    assert out["train_mfu_best"] == round(
        6.29e12 / (120 / 1715.0) / 1.837e14, 3)
    assert out["peak_source"] == "prior_best_r5_standalone"
    assert "measured_peak_tflops" not in out
    assert len(out["sections_failed"]) >= 4


def test_beam_failure_still_parses(tmp_path):
    table = dict(GOOD, beam="fail")
    proc, out, _ = _run(tmp_path, table)
    assert proc.returncode == 0
    assert out["value"] == -1.0  # honest sentinel, never a fake headline
    assert "vs_baseline_source" not in out  # no beam -> no ratio to fake
    assert out["train_samples_per_sec_contract"] == 1595.0
    assert out["train_mfu_best"] > 0


def test_sigterm_mid_run_leaves_parsed_line(tmp_path):
    """The driver's timeout kill (SIGTERM) at ANY moment must leave a
    parseable best-effort line — the round-4 failure mode."""
    fake = tmp_path / "fake.json"
    # make the first section hang so the kill lands mid-section
    fake.write_text(json.dumps(dict(GOOD, beam="hang")))
    env = dict(os.environ, CAPDEC_BENCH_FAKE=str(fake),
               CAPDEC_BENCH_BUDGET="600",
               CAPDEC_BENCH_FAKE_HANG_S="60")
    proc = subprocess.Popen([sys.executable, "-S", BENCH], env=env,
                            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                            text=True)
    # The first stderr line is printed AFTER the signal handlers are
    # registered — waiting for it avoids killing the parent before its
    # handler exists (a loaded CI box can take seconds to reach main()).
    line = proc.stderr.readline()
    assert "--section" in line, line
    time.sleep(0.5)  # let the hang-section child spawn
    proc.send_signal(signal.SIGTERM)
    stdout, _ = proc.communicate(timeout=30)
    lines = [ln for ln in stdout.strip().splitlines() if ln]
    assert lines
    out = json.loads(lines[-1])
    assert out["metric"] == "captions_per_sec_per_chip_beam5"
    assert any(f.startswith("killed_by_signal")
               for f in out["sections_failed"])
