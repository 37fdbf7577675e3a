"""Driver reporting-contract tests for bench.py.

The round driver keeps only a 2000-CHARACTER TAIL of bench.py's stdout
and json-parses the last line found in it (contract evidence:
BENCH_r01/r02 parsed with 407/540-char tails; BENCH_r04 printed a
~3.5 kB final line, the tail began mid-token, and `parsed` was null
despite rc=0). These tests run bench.main() with every measurement
section stubbed to WORST-CASE-RICH results, then perform the driver's
exact read: tail(2000) -> last line -> json.loads. The full enriched
record must land in bench_details.json instead of stdout.
"""

import io
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _rich_parity():
    """Mimic round 4's ~30-key parity record (what blew the tail)."""
    r = {"fwd_rel_l2": 1.2e-06, "bwd_rel_l2": 3.4e-06,
         "fwd_max_abs_err": 0.0078, "attn_max_abs_err": 0.0,
         "keep_rate_h": 0.6985, "keep_rate_mlp_out": 0.7005,
         "keep_rate_attn_out": 0.8996, "keep_rate_p": 0.7969,
         "deterministic": True, "ok": True}
    for name in ("x", "cna_s", "cna_b", "cnm_s", "cnm_b",
                 "wqkv", "wout", "w1", "w2"):
        r[f"bwd_rel_err_{name}"] = 1.1e-06
        r[f"split_rel_err_{name}"] = 1.0e-07
    return r


def _rich_matrix():
    entry = {"images_per_sec": 4049.9, "step_ms": 252.8,
             "tflops_per_sec": 37.75, "mfu": 0.1916}
    return {name: dict(entry) for name in
            ("free_b1024", "tsbase_b64", "drop03_b1024", "l2_b1024",
             "macaron_b1024", "tsbase_b256_cached")}


def _fake_subproc(code=None, argv=None, timeout=None):  # noqa: ARG001
    if argv is not None:
        if "--bf16-only" in argv:
            return _rich_parity()
        if "--f32-only" in argv:
            return {"ok": True, "bwd_rel_l2_f32_highest": 9.6e-08}
        raise AssertionError(f"unexpected argv {argv}")
    if "trajectory_fidelity" in code:
        return {"ok": True, "euler_max_rel_err": 2.62e-07,
                "rk4_max_rel_err": 2.24e-07}
    if "tpu_dropout_check" in code:
        return {"ok": True, "deterministic": True,
                "keep_rate_rel_err": 0.002, "mask_distinct": True,
                "eval_identity": True, "train_scale_ok": True}
    if "serving_vmem_plan" in code:
        return {"ips": 1532.4, "ms": 41.76, "kib": 32768}
    # forward-throughput snippet
    assert "fast_forward" in code
    return {"ips": 23999.4, "step_s": 0.04314}


@pytest.fixture()
def bench_run(monkeypatch, tmp_path):
    """Run bench.main() fully stubbed; return (stdout_text, details_path)."""
    details = tmp_path / "bench_details.json"
    monkeypatch.setattr(bench, "_DETAILS_PATH", str(details))
    monkeypatch.setattr(bench, "_subproc_json", _fake_subproc)
    monkeypatch.setattr(
        "benchmarks.train_speed.variant_matrix",
        lambda budget_s, isolate, headline, per_entry_cap_s: _rich_matrix())
    # reset module state (bench is import-once across tests)
    monkeypatch.setattr(bench, "_H", {
        "value": None, "batch": None, "path": None, "step_s": None,
        "parity": None, "dropout_parity": None, "fidelity": None,
        "train": {}, "serve": {}, "skipped": []})
    monkeypatch.setattr(bench, "_T0", __import__("time").time())
    monkeypatch.setattr(bench, "_BUDGET_S", 1450.0)
    out = io.StringIO()
    monkeypatch.setattr(sys, "stdout", out)
    bench.main()
    return out.getvalue(), details


def _driver_read(stdout_text):
    """The driver's exact read: keep a 2000-char tail, parse the last
    line in it that looks like JSON."""
    tail = stdout_text[-2000:]
    for line in reversed(tail.strip().splitlines()):
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            return json.loads(line)
    return None


def test_final_line_survives_driver_tail(bench_run):
    stdout_text, _ = bench_run
    parsed = _driver_read(stdout_text)
    assert parsed is not None, "no complete JSON line in the 2000-char tail"
    assert parsed["metric"].startswith("images/sec/chip")
    assert parsed["value"] == pytest.approx(23999.4)
    assert parsed["unit"] == "images/sec/chip"
    assert parsed["vs_baseline"] == pytest.approx(1.2, rel=1e-3)
    assert parsed["parity_ok"] is True
    assert parsed["details"]["partial"] is False
    # the tail must contain the WHOLE final line, not a truncation of it
    last_line = stdout_text.strip().splitlines()[-1]
    assert last_line in stdout_text[-2000:]


def test_final_line_is_compact(bench_run):
    stdout_text, _ = bench_run
    last_line = stdout_text.strip().splitlines()[-1]
    # budget 1000 with full enrichment; hard emitter cap is 1500
    assert len(last_line) <= 1000, len(last_line)
    parsed = json.loads(last_line)
    d = parsed["details"]
    assert d["details_file"] == "bench_details.json"
    assert d["train_matrix_ok"] == "6/6"
    assert d["cache_state"] in ("cold", "warm")
    assert d["skipped"] == 0
    assert d["fidelity_euler"] == pytest.approx(2.62e-07)
    assert d["nfe"] == 48
    # pinned definition: ms per function evaluation = step_s/48
    assert d["per_rk_step_latency_ms"] == pytest.approx(
        0.04314 / 48 * 1e3, rel=1e-3)


def test_every_intermediate_line_is_parseable_and_compact(bench_run):
    stdout_text, _ = bench_run
    lines = [ln for ln in stdout_text.strip().splitlines() if ln.strip()]
    assert len(lines) >= 3  # partial + enrichments + final
    for ln in lines:
        assert len(ln) <= 1500, f"line too long for the tail window: {ln[:80]}"
        json.loads(ln)


def test_full_record_lands_in_details_file(bench_run):
    stdout_text, details = bench_run
    full = json.loads(details.read_text())
    assert full["partial"] is False
    assert full["train_matrix"]["tsbase_b256_cached"]["mfu"] > 0
    assert full["parity"]["bwd_rel_l2_f32_highest"] == pytest.approx(9.6e-08)
    assert full["dropout_parity"]["ok"] is True
    assert full["serve224_images_per_sec"] == pytest.approx(1532.4)
    assert full["skipped"] == []
    assert full["per_rk_step_latency_def"].startswith(
        "ms per solver function evaluation")
    # the rich record does NOT appear on stdout
    assert "keep_rate_mlp_out" not in stdout_text


def test_sigterm_before_measurement_emits_contract_line(monkeypatch, tmp_path):
    monkeypatch.setattr(bench, "_DETAILS_PATH",
                        str(tmp_path / "bench_details.json"))
    monkeypatch.setattr(bench, "_H", {
        "value": None, "batch": None, "path": None, "step_s": None,
        "parity": None, "dropout_parity": None, "fidelity": None,
        "train": {}, "serve": {}, "skipped": []})
    exited = []
    monkeypatch.setattr(bench.os, "_exit", lambda code: exited.append(code))
    out = io.StringIO()
    monkeypatch.setattr(sys, "stdout", out)
    bench._on_term(15, None)
    assert exited == [0]
    parsed = _driver_read(out.getvalue())
    assert parsed is not None
    assert parsed["value"] == 0.0
    assert parsed["parity_ok"] is False
    assert len(out.getvalue().strip().splitlines()[-1]) <= 1500


def test_sigterm_mid_run_emits_final_headline(monkeypatch, tmp_path):
    monkeypatch.setattr(bench, "_DETAILS_PATH",
                        str(tmp_path / "bench_details.json"))
    monkeypatch.setattr(bench, "_H", {
        "value": 23582.0, "batch": 1024, "path": "pallas-eulerx49",
        "step_s": 0.0434, "parity": _rich_parity(), "dropout_parity": None,
        "fidelity": None, "train": {}, "serve": {}, "skipped": []})
    exited = []
    monkeypatch.setattr(bench.os, "_exit", lambda code: exited.append(code))
    out = io.StringIO()
    monkeypatch.setattr(sys, "stdout", out)
    bench._on_term(15, None)
    assert exited == [0]
    parsed = _driver_read(out.getvalue())
    assert parsed is not None
    assert parsed["value"] == pytest.approx(23582.0)
    assert parsed["details"]["skipped"] == 1  # "terminated"


def test_oversize_guard_falls_back_to_minimal_line(monkeypatch, tmp_path):
    """If details ever exceed 1500 chars, the emitter must strip to a
    minimal-but-valid line rather than print an unparseable tail."""
    monkeypatch.setattr(bench, "_DETAILS_PATH",
                        str(tmp_path / "bench_details.json"))
    monkeypatch.setattr(bench, "_H", {
        "value": 23999.4, "batch": 1024, "path": "x" * 4000,  # absurd
        "step_s": 0.0434, "parity": None, "dropout_parity": None,
        "fidelity": None, "train": {}, "serve": {}, "skipped": []})
    out = io.StringIO()
    monkeypatch.setattr(sys, "stdout", out)
    bench._emit(final=True)
    last_line = out.getvalue().strip().splitlines()[-1]
    assert len(last_line) <= 1500
    parsed = json.loads(last_line)
    assert parsed["value"] == pytest.approx(23999.4)
    assert parsed["details"] == {"details_file": "bench_details.json"}
