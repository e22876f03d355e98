"""The bench harness's final stdout line must fit the driver's 2 KB tail
capture (BENCH_r03 recorded ``parsed: null`` because the line was longer and
arrived front-truncated). ``bench.emit`` bounds the line and sidecars the
full detail. Pure-Python — no Ray session needed."""

import importlib.util
import json
import os
import sys


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    # guard: bench.py top-level must stay import-safe (no ray.init at import)
    spec.loader.exec_module(mod)
    return mod


def _full(n_queries: int = 131, n_sf1: int = 31) -> dict:
    return {
        "metric": "cdc_upsert_seconds",
        "value": 0.229,
        "unit": "sec",
        "queries": {f"panel_query_name_{i:03d}": round(0.1 + i * 0.013, 3)
                    for i in range(n_queries)},
        "sf": "/root/testdata/sf0.1",
        "num_cpus": 32,
        "events": 400004,
        "events_per_sec": 1749110,
        "queries_sf1": {f"panel_query_name_{i:03d}": round(1.0 + i * 0.1, 3)
                        for i in range(n_sf1)},
        "sf1_dir": "/tmp/kcs3_ray/sf1 (10x driver sf0.1, synth_scale.py)",
        "ivf_recall_at_10": 0.933,
    }


def test_small_result_passes_through(tmp_path, monkeypatch):
    monkeypatch.setenv("BENCH_SIDECAR", str(tmp_path / "side.json"))
    bench = _bench()
    full = {"metric": "scaling_efficiency", "value": 0.861, "unit": "ratio"}
    line = bench.emit(full)
    assert json.loads(line) == full
    assert not (tmp_path / "side.json").exists()  # no sidecar when it fits


def test_oversize_result_is_bounded_and_parseable(tmp_path, monkeypatch):
    sidecar = tmp_path / "side.json"
    monkeypatch.setenv("BENCH_SIDECAR", str(sidecar))
    bench = _bench()
    full = _full()
    assert len(json.dumps(full, separators=(",", ":"))) > 1900  # the r03 bug shape
    line = bench.emit(full)
    assert len(line) <= 1900
    got = json.loads(line)  # the driver's exact failure mode: must parse
    # headline fields survive verbatim
    for k in ("metric", "value", "unit", "sf", "num_cpus", "events",
              "events_per_sec", "ivf_recall_at_10"):
        assert got[k] == full[k]
    # earliest (most-established) panel entries are kept, tail elided
    assert got["queries"]["panel_query_name_000"] == full["queries"]["panel_query_name_000"]
    assert got["queries_elided"] == len(full["queries"]) - len(got["queries"])
    assert got["queries_elided"] > 0
    # explicit BENCH_SIDECAR is recorded verbatim so the record resolves it
    assert got["full"] == str(sidecar)
    # sidecar carries the COMPLETE original dict
    assert json.loads(sidecar.read_text()) == full


def test_truncation_simulating_driver_tail(tmp_path, monkeypatch):
    """End-to-end shape of the driver's capture: keep only the last 2000
    chars of what bench printed; the last line must still json-parse."""
    monkeypatch.setenv("BENCH_SIDECAR", str(tmp_path / "side.json"))
    bench = _bench()
    stdout = "some earlier log noise\n" * 20 + bench.emit(_full()) + "\n"
    tail = stdout[-2000:]
    parsed = json.loads(tail.strip().splitlines()[-1])
    assert parsed["metric"] == "cdc_upsert_seconds"


def test_pathological_limit_never_loops(tmp_path, monkeypatch):
    monkeypatch.setenv("BENCH_SIDECAR", str(tmp_path / "side.json"))
    bench = _bench()
    line = bench.emit(_full(), limit=10)  # smaller than even the scaffold
    json.loads(line)  # still a valid line; queries fully elided
    assert json.loads(line)["queries"] == {}
