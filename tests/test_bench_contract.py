"""bench.py output contract: the driver's capture window is ~2.2 KB, so
the stdout line must stay short regardless of registry growth (round 2
lost its official number to a 3.6 KB line — VERDICT r2 item 2), the
full per-query map lives in the BENCH_DETAIL.json sidecar, and
--compare must accept every baseline document shape the repo has ever
produced, including driver wrappers whose "parsed" is null (ADVICE r2).
"""

from __future__ import annotations

import json

import bench


def test_stdout_line_bounded_at_any_registry_size():
    # the emitted line carries only top-10 heaviest + scalars; simulate
    # a 500-query registry with worst-case (long) names and check the
    # serialized form of what main() prints stays far under 2 KB
    timings = {f"extremely_long_query_name_number_{i:04d}": i / 7.0
               for i in range(500)}
    top10 = dict(sorted(timings.items(), key=lambda kv: (-kv[1], kv[0]))[:10])
    line = json.dumps({
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "sf": 0.1,
        "n_queries": len(timings),
        "queries": top10,
        "detail": "BENCH_DETAIL.json",
    })
    assert len(line) < 2000


def test_baseline_maps_handles_null_parsed():
    # driver-recorded BENCH_r*.json where output capture truncated the
    # line: {"parsed": null, "tail": "..."} — must not raise and must
    # fall back to the top-level doc
    doc = {"parsed": None, "tail": "..."}
    base, base_min = bench._baseline_maps(doc, "sf0.1")
    assert base == {} and base_min is None


def test_baseline_maps_all_shapes():
    # bench stdout-line / sidecar shape
    doc = {"queries": {"a": 1.0}, "queries_min": {"a": 0.9}}
    assert bench._baseline_maps(doc, "sf0.1") == ({"a": 1.0}, {"a": 0.9})
    # driver wrapper shape
    doc = {"parsed": {"queries": {"b": 2.0}}}
    base, base_min = bench._baseline_maps(doc, "sf0.1")
    assert base == {"b": 2.0} and base_min is None
    # minima-file shape, keyed by sf
    doc = {"sf0.1": {"c": 0.5}, "sf0.001": {"c": 0.1}}
    base, base_min = bench._baseline_maps(doc, "sf0.1")
    assert base == {} and base_min == {"c": 0.5}


def test_update_minima_monotonic(tmp_path, monkeypatch):
    p = tmp_path / "minima.json"
    monkeypatch.setattr(bench, "MINIMA_PATH", str(p))
    first = bench.update_minima({"q": 1.0, "r": 2.0}, "sf0.1")
    assert first == {"q": 1.0, "r": 2.0}
    # improvements stick, regressions do not overwrite
    second = bench.update_minima({"q": 0.5, "r": 9.0}, "sf0.1")
    assert second == {"q": 0.5, "r": 2.0}
    # different sf is tracked independently
    other = bench.update_minima({"q": 7.0}, "sf0.001")
    assert other == {"q": 7.0}
    doc = json.loads(p.read_text())
    assert doc["sf0.1"]["q"] == 0.5 and doc["sf0.001"]["q"] == 7.0


def test_family_match_prefix_contract():
    """--family matches exact names or underscore-boundary prefixes
    only: 'survival_cox' picks survival_cox_td, but a bare letter
    matches nothing it doesn't name exactly (ADVICE r06)."""
    fams = ["survival_cox", "sketch"]
    assert bench.family_match("survival_cox", fams)
    assert bench.family_match("survival_cox_td", fams)
    assert bench.family_match("sketch_kll_rollup", fams)
    assert not bench.family_match("survival_coxness", fams)
    assert not bench.family_match("survival_km", fams)
    assert not bench.family_match("sketchy", fams)
    assert not bench.family_match("stats_ks", ["s"])
