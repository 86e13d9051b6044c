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


def test_classified_flags_reported_separately(tmp_path, monkeypatch, capsys):
    """Floor governance (VERDICT r09 item 3): queries in BENCH_MINIMA's
    top-level "classified" map are reported as classified, never as
    REGRESSION, by --compare; unclassified movement still flags. The
    classified key must survive a monotonic minima fold."""
    p = tmp_path / "minima.json"
    monkeypatch.setattr(bench, "MINIMA_PATH", str(p))
    p.write_text(json.dumps({
        "sf0.1": {"slow_classified": 0.5, "slow_fresh": 0.5, "ok": 1.0},
        "classified": {"slow_classified": "SCALE.md 'Round-9 bench note'"},
    }))
    assert bench.load_classified() == {
        "slow_classified": "SCALE.md 'Round-9 bench note'"}
    cur = {"slow_classified": 2.0, "slow_fresh": 2.0, "ok": 1.0}
    bench.compare(cur, str(p), mins=cur, sf_key="sf0.1")
    err = capsys.readouterr().err
    assert "REGRESSION slow_fresh" in err
    assert "REGRESSION slow_classified" not in err
    assert "classified slow_classified" in err
    assert "SCALE.md 'Round-9 bench note'" in err
    # folding new minima must not drop the classified map
    bench.update_minima({"ok": 0.9}, "sf0.1")
    doc = json.loads(p.read_text())
    assert doc["classified"] == {
        "slow_classified": "SCALE.md 'Round-9 bench note'"}
    assert doc["sf0.1"]["ok"] == 0.9


def test_real_minima_file_classified_map_is_valid():
    """The repo's BENCH_MINIMA.json classified entries must name real
    sf0.1 queries (no typo'd keys silently de-classifying a flag)."""
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "BENCH_MINIMA.json")) as fh:
        doc = json.load(fh)
    cls = doc.get("classified", {})
    assert cls, "classified map missing from BENCH_MINIMA.json"
    floors = doc.get("sf0.1", {})
    unknown = [q for q in cls if q not in floors]
    assert not unknown, unknown
    assert all("SCALE.md" in v for v in cls.values())


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
