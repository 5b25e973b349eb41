"""The bench noise-band protocol (VERDICT r12 #1): band construction
from repeat=3 run files and the mechanical exceedance checker that
replaces per-round ABA adjudication. Pure-python — no Spark session."""

from __future__ import annotations

import importlib.util
import json
import os

import pytest

def _load(name):
    spec = importlib.util.spec_from_file_location(
        name,
        os.path.join(os.path.dirname(__file__), "..", "scripts", f"{name}.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod

bands_mod = _load("build_bench_bands")
check_mod = _load("check_bench")


def _run(queries, **kw):
    rec = {
        "metric": "total_wall_sec", "value": sum(queries.values()),
        "unit": "sec", "load_start": [0.3, 0.4, 0.5],
        "load_end": [0.5, 0.5, 0.5], "host_cpus": 32, "only": None,
        "queries": queries, "failed": [], "repeat": 3, "sf": 0.1,
    }
    rec.update(kw)
    return rec


def _write_runs(tmp_path, runs):
    os.makedirs(tmp_path, exist_ok=True)
    paths = []
    for i, r in enumerate(runs):
        p = str(tmp_path / f"run_{i}.json")
        with open(p, "w") as f:
            json.dump(r, f)
        paths.append(p)
    return paths


def test_bands_median_mad_and_guards(tmp_path):
    base = {"plan_a": 1.0, "plan_b": 0.2}
    jitter = [1.0, 1.02, 0.98, 1.05, 0.97]
    runs = [_run({k: round(v * j, 4) for k, v in base.items()})
            for j in jitter]
    bands = bands_mod.build(_write_runs(tmp_path, runs))
    assert set(bands["plans"]) == {"plan_a", "plan_b"}
    a = bands["plans"]["plan_a"]
    assert a["median"] == 1.0 and 0 < a["mad"] <= 0.03 and a["n"] == 5
    assert bands["measured"]["n_runs"] == 5

    # guards: wrong protocol inputs refuse loudly
    with pytest.raises(SystemExit, match="REPEAT=3"):
        bands_mod.build(_write_runs(tmp_path / "g1", [_run(base, repeat=1)]))
    with pytest.raises(SystemExit, match="failed"):
        bands_mod.build(
            _write_runs(tmp_path / "g2", [_run(base, failed=["plan_a"])])
        )
    runs2 = runs[:4] + [_run({"plan_a": 1.0, "plan_c": 0.2})]
    with pytest.raises(SystemExit, match="different plan sets"):
        bands_mod.build(_write_runs(tmp_path / "g3", runs2))


def test_checker_verdicts(tmp_path):
    base = {f"p{i}": 1.0 + i / 10 for i in range(8)}
    runs = [_run({k: round(v * j, 4) for k, v in base.items()})
            for j in (1.0, 1.02, 0.98, 1.05, 0.97)]
    bands = bands_mod.build(_write_runs(tmp_path, runs))

    # within bands: same timings pass
    ok = check_mod.check(_run(base, repeat=1), bands)
    assert ok["verdict"] == "within-bands" and ok["n_over"] == 0

    # one plan 2x over while the rest hold -> plan regression, named
    one = dict(base, p3=base["p3"] * 2)
    reg = check_mod.check(_run(one, repeat=1), bands)
    assert reg["verdict"] == "plan-regressions"
    assert [o["plan"] for o in reg["over"]] == ["p3"]
    assert reg["median_ratio"] < 1.1

    # broad uniform 1.5x elevation -> host contamination, not code
    busy = {k: v * 1.5 for k, v in base.items()}
    elev = check_mod.check(_run(busy, repeat=1), bands)
    assert elev["verdict"] == "elevated"
    assert elev["median_ratio"] == pytest.approx(1.5, abs=0.05)

    # a failed plan (-1 sentinel) is always surfaced
    fail = dict(base, p5=-1.0)
    f = check_mod.check(_run(fail, repeat=1), bands)
    assert any(o.get("note") == "FAILED in artifact" for o in f["over"])

    # a plan missing from the bands is reported, not crashed on
    extra = dict(base, brand_new_plan=0.4)
    e = check_mod.check(_run(extra, repeat=1), bands)
    assert e["plans_not_in_bands"] == ["brand_new_plan"]

    # sub-second stability: the abs floor absorbs scheduler jitter on
    # a 0.2s plan (0.2 -> 0.33 is +65% but only +0.13s: inside floor)
    tiny_runs = [_run({"t": 0.2}) for _ in range(5)]
    tb = bands_mod.build(_write_runs(tmp_path / "tiny", tiny_runs))
    t = check_mod.check(_run({"t": 0.33}, repeat=1), tb)
    assert t["verdict"] == "within-bands"
    t2 = check_mod.check(_run({"t": 0.40}, repeat=1), tb)
    assert t2["n_over"] == 1


def test_checker_recovers_driver_tail_capture(tmp_path):
    """The driver records only the last 2000 chars of bench stdout —
    the checker must recover the per-plan suffix from that fragment
    (first pair dropped: it may be cut mid-name) and mark the result
    partial."""
    base = {f"plan_{c}": 1.0 for c in "abcdefgh"}
    runs = [_run({k: round(v * j, 4) for k, v in base.items()})
            for j in (1.0, 1.02, 0.98, 1.05, 0.97)]
    bands = bands_mod.build(_write_runs(tmp_path, runs))

    full_line = json.dumps(_run(dict(base, plan_h=9.9)))
    artifact = {"n": 13, "rc": 0, "cpus": 32, "sf": 0.1,
                "tail": full_line[-120:]}  # mid-record fragment
    got = check_mod.check(artifact, bands)
    assert got["partial_from_tail"] is True
    assert 0 < got["n_plans"] < len(base)  # a suffix, not everything
    assert [o["plan"] for o in got["over"]] == ["plan_h"]
    # stamps in the tail (repeat/sf/host_cpus) are not mistaken for plans
    assert not {"repeat", "sf", "host_cpus"} & set(
        o["plan"] for o in got["over"]
    )

    # the summary line's n_only stamp must not surface as a phantom
    # plan (r13 self-review #4)
    art2 = {"tail": 'lan_x":1.0, "plan_h":9.9}, "n_only":0, "sf": 0.1}'}
    got2 = check_mod.check(art2, bands)
    assert got2["plans_not_in_bands"] == []  # neither n_only nor the cut pair
    assert [o["plan"] for o in got2["over"]] == ["plan_h"]


def test_bands_never_flag_their_own_sources(tmp_path):
    """Self-consistency: a noise model that flags the very runs it was
    built from is not a noise model — the threshold's band-max lower
    bound guarantees every source run checks within-bands."""
    base = {f"p{i}": 0.1 + i / 7 for i in range(12)}
    # heavy-tailed: one run has p3 4x slower (the json_recordize case)
    runs = []
    for j in (1.0, 1.02, 0.98, 1.05, 0.97):
        q = {k: round(v * j, 4) for k, v in base.items()}
        if j == 1.05:
            q["p3"] = round(base["p3"] * 4, 4)
        runs.append(_run(q))
    bands = bands_mod.build(_write_runs(tmp_path, runs))
    for r in runs:
        got = check_mod.check(dict(r, repeat=1), bands)
        assert got["verdict"] == "within-bands", got["over"]


def test_checker_adopts_matching_detail_sidecar(tmp_path):
    """VERDICT r13 #4: with a BENCH_DETAIL.json sidecar whose timings
    agree with every pair recovered from the driver's tail capture,
    the checker adopts the FULL per-plan map (partial_from_tail False);
    a sidecar from a different run (any tail-visible timing differs)
    is rejected and the tail fragment is used as before."""
    base = {f"plan_{c}": round(0.3 + i / 9, 4)
            for i, c in enumerate("abcdefghijkl")}
    runs = [_run({k: round(v * j, 4) for k, v in base.items()})
            for j in (1.0, 1.02, 0.98, 1.05, 0.97)]
    bands = bands_mod.build(_write_runs(tmp_path, runs))

    this_run = _run(base, repeat=1)
    full_line = json.dumps(this_run, separators=(",", ":"))
    artifact = {"n": 14, "rc": 0, "sf": 0.1, "tail": full_line[-140:]}

    got = check_mod.check(artifact, bands, detail=this_run)
    assert got["partial_from_tail"] is False
    assert got["n_plans"] == len(base)
    assert got["verdict"] == "within-bands"

    # same tail, stale sidecar: disagree on a tail-visible plan
    tail_only = check_mod.queries_from(artifact)[0]
    stale_key = sorted(tail_only)[0]
    stale = _run(dict(base, **{stale_key: 99.9}), repeat=1)
    got2 = check_mod.check(artifact, bands, detail=stale)
    assert got2["partial_from_tail"] is True
    assert got2["n_plans"] == len(tail_only) < len(base)


def test_bench_writes_detail_sidecar(tmp_path, monkeypatch, capsys):
    """bench.py's print_result_lines must persist the full line-1
    record to the BENCH_DETAIL sidecar (atomic, env-overridable) so
    the driver's 2000-char tail truncation stops losing timings."""
    import importlib.util as _ilu

    spec = _ilu.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    bench = _ilu.module_from_spec(spec)
    spec.loader.exec_module(bench)

    detail = tmp_path / "BENCH_DETAIL.json"
    monkeypatch.setenv("SPARK_GRAFT_BENCH_DETAIL", str(detail))
    timings = {f"plan_{i}": 0.1 * i for i in range(40)}
    bench.print_result_lines(timings, 12.3, 1, 0.1)
    line1 = capsys.readouterr().out.splitlines()[0]
    with open(detail) as f:
        side = json.load(f)
    assert side == json.loads(line1)
    assert side["queries"] == timings

    # "-" disables the sidecar
    detail.unlink()
    monkeypatch.setenv("SPARK_GRAFT_BENCH_DETAIL", "-")
    bench.print_result_lines(timings, 12.3, 1, 0.1)
    capsys.readouterr()
    assert not detail.exists()


def test_bench_tail_safe_query_chunks(monkeypatch, capsys):
    """r16 (VERDICT r15 #2): the per-plan map must be re-emitted as
    complete-JSON chunk lines small enough that (last chunk + final
    summary) fit a 2000-char tail capture, with line 1 and the final
    summary byte-identical to the prior contract."""
    import importlib.util as _ilu

    spec = _ilu.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    bench = _ilu.module_from_spec(spec)
    spec.loader.exec_module(bench)

    monkeypatch.setenv("SPARK_GRAFT_BENCH_DETAIL", "-")
    # realistic geometry: ~192 plans with ~18-char names
    timings = {
        f"plan_{'x' * 12}_{i:03d}": round(0.2 + 0.01 * i, 3)
        for i in range(192)
    }
    load = {"start": [0.1, 0.2, 0.3], "end": [0.4, 0.5, 0.6], "cpus": 32}
    bench.print_result_lines(timings, 123.4, 3, 0.1, load=load)
    lines = capsys.readouterr().out.splitlines()

    first, chunks, final = lines[0], lines[1:-1], lines[-1]
    # line 1 and the final summary keep the pre-r16 contract exactly
    assert json.loads(first)["queries"] == timings
    parsed_final = json.loads(final)
    assert parsed_final["metric"] == "total_wall_sec"
    assert "queries" not in parsed_final

    # chunks: complete JSON, bounded, reassemble to the identical map
    assert chunks, "expected at least one per-plan chunk line"
    seen: dict[str, float] = {}
    order: list[str] = []
    for i, line in enumerate(chunks, 1):
        rec = json.loads(line)
        assert rec["metric"] == "per_plan_sec"
        assert "value" not in rec
        assert rec["chunk"] == i and rec["n_chunks"] == len(chunks)
        assert len(line) <= bench._CHUNK_MAX_CHARS
        seen.update(rec["queries"])
        order.extend(rec["queries"])
    assert seen == timings
    assert order == sorted(timings)  # alphabetical across chunks
    # the tail-capture guarantee: last chunk + final line fit 2000 chars
    assert len(chunks[-1]) + len(final) + 2 <= 2000


def test_bench_detail_sidecar_skipped_for_restricted_runs(
    tmp_path, monkeypatch, capsys
):
    """A SPARK_GRAFT_ONLY re-measure must not clobber the full run's
    sidecar — the partial file would fail the checker's tail-agreement
    proof and silently drop coverage back to the tail fragment."""
    import importlib.util as _ilu

    spec = _ilu.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    bench = _ilu.module_from_spec(spec)
    spec.loader.exec_module(bench)

    detail = tmp_path / "BENCH_DETAIL.json"
    monkeypatch.setenv("SPARK_GRAFT_BENCH_DETAIL", str(detail))
    bench.print_result_lines({"p": 0.1}, 0.1, 1, 0.1, only=["p"])
    capsys.readouterr()
    assert not detail.exists()


def test_checker_load_normalized_verdict(tmp_path):
    """VERDICT r14 #4: a run captured under more host load than any of
    the bands' own measurement runs must self-classify as host-elevated
    (bands not comparable) instead of emitting dozens of false per-plan
    flags — and must hand back the exact settled-host re-measure
    command for the flagged set. BENCH_r14 (79 false flags, a full
    adjudication cycle) is the motivating artifact."""
    base = {f"p{i}": 1.0 + i / 10 for i in range(8)}
    runs = [_run({k: round(v * j, 4) for k, v in base.items()})
            for j in (1.0, 1.02, 0.98, 1.05, 0.97)]
    bands = bands_mod.build(_write_runs(tmp_path, runs))
    # per-component max over start [0.3,0.4,0.5] AND end [0.5,0.5,0.5]
    assert check_mod.load_envelope(bands) == [0.5, 0.5, 0.5]

    # uniformly 1.5x elevated AND captured over the bands' load
    # envelope -> host-elevated, with the re-measure command emitted
    busy = {k: v * 1.5 for k, v in base.items()}
    hot = check_mod.check(
        _run(busy, repeat=1, load_start=[2.5, 1.9, 1.2],
             load_end=[3.1, 2.2, 1.4]),
        bands,
    )
    assert hot["verdict"] == "host-elevated, bands not comparable"
    assert hot["load_exceeds_band_envelope"] is True
    assert "SPARK_GRAFT_ONLY=" in hot["remeasure_cmd"]
    assert "SPARK_GRAFT_REPEAT=3" in hot["remeasure_cmd"]
    for o in hot["over"]:
        assert o["plan"] in hot["remeasure_cmd"]

    # ONE component over the envelope suffices (r14's signature: 1-min
    # stamps looked settled, the 5-min stamp betrayed the busy window)
    one_comp = check_mod.check(
        _run(dict(base, p3=base["p3"] * 2), repeat=1,
             load_end=[0.3, 0.6, 0.5]),
        bands,
    )
    assert one_comp["verdict"] == "host-elevated, bands not comparable"

    # inside the envelope nothing changes: regression stays a
    # regression and carries the re-measure command too
    reg = check_mod.check(_run(dict(base, p3=base["p3"] * 2), repeat=1), bands)
    assert reg["verdict"] == "plan-regressions"
    assert "p3" in reg["remeasure_cmd"]

    # a clean run over the envelope is still clean — no flags means
    # the load never biased anything upward that matters
    clean = check_mod.check(
        _run(base, repeat=1, load_start=[9.0, 9.0, 9.0]), bands
    )
    assert clean["verdict"] == "within-bands"
    assert clean["remeasure_cmd"] is None

    # DRIVER capture shape: loads nest under "parsed", not top-level
    driver_shape = {
        "rc": 0,
        "tail": json.dumps({"queries": busy})[-2000:],
        "parsed": {"load_start": [2.5, 1.9, 1.2],
                   "load_end": [3.1, 2.2, 1.4], "sf": 0.1},
    }
    d = check_mod.check(driver_shape, bands)
    assert d["artifact_load"]["start"] == [2.5, 1.9, 1.2]
    assert d["verdict"] == "host-elevated, bands not comparable"

    # bands without load stamps: envelope unknown -> never host-gated
    nb = {k: (v if k != "measured" else {}) for k, v in bands.items()}
    nohost = check_mod.check(
        _run(busy, repeat=1, load_start=[9.0, 9.0, 9.0]), nb
    )
    assert nohost["verdict"] == "elevated"


def test_bench_final_refuses_dirty_tree(tmp_path):
    """scripts/bench_final.py (VERDICT r14 #1): the shipped-commit
    bench artifact must describe exactly one commit — a dirty working
    tree is refused before any JVM spins up (--allow-dirty overrides,
    marking the artifact)."""
    import subprocess
    import sys

    repo = os.path.join(os.path.dirname(__file__), "..")
    marker = os.path.join(repo, "_dirty_marker_for_test.tmp")
    with open(marker, "w") as f:
        f.write("x")
    try:
        out = subprocess.run(
            [sys.executable, "scripts/bench_final.py", "/tmp/never.json"],
            cwd=repo,
            capture_output=True,
            text=True,
            timeout=60,
        )
        assert out.returncode != 0
        assert "dirty" in (out.stderr + out.stdout)
        assert not os.path.exists("/tmp/never.json")
    finally:
        os.unlink(marker)
