"""Training-export tests: sharded JSONL round-trip, determinism, and
shard-assignment stability."""

from __future__ import annotations

import glob
import hashlib
import os


def _shard_digests(out_dir: str) -> dict[int, str]:
    out = {}
    for d in sorted(glob.glob(os.path.join(out_dir, "_shard=*"))):
        idx = int(os.path.basename(d).split("=")[1])
        blob = b"".join(
            open(f, "rb").read() for f in sorted(glob.glob(os.path.join(d, "*")))
        )
        out[idx] = hashlib.md5(blob).hexdigest()
    return out


def test_export_curated_jsonl_roundtrip_and_determinism(spark, tmp_path):
    """The exported JSONL must contain exactly the curated corpus (read
    back through a JSON parse and compared row-for-row), land in
    per-shard directories, and be BYTE-deterministic: a second export
    of the same corpus produces identical shard contents."""
    from venus_spark.export import export_curated_jsonl
    from venus_spark.plans.registry import all_plans

    sf = "/root/testdata/sf0.001"
    out1 = str(tmp_path / "exp1")
    n = export_curated_jsonl(spark, sf, out1, shards=4)

    curated = all_plans()["curated_corpus"].fn(spark, sf)
    want = sorted(tuple(r) for r in curated.collect())
    assert n == len(want) and n > 0

    back = spark.read.json(out1).select(*curated.columns)
    got = sorted(tuple(r) for r in back.collect())
    assert got == want

    d1 = _shard_digests(out1)
    assert 1 <= len(d1) <= 4 and set(d1) <= {0, 1, 2, 3}
    # one sorted file per shard directory
    for d in glob.glob(os.path.join(out1, "_shard=*")):
        assert len(glob.glob(os.path.join(d, "part-*"))) == 1

    out2 = str(tmp_path / "exp2")
    export_curated_jsonl(spark, sf, out2, shards=4)
    assert _shard_digests(out2) == d1


def test_export_shard_assignment_is_id_stable(spark, tmp_path):
    """Shard membership must be a pure function of the id — exporting a
    SUBSET of the corpus keeps every surviving document in the same
    shard index it had in the full export (the property that lets
    incremental re-exports and loaders reason about shard locality)."""
    import json

    from pyspark.sql import functions as F

    from venus_spark.export import export_jsonl
    from venus_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "lang"
    )
    full_dir = str(tmp_path / "full")
    sub_dir = str(tmp_path / "sub")
    export_jsonl(docs, full_dir, shards=4)
    export_jsonl(docs.filter(F.col("doc_id") % 2 == 0), sub_dir, shards=4)

    def shard_of(out_dir):
        m = {}
        for d in glob.glob(os.path.join(out_dir, "_shard=*")):
            idx = int(os.path.basename(d).split("=")[1])
            for f in glob.glob(os.path.join(d, "*")):
                for line in open(f):
                    m[json.loads(line)["doc_id"]] = idx
        return m

    full, sub = shard_of(full_dir), shard_of(sub_dir)
    assert sub and all(full[d] == s for d, s in sub.items())


def test_export_excludes_tombstoned_documents(spark, tmp_path, monkeypatch):
    """Review r5 #3: the curated funnel reads the unowned base table,
    so without the explicit anti-join a right-to-be-forgotten document
    would ride straight into the training hand-off. Tombstone a doc the
    funnel keeps and assert it is absent from the export."""
    import os
    import shutil

    from venus_spark import prepared
    from venus_spark.export import export_curated_jsonl
    from venus_spark.plans.registry import all_plans

    monkeypatch.setattr(prepared, "PREPARED_ROOT", str(tmp_path / "prep"))
    src = "/root/testdata/sf0.001"
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    for t in ("documents", "embeddings"):
        shutil.copytree(
            os.path.join(src, f"{t}.parquet"), os.path.join(sf, f"{t}.parquet")
        ) if os.path.isdir(os.path.join(src, f"{t}.parquet")) else shutil.copy(
            os.path.join(src, f"{t}.parquet"), os.path.join(sf, f"{t}.parquet")
        )

    kept = all_plans()["curated_corpus"].fn(spark, sf).select("doc_id").first()
    dead = int(kept["doc_id"])
    prepared.tombstone_documents(spark, sf, [dead], batch_id=0)

    out = str(tmp_path / "exp")
    export_curated_jsonl(spark, sf, out, shards=2)
    ids = {r["doc_id"] for r in spark.read.json(out).collect()}
    assert dead not in ids and len(ids) > 0


def test_export_rejects_nonpositive_shards(spark):
    """shards=0 would make every row's pmod shard NULL and land the
    corpus in a __HIVE_DEFAULT_PARTITION__ directory; refuse instead."""
    import pytest

    from venus_spark.export import export_jsonl
    from venus_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    with pytest.raises(ValueError, match="shards"):
        export_jsonl(docs, "/tmp/never-written", shards=0)


def test_export_manifest_certifies_and_detects_damage(spark, tmp_path):
    """Round 8: the export ships a self-certification manifest —
    per-shard row counts + order-independent content digests recomputed
    from the written files. verify_export returns no discrepancies on
    the intact artifact, the manifest is byte-deterministic across
    re-exports of the same corpus, and a damaged copy (a truncated
    shard, an injected line, a lost shard directory) is named
    per-shard instead of failing opaquely."""
    import json
    import os
    import shutil

    from venus_spark.export import (
        EXPORT_MANIFEST,
        export_jsonl,
        verify_export,
        write_export_manifest,
    )
    from venus_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text", "lang"
    )
    out = str(tmp_path / "exp")
    export_jsonl(docs, out, shards=3)
    manifest = write_export_manifest(spark, out)
    assert manifest["n_rows"] == docs.count()
    assert verify_export(spark, out) == []

    out2 = str(tmp_path / "exp2")
    export_jsonl(docs, out2, shards=3)
    m2 = write_export_manifest(spark, out2)
    assert m2 == manifest  # byte-deterministic exports ⇒ equal manifests

    # damage 1: inject a line into one shard. The local-fs .crc
    # sidecars are removed first — they model the realistic damaged
    # hand-off (rsync/object-store copies don't carry Hadoop's local
    # checksum files; the manifest exists precisely for that gap).
    shard0 = os.path.join(out, "_shard=0")
    for f in os.listdir(shard0):
        if f.endswith(".crc"):
            os.remove(os.path.join(shard0, f))
    victim = next(
        os.path.join(shard0, f)
        for f in os.listdir(shard0)
        if not f.startswith(("_", "."))
    )
    with open(victim, "a") as f:
        f.write('{"doc_id": 999999, "text": "injected", "lang": "xx"}\n')
    problems = verify_export(spark, out)
    assert len(problems) == 1 and problems[0].startswith("_shard=0")

    # damage 2: a lost shard directory is reported as missing
    shutil.rmtree(os.path.join(out2, "_shard=1"))
    problems2 = verify_export(spark, out2)
    assert len(problems2) == 1 and "_shard=1" in problems2[0]
    assert "actual None" in problems2[0]

    # damage 3 (review r8 pass-7 #1): a copy that lost EVERY shard —
    # partition discovery finds no _shard column; the verifier must
    # name all three missing shards, not crash
    for d in list(os.listdir(out2)):
        if d.startswith("_shard="):
            shutil.rmtree(os.path.join(out2, d))
    problems3 = verify_export(spark, out2)
    assert len(problems3) == 3 and all("actual None" in p for p in problems3)

    # an EMPTY export (zero rows) manifests and verifies cleanly
    out3 = str(tmp_path / "exp3")
    export_jsonl(docs.limit(0), out3, shards=3)
    m3 = write_export_manifest(spark, out3)
    assert m3["n_rows"] == 0 and m3["per_shard"] == {}
    assert verify_export(spark, out3) == []

    # the manifest file itself is well-formed JSON with sorted keys
    with open(os.path.join(out, EXPORT_MANIFEST)) as f:
        raw = json.load(f)
    assert raw["n_shards"] == 3 and set(raw["per_shard"]) == {"0", "1", "2"}


def test_bench_tail_contract_parses_from_2000_char_capture(monkeypatch):
    """VERDICT r7 #8: the driver records only the LAST 2000 characters
    of bench.py's stdout and tries to parse JSON from them. With 188
    long-named plans the per-plan line alone is ~6 KB, so the tail
    must end with a complete, parseable totals line — pinned here
    against a realistic fake registry without running any plan."""
    import contextlib
    import io
    import json

    import bench

    # synthetic timings must not clobber the repo-root sidecar a real
    # full bench run writes (BENCH_DETAIL.json); "-" disables it
    monkeypatch.setenv("SPARK_GRAFT_BENCH_DETAIL", "-")

    timings = {f"some_rather_long_plan_name_{i:03d}": 0.123 for i in range(188)}
    # a SYSTEMIC failure run (review r8 pass-7 #2): 60 failed plans —
    # the tail line must stay bounded via n_failed + a truncated list,
    # with the full failed list on line 1
    for i in range(60):
        timings[f"some_rather_long_plan_name_{i:03d}"] = -1.0
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench.print_result_lines(
            timings, 120.9, repeat=3, sf=0.1,
            load={"start": [1.23, 4.56, 7.89], "end": [0.12, 3.45, 6.78],
                  "cpus": 32},
        )
    out = buf.getvalue()
    lines = out.strip().split("\n")
    # r16: per-plan chunk re-emit lines sit between line 1 and the
    # final summary (test_bench_tail_safe_query_chunks pins them);
    # this test pins the two CONTRACT lines around them.
    assert len(lines) >= 2
    for mid in lines[1:-1]:
        assert json.loads(mid)["metric"] == "per_plan_sec"
    full = json.loads(lines[0])
    assert len(full["queries"]) == 188 and len(full["failed"]) == 60
    tail = out[-2000:]
    last_line = tail.strip().split("\n")[-1]
    summary = json.loads(last_line)  # the driver's view must parse
    assert summary["metric"] == "total_wall_sec"
    assert summary["value"] == 120.9 and summary["n_plans"] == 188
    assert summary["n_failed"] == 60 and len(summary["failed"]) == 10
    # host-state stamp (VERDICT r9 #3): both lines carry the load
    # averages + cpu count, making host contamination a one-field check
    for rec in (full, summary):
        assert rec["load_start"] == [1.23, 4.56, 7.89]
        assert rec["load_end"] == [0.12, 3.45, 6.78]
        assert rec["host_cpus"] == 32
    # a FULL run stamps only=None — a restricted (SPARK_GRAFT_ONLY)
    # re-measure stamps the plan list, so the two are distinguishable
    # from the artifact alone (review r10 #4)
    assert full["only"] is None and summary["only"] is None
    assert len(last_line) < 1900  # headroom inside any 2000-char capture
    # omitted load (an old caller) keeps the contract parseable
    buf2 = io.StringIO()
    with contextlib.redirect_stdout(buf2):
        bench.print_result_lines(timings, 120.9, repeat=3, sf=0.1)
    assert json.loads(
        buf2.getvalue().strip().split("\n")[-1]
    )["load_start"] is None
    # the real stamp helper returns three floats on this platform
    assert len(bench._host_load()) == 3


def _snap_corpus_rows():
    """Ten quality-gate-passing documents with deliberate doc_id GAPS
    (so an appended near-dup can take a SMALLER id than its base twin
    and flip the cluster keeper). >=20 whitespace tokens each, all
    distinct (TTR 1.0), no stopword saturation."""
    def words(seed):
        return " ".join(f"w{seed}x{k}" for k in range(24))

    return [
        (30 + 10 * i, words(i), "en", "web", 24 * 6)
        for i in range(10)  # ids 30,40,...,120
    ]


def test_export_snapshot_reexport_byte_identical_after_append(
    spark, tmp_path, monkeypatch
):
    """VERDICT r8 #3 (reproducible exports): every export pins its
    corpus file sets in the manifest; a re-export with that snapshot
    after later APPENDS is byte-identical, while the unpinned re-export
    sees the appended rows' funnel effects. Here the appended document
    is a near-dup of a base document with a SMALLER id, so unpinned
    curation flips the cluster keeper and DROPS the base doc — the
    exact drift the snapshot exists to freeze out."""
    import json
    import os

    from venus_spark import prepared
    from venus_spark.export import EXPORT_MANIFEST, export_curated_jsonl

    monkeypatch.setattr(prepared, "PREPARED_ROOT", str(tmp_path / "prep"))
    sf = str(tmp_path / "sf")
    rows = _snap_corpus_rows()
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(os.path.join(sf, "documents.parquet"))

    out1 = str(tmp_path / "exp1")
    n1 = export_curated_jsonl(spark, sf, out1, shards=4)
    assert n1 == len(rows)
    with open(os.path.join(out1, EXPORT_MANIFEST)) as f:
        m1 = json.load(f)
    assert set(m1["snapshot"]) == {"documents", "documents_minhash"}

    # the append: byte-identical text of doc 40, id 35 (< 40), landed
    # in the BASE table AND indexed (r13 whole-file review #6 changed
    # the index-only variant of this fixture: an index row whose
    # document is not in the snapshot's table no longer influences the
    # funnel — that was the neither-copy-ships bug, now semi-joined
    # out). With the document really landed, the unpinned funnel
    # clusters {35, 40} with keeper 35 and drops 40.
    dup_of_40 = spark.createDataFrame(
        [(35, rows[1][1], "en", "web", rows[1][4])],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    dup_of_40.coalesce(1).write.mode("append").parquet(
        os.path.join(sf, "documents.parquet")
    )
    prepared.append_documents_batch(spark, sf, dup_of_40, batch_id=1)

    out_unpinned = str(tmp_path / "exp_unpinned")
    export_curated_jsonl(spark, sf, out_unpinned, shards=4)
    unpinned_ids = {r["doc_id"] for r in spark.read.json(out_unpinned).collect()}
    assert 40 not in unpinned_ids  # the append really changed the funnel
    assert 35 in unpinned_ids  # and the surviving copy actually ships

    # pinned re-export: byte-identical to the original
    out2 = str(tmp_path / "exp2")
    export_curated_jsonl(spark, sf, out2, shards=4, snapshot=m1["snapshot"])
    with open(os.path.join(out2, EXPORT_MANIFEST)) as f:
        m2 = json.load(f)
    assert m2["per_shard"] == m1["per_shard"]
    assert m2["snapshot"] == m1["snapshot"]
    assert _shard_digests(out2) == _shard_digests(out1)


def test_export_snapshot_tombstone_overrides_reproducibility(
    spark, tmp_path, monkeypatch
):
    """The stated contract: CURRENT tombstones always apply on top of a
    pinned snapshot — a right-to-be-forgotten delete wins over
    reproducibility, so the pinned re-export differs by exactly the
    deleted document. And a snapshot whose files a rewrite removed
    refuses LOUDLY instead of silently exporting a different corpus."""
    import json
    import os
    import shutil

    import pytest

    from venus_spark import prepared
    from venus_spark.export import EXPORT_MANIFEST, export_curated_jsonl

    monkeypatch.setattr(prepared, "PREPARED_ROOT", str(tmp_path / "prep"))
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        _snap_corpus_rows(),
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(os.path.join(sf, "documents.parquet"))

    out1 = str(tmp_path / "exp1")
    export_curated_jsonl(spark, sf, out1, shards=2)
    with open(os.path.join(out1, EXPORT_MANIFEST)) as f:
        snap = json.load(f)["snapshot"]
    ids1 = {r["doc_id"] for r in spark.read.json(out1).collect()}
    assert 50 in ids1

    prepared.tombstone_documents(spark, sf, [50], batch_id=0)
    out2 = str(tmp_path / "exp2")
    export_curated_jsonl(spark, sf, out2, shards=2, snapshot=snap)
    ids2 = {r["doc_id"] for r in spark.read.json(out2).collect()}
    assert ids2 == ids1 - {50}  # RTBF overrides reproducibility

    # a rewrite that replaced the snapshot's files (here: the vacuum
    # rewriting the MinHash index) expires the snapshot — loudly
    assert prepared.vacuum_document_tombstones(spark, sf) > 0
    with pytest.raises(ValueError, match="no longer materializable"):
        export_curated_jsonl(
            spark, sf, str(tmp_path / "exp3"), shards=2, snapshot=snap
        )
    # ...and a fresh unpinned export works and re-pins
    out4 = str(tmp_path / "exp4")
    export_curated_jsonl(spark, sf, out4, shards=2)
    assert {r["doc_id"] for r in spark.read.json(out4).collect()} == ids2


def test_export_delta_jsonl_incremental_curation(spark, tmp_path, monkeypatch):
    """O(delta) incremental export: current-minus-base file sets ARE
    the landed delta (parquet part files are immutable; appends only
    add). Pins: (a) calling before the delta is indexed raises the
    coverage guard (unscreened dedup would be a silent lie); (b) the
    funnel over the delta drops a low-quality doc, a bench-contaminated
    doc, a within-delta duplicate, AND — the incremental kernel — a
    near-dup of an ALREADY-EXPORTED base document; (c) the manifest
    chains (delta_of digest + base snapshot + current snapshot), and a
    follow-up delta against the new snapshot is empty; (d) a base file
    vanishing (compaction/vacuum) makes 'since' undefined — loud."""
    import json
    import os

    import pytest

    from venus_spark import prepared
    from venus_spark.export import (
        EXPORT_MANIFEST,
        corpus_snapshot,
        export_delta_jsonl,
        snapshot_digest,
        verify_export,
    )

    monkeypatch.setattr(prepared, "PREPARED_ROOT", str(tmp_path / "prep"))
    sf = str(tmp_path / "sf")
    doc_dir = os.path.join(sf, "documents.parquet")
    schema = "doc_id long, text string, lang string, source string, n_chars long"

    def words(seed, n=24):
        return " ".join(f"w{seed}x{k}" for k in range(n))

    bench_text = words("bench", 24)  # doc_id < 20 plays the benchmark set
    base_rows = [(5, bench_text, "en", "bench", len(bench_text))] + [
        (30 + 10 * i, words(i), "en", "web", 24 * 6) for i in range(10)
    ]
    spark.createDataFrame(base_rows, schema).coalesce(1).write.parquet(doc_dir)
    base_snap = corpus_snapshot(spark, sf)  # also ensures the mh index

    # the delta: one clean doc; a verbatim copy of base doc 40 (cross-set
    # near-dup); a within-delta identical pair (keeper = smaller id); a
    # 5-token doc (quality gate); a doc carrying a bench 5-gram (decontam)
    contaminated = " ".join(bench_text.split()[:5]) + " " + words("tail", 19)
    delta_rows = [
        (9001, words("new"), "en", "web", 144),
        (9002, base_rows[2][1], "en", "web", 144),   # dup of base 40
        (9003, words("twin"), "en", "web", 144),
        (9004, words("twin"), "en", "web", 144),     # within-delta dup
        (9005, "too short to pass", "en", "web", 18),
        (9006, contaminated, "en", "web", len(contaminated)),
    ]
    delta_df = spark.createDataFrame(delta_rows, schema)
    delta_df.coalesce(1).write.mode("append").parquet(doc_dir)

    # (a) index lags the corpus -> loud, BEFORE any shard is written
    out = str(tmp_path / "delta1")
    with pytest.raises(ValueError, match="MinHash index"):
        export_delta_jsonl(spark, sf, out, base_snap, shards=4)
    assert not os.path.exists(out)

    prepared.write_minhash_pending(sf, delta_df, batch_id=1)

    # (b) the curated delta
    manifest = export_delta_jsonl(spark, sf, out, base_snap, shards=4)
    got = {r["doc_id"] for r in spark.read.json(out).collect()}
    assert got == {9001, 9003}
    assert manifest["n_rows"] == 2
    assert verify_export(spark, out) == []

    # (c) chaining: delta_of names the base; the embedded base snapshot
    # re-derives the delta; next delta against the new snapshot is empty
    with open(os.path.join(out, EXPORT_MANIFEST)) as f:
        m = json.load(f)
    assert m["delta_of"] == snapshot_digest(base_snap)
    assert m["base_snapshot"] == base_snap
    assert set(m["snapshot"]["documents"]) > set(base_snap["documents"])
    out2 = str(tmp_path / "delta2")
    m2 = export_delta_jsonl(spark, sf, out2, m["snapshot"], shards=4)
    assert m2["n_rows"] == 0 and m2["n_shards"] == 0
    assert m2["delta_of"] == snapshot_digest(m["snapshot"])

    # (d) history rewritten -> 'since' undefined, loud
    victim = os.path.join(doc_dir, sorted(base_snap["documents"])[0])
    os.remove(victim)
    with pytest.raises(ValueError, match="no longer materializable"):
        export_delta_jsonl(
            spark, sf, str(tmp_path / "delta3"), base_snap, shards=4
        )


def test_export_delta_single_file_table(spark, tmp_path, monkeypatch):
    """A single-file documents table (the small-SF driver layout) pins
    as __self__:<size>: equal snapshots yield an EMPTY chaining delta;
    a changed file is an in-place rewrite — delta undefined, loud."""
    import json
    import os

    import pytest

    from venus_spark import prepared
    from venus_spark.export import corpus_snapshot, export_delta_jsonl

    monkeypatch.setattr(prepared, "PREPARED_ROOT", str(tmp_path / "prep"))
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    os.symlink(
        "/root/testdata/sf0.001/documents.parquet",
        os.path.join(sf, "documents.parquet"),
    )
    snap = corpus_snapshot(spark, sf)
    m = export_delta_jsonl(spark, sf, str(tmp_path / "d1"), snap, shards=2)
    assert m["n_rows"] == 0
    forged = dict(snap, documents=["__self__:1"])
    with pytest.raises(ValueError, match="in-place rewrite"):
        export_delta_jsonl(spark, sf, str(tmp_path / "d2"), forged, shards=2)


def test_export_delta_chain_never_ships_a_doc_twice(
    spark, tmp_path, monkeypatch
):
    """Chained exports (full -> delta1 -> delta2) partition the curated
    corpus: no doc_id ships twice anywhere in the chain, each delta's
    base is the previous manifest's snapshot, and a near-dup landing in
    delta2 of a doc exported in delta1 is screened by the incremental
    kernel even though neither is in the base export."""
    import json
    import os

    from venus_spark import prepared
    from venus_spark.export import (
        EXPORT_MANIFEST,
        corpus_snapshot,
        export_curated_jsonl,
        export_delta_jsonl,
        snapshot_digest,
    )

    monkeypatch.setattr(prepared, "PREPARED_ROOT", str(tmp_path / "prep"))
    sf = str(tmp_path / "sf")
    doc_dir = os.path.join(sf, "documents.parquet")
    schema = "doc_id long, text string, lang string, source string, n_chars long"

    def words(seed, n=24):
        return " ".join(f"w{seed}x{k}" for k in range(n))

    base_rows = [(30 + 10 * i, words(i), "en", "web", 144) for i in range(6)]
    spark.createDataFrame(base_rows, schema).coalesce(1).write.parquet(doc_dir)

    out0 = str(tmp_path / "full")
    export_curated_jsonl(spark, sf, out0, shards=2)
    with open(os.path.join(out0, EXPORT_MANIFEST)) as f:
        snap0 = json.load(f)["snapshot"]

    d1_rows = [(9101, words("d1a"), "en", "web", 144),
               (9102, words("d1b"), "en", "web", 144)]
    d1 = spark.createDataFrame(d1_rows, schema)
    d1.coalesce(1).write.mode("append").parquet(doc_dir)
    prepared.write_minhash_pending(sf, d1, batch_id=1)
    out1 = str(tmp_path / "delta1")
    m1 = export_delta_jsonl(spark, sf, out1, snap0, shards=2)
    assert m1["delta_of"] == snapshot_digest(snap0)

    # delta2: one clean doc + a verbatim copy of a DELTA1 doc — the
    # cross-set screen must catch a dup of something exported in a
    # PREVIOUS DELTA, not just in the original base
    d2_rows = [(9201, words("d2a"), "en", "web", 144),
               (9202, d1_rows[0][1], "en", "web", 144)]
    d2 = spark.createDataFrame(d2_rows, schema)
    d2.coalesce(1).write.mode("append").parquet(doc_dir)
    prepared.write_minhash_pending(sf, d2, batch_id=2)
    out2 = str(tmp_path / "delta2")
    m2 = export_delta_jsonl(spark, sf, out2, m1["snapshot"], shards=2)
    assert m2["delta_of"] == snapshot_digest(m1["snapshot"])

    ids0 = {r["doc_id"] for r in spark.read.json(out0).collect()}
    ids1 = {r["doc_id"] for r in spark.read.json(out1).collect()}
    ids2 = {r["doc_id"] for r in spark.read.json(out2).collect()}
    assert ids0 == {r[0] for r in base_rows}
    assert ids1 == {9101, 9102}
    assert ids2 == {9201}  # 9202 screened against delta1's 9101
    assert not (ids0 & ids1) and not (ids1 & ids2) and not (ids0 & ids2)


def test_export_delta_tombstone_and_all_dup_edges(spark, tmp_path, monkeypatch):
    """Two delta edge semantics: (a) a delta that is ENTIRELY
    near-dups of already-exported docs produces a valid 0-row export
    (manifest chains, no shard dirs); (b) a delta doc duplicating a
    TOMBSTONED base doc SHIPS — the original is deleted, so the copy is
    now the corpus's only version (RTBF wins over dedup history; the
    live index the cross-set screen reads is tombstone-filtered)."""
    import json
    import os

    from venus_spark import prepared
    from venus_spark.export import (
        EXPORT_MANIFEST,
        corpus_snapshot,
        export_curated_jsonl,
        export_delta_jsonl,
    )

    monkeypatch.setattr(prepared, "PREPARED_ROOT", str(tmp_path / "prep"))
    sf = str(tmp_path / "sf")
    doc_dir = os.path.join(sf, "documents.parquet")
    schema = "doc_id long, text string, lang string, source string, n_chars long"

    def words(seed, n=24):
        return " ".join(f"w{seed}x{k}" for k in range(n))

    base_rows = [(30 + 10 * i, words(i), "en", "web", 144) for i in range(4)]
    spark.createDataFrame(base_rows, schema).coalesce(1).write.parquet(doc_dir)
    export_curated_jsonl(spark, sf, str(tmp_path / "full"), shards=2)
    with open(os.path.join(tmp_path / "full", EXPORT_MANIFEST)) as f:
        snap0 = json.load(f)["snapshot"]

    # tombstone base doc 30 AFTER the full export
    prepared.tombstone_documents(spark, sf, [30], batch_id=0)

    # delta: a copy of tombstoned 30 (should ship) + a copy of live 40
    # (screened) — "entirely dups" from the pre-delete perspective
    d_rows = [(9301, base_rows[0][1], "en", "web", 144),
              (9302, base_rows[1][1], "en", "web", 144)]
    d = spark.createDataFrame(d_rows, schema)
    d.coalesce(1).write.mode("append").parquet(doc_dir)
    prepared.write_minhash_pending(sf, d, batch_id=1)
    out1 = str(tmp_path / "d1")
    m1 = export_delta_jsonl(spark, sf, out1, snap0, shards=2)
    ids1 = {r["doc_id"] for r in spark.read.json(out1).collect()}
    assert ids1 == {9301}  # dup-of-tombstoned ships; dup-of-live screened
    assert m1["n_rows"] == 1

    # second delta entirely dups of exported docs -> valid 0-row export
    d2_rows = [(9401, base_rows[2][1], "en", "web", 144)]
    d2 = spark.createDataFrame(d2_rows, schema)
    d2.coalesce(1).write.mode("append").parquet(doc_dir)
    prepared.write_minhash_pending(sf, d2, batch_id=2)
    out2 = str(tmp_path / "d2")
    m2 = export_delta_jsonl(spark, sf, out2, m1["snapshot"], shards=2)
    assert m2["n_rows"] == 0 and m2["n_shards"] == 0
    assert os.path.exists(os.path.join(out2, EXPORT_MANIFEST))


def _delta_fixture(spark, tmp_path, monkeypatch, n_base=4, shards=2):
    """Common scaffolding for the delta-chain tests: a quality-passing
    base corpus written as one parquet file, prepared root redirected,
    and the full baseline export cut. Returns (sf, doc_dir, schema,
    words, snap0)."""
    import json
    import os

    from venus_spark import prepared
    from venus_spark.export import EXPORT_MANIFEST, export_curated_jsonl

    monkeypatch.setattr(prepared, "PREPARED_ROOT", str(tmp_path / "prep"))
    sf = str(tmp_path / "sf")
    doc_dir = os.path.join(sf, "documents.parquet")
    schema = "doc_id long, text string, lang string, source string, n_chars long"

    def words(seed, n=24):
        return " ".join(f"w{seed}x{k}" for k in range(n))

    base_rows = [(30 + 10 * i, words(i), "en", "web", 144) for i in range(n_base)]
    spark.createDataFrame(base_rows, schema).coalesce(1).write.parquet(doc_dir)
    out0 = str(tmp_path / "full")
    export_curated_jsonl(spark, sf, out0, shards=shards)
    with open(os.path.join(out0, EXPORT_MANIFEST)) as f:
        snap0 = json.load(f)["snapshot"]
    return sf, doc_dir, schema, words, snap0, out0


def test_export_delta_tombstoned_delta_doc_does_not_block_chain(
    spark, tmp_path, monkeypatch
):
    """Review r12 ADVICE #1 (high): a DELTA document tombstoned after
    landing has no live-index row BY DESIGN (the live index is
    tombstone-filtered), so the coverage guard must not count it as
    'unindexed' — the old behavior blocked the delta chain PERMANENTLY
    on a document that must not ship anyway. Pin: the export proceeds,
    ships only the live delta doc, and the tombstoned one is absent."""
    from venus_spark import prepared
    from venus_spark.export import export_delta_jsonl

    sf, doc_dir, schema, words, snap0, _ = _delta_fixture(
        spark, tmp_path, monkeypatch
    )
    d_rows = [(9001, words("live"), "en", "web", 144),
              (9002, words("rtbf"), "en", "web", 144)]
    d = spark.createDataFrame(d_rows, schema)
    d.coalesce(1).write.mode("append").parquet(doc_dir)
    prepared.write_minhash_pending(sf, d, batch_id=1)
    # the RTBF delete arrives AFTER the delta landed and was indexed
    prepared.tombstone_documents(spark, sf, [9002], batch_id=2)

    out = str(tmp_path / "d1")
    m = export_delta_jsonl(spark, sf, out, snap0, shards=2)
    ids = {r["doc_id"] for r in spark.read.json(out).collect()}
    assert ids == {9001}  # chain proceeds; tombstoned doc does not ship
    assert m["n_rows"] == 1 and "delta_of" in m

    # and the chain continues past it: next delta against m['snapshot']
    d2 = spark.createDataFrame([(9003, words("next"), "en", "web", 144)], schema)
    d2.coalesce(1).write.mode("append").parquet(doc_dir)
    prepared.write_minhash_pending(sf, d2, batch_id=3)
    out2 = str(tmp_path / "d2")
    m2 = export_delta_jsonl(spark, sf, out2, m["snapshot"], shards=2)
    assert {r["doc_id"] for r in spark.read.json(out2).collect()} == {9003}
    assert m2["n_rows"] == 1


def test_export_delta_base_screen_restricted_to_base_snapshot(
    spark, tmp_path, monkeypatch
):
    """Review r12 ADVICE #3 (low): the cross-set near-dup screen's base
    side must be the BASE SNAPSHOT's documents, not 'all live index rows
    minus delta ids' — an index row for a document the chain has NOT
    processed (here: an indexed-but-not-yet-landed newcomer, the same
    state a doc landing between snapshot cut and index read produces)
    must not suppress a delta doc, or neither copy would ever ship."""
    from venus_spark import prepared
    from venus_spark.export import export_delta_jsonl

    sf, doc_dir, schema, words, snap0, _ = _delta_fixture(
        spark, tmp_path, monkeypatch
    )
    shared_text = words("race")
    d = spark.createDataFrame([(9001, shared_text, "en", "web", 144)], schema)
    d.coalesce(1).write.mode("append").parquet(doc_dir)
    prepared.write_minhash_pending(sf, d, batch_id=1)
    # the newcomer: index rows exist (doc 9999, same text), but its
    # parquet has not landed in any snapshot the chain has processed
    phantom = spark.createDataFrame([(9999, shared_text, "en", "web", 144)], schema)
    prepared.write_minhash_pending(sf, phantom, batch_id=2)

    out = str(tmp_path / "d1")
    m = export_delta_jsonl(spark, sf, out, snap0, shards=2)
    ids = {r["doc_id"] for r in spark.read.json(out).collect()}
    # old behavior: 9999 sat on the base side and suppressed 9001 —
    # with neither ever shipping; the snapshot-restricted screen ships 9001
    assert ids == {9001}
    assert m["n_rows"] == 1


def test_export_delta_crash_chain_ships_each_doc_exactly_once(
    spark, tmp_path, monkeypatch
):
    """VERDICT r12 #3: kill the export at each torn point across a
    3-delta chain — (k1) between the shard write and the manifest
    write, (k2) inside the manifest write between the tmp write and the
    atomic rename — then resume. Pins: a torn export has NO manifest
    (never a lineage-less one: the complete manifest is ONE atomic
    write), verify_export NAMES the damage, the re-cut delta is
    content-identical, and the final valid chain ships every curated
    doc exactly once."""
    import json
    import os

    import pytest

    import venus_spark.export as exp
    from venus_spark import prepared
    from venus_spark.export import (
        EXPORT_MANIFEST,
        export_delta_jsonl,
        verify_export,
    )

    sf, doc_dir, schema, words, snap0, out0 = _delta_fixture(
        spark, tmp_path, monkeypatch
    )

    def land(rows, bid):
        d = spark.createDataFrame(rows, schema)
        d.coalesce(1).write.mode("append").parquet(doc_dir)
        prepared.write_minhash_pending(sf, d, batch_id=bid)

    # ---- delta 1, kill k1: after shards, before the manifest write
    land([(9101, words("d1a"), "en", "web", 144),
          (9102, words("d1b"), "en", "web", 144)], 1)
    torn1 = str(tmp_path / "d1_torn")
    with monkeypatch.context() as mctx:
        def killed(*a, **k):
            raise RuntimeError("killed before certification")
        mctx.setattr(exp, "write_export_manifest", killed)
        with pytest.raises(RuntimeError, match="killed"):
            export_delta_jsonl(spark, sf, torn1, snap0, shards=2)
    # torn state: shards on disk, NO manifest — and the verifier says so
    assert not os.path.exists(os.path.join(torn1, EXPORT_MANIFEST))
    probs = verify_export(spark, torn1)
    assert len(probs) == 1 and "missing" in probs[0]
    # resume: re-cut the SAME delta (base snapshot unchanged — the torn
    # artifact produced no manifest, so the chain never advanced)
    out1 = str(tmp_path / "d1")
    m1 = export_delta_jsonl(spark, sf, out1, snap0, shards=2)
    assert verify_export(spark, out1) == []
    assert _shard_digests(out1) == _shard_digests(torn1)  # deterministic re-cut

    # ---- delta 2, kill k2: inside the manifest write, tmp written but
    # not renamed — the single-atomic-write contract (ADVICE #2) means
    # the torn state is still "no manifest", never a lineage-less one
    land([(9201, words("d2a"), "en", "web", 144)], 2)
    torn2 = str(tmp_path / "d2_torn")
    real_replace = os.replace
    with monkeypatch.context() as mctx:
        def torn_replace(src, dst, *a, **k):
            if str(dst).endswith(EXPORT_MANIFEST):
                raise RuntimeError("killed between tmp write and rename")
            return real_replace(src, dst, *a, **k)
        mctx.setattr("venus_spark.export.os.replace", torn_replace)
        with pytest.raises(RuntimeError, match="killed"):
            export_delta_jsonl(spark, sf, torn2, m1["snapshot"], shards=2)
    assert os.path.exists(os.path.join(torn2, EXPORT_MANIFEST + ".tmp"))
    assert not os.path.exists(os.path.join(torn2, EXPORT_MANIFEST))
    probs2 = verify_export(spark, torn2)
    assert len(probs2) == 1 and "missing" in probs2[0]
    out2 = str(tmp_path / "d2")
    m2 = export_delta_jsonl(spark, sf, out2, m1["snapshot"], shards=2)
    assert verify_export(spark, out2) == []

    # ---- delta 3: clean
    land([(9301, words("d3a"), "en", "web", 144)], 3)
    out3 = str(tmp_path / "d3")
    m3 = export_delta_jsonl(spark, sf, out3, m2["snapshot"], shards=2)
    assert verify_export(spark, out3) == []

    # every manifest in the valid chain carries complete lineage (the
    # atomic write ships delta_of/base_snapshot WITH the digests)
    for out, prev in ((out1, snap0), (out2, m1["snapshot"]), (out3, m2["snapshot"])):
        with open(os.path.join(out, EXPORT_MANIFEST)) as f:
            m = json.load(f)
        assert m["base_snapshot"] == prev and "delta_of" in m and "per_shard" in m

    # exactly-once across the VALID chain (torn dirs are discard-flagged
    # by their missing manifest, so a loader never consumes them)
    chain_ids = []
    for out in (out0, out1, out2, out3):
        chain_ids.extend(r["doc_id"] for r in spark.read.json(out).collect())
    assert sorted(chain_ids) == sorted(set(chain_ids))  # no doc twice
    assert {9101, 9102, 9201, 9301} <= set(chain_ids)


def test_verify_export_chain_certifies_and_names_damage(
    spark, tmp_path, monkeypatch
):
    """Chain-level certification: a valid full->delta1->delta2 chain
    verifies clean; a reordered chain, a spliced-in foreign delta, a
    damaged shard, and a cross-directory duplicate are each NAMED with
    the offending directory (the loader-side gate for consuming a
    sequence of incremental hand-offs)."""
    import os
    import shutil

    from venus_spark import prepared
    from venus_spark.export import (
        export_delta_jsonl,
        export_jsonl,
        verify_export_chain,
        write_export_manifest,
    )

    sf, doc_dir, schema, words, snap0, out0 = _delta_fixture(
        spark, tmp_path, monkeypatch
    )

    def land(rows, bid):
        d = spark.createDataFrame(rows, schema)
        d.coalesce(1).write.mode("append").parquet(doc_dir)
        prepared.write_minhash_pending(sf, d, batch_id=bid)

    land([(9101, words("d1a"), "en", "web", 144)], 1)
    out1 = str(tmp_path / "d1")
    m1 = export_delta_jsonl(spark, sf, out1, snap0, shards=2)
    land([(9201, words("d2a"), "en", "web", 144)], 2)
    out2 = str(tmp_path / "d2")
    export_delta_jsonl(spark, sf, out2, m1["snapshot"], shards=2)

    chain = [out0, out1, out2]
    assert verify_export_chain(spark, chain) == []

    # reordered chain: both lineage links break, each named
    probs = verify_export_chain(spark, [out0, out2, out1])
    assert len(probs) == 4  # 2 dirs x (delta_of + base_snapshot)
    assert all("does not chain" in p or "base_snapshot differs" in p
               for p in probs)

    # a full export spliced mid-chain is named as not-a-delta
    probs = verify_export_chain(spark, [out0, out0, out1])
    assert any("only position 0" in p for p in probs)

    # damaged shard in one link -> named with the directory
    out2_bad = str(tmp_path / "d2_bad")
    shutil.copytree(out2, out2_bad)
    shard = next(
        os.path.join(out2_bad, d) for d in os.listdir(out2_bad)
        if d.startswith("_shard=")
    )
    for f in os.listdir(shard):
        if f.endswith(".crc"):
            os.remove(os.path.join(shard, f))
    victim = next(
        os.path.join(shard, f) for f in os.listdir(shard)
        if not f.startswith(("_", "."))
    )
    with open(victim, "a") as f:
        f.write('{"doc_id": 424242, "text": "injected"}\n')
    probs = verify_export_chain(spark, [out0, out1, out2_bad])
    assert len(probs) == 1 and probs[0].startswith(out2_bad)

    # a duplicate doc across directories -> exactly-once violation
    # (forged: re-export doc 9101's row into a directory wearing d2's
    # manifest lineage — digests valid, chain lineage valid, so only
    # the global layer can catch it)
    out_dup = str(tmp_path / "dup")
    docs_9101 = spark.read.json(out1)
    export_jsonl(docs_9101, out_dup, shards=2)
    m2_manifest = dict(
        write_export_manifest(spark, out_dup),
        **{k: v for k, v in _read_json(
            os.path.join(out2, "_export_manifest.json")).items()
           if k in ("delta_of", "base_snapshot", "snapshot")},
    )
    import json as _json
    with open(os.path.join(out_dup, "_export_manifest.json"), "w") as f:
        _json.dump(m2_manifest, f, sort_keys=True)
    probs = verify_export_chain(spark, [out0, out1, out_dup])
    assert any("shipped 2x" in p and "not a partition" in p for p in probs)


def _read_json(path):
    import json

    with open(path) as f:
        return json.load(f)


def test_cli_export_delta_and_verify_chain(spark, tmp_path, monkeypatch, capsys):
    """The operational surface: `export --delta-from <prior>` continues
    a chain from a prior export's manifest, `verify-export` certifies a
    single dir or a whole chain (exit 0), names damage (exit 1), and
    --snapshot-from/--delta-from are mutually exclusive."""
    import os
    import shutil

    from venus_spark import prepared
    from venus_spark.__main__ import main

    sf, doc_dir, schema, words, snap0, out0 = _delta_fixture(
        spark, tmp_path, monkeypatch
    )
    d = spark.createDataFrame(
        [(9101, words("d1a"), "en", "web", 144)], schema
    )
    d.coalesce(1).write.mode("append").parquet(doc_dir)
    prepared.write_minhash_pending(sf, d, batch_id=1)

    out1 = str(tmp_path / "d1")
    rc = main(["export", out1, "--sf", sf, "--shards", "2",
               "--delta-from", out0])
    assert rc == 0
    assert "exported delta of 1 document(s)" in capsys.readouterr().out

    # mutual exclusion is a usage error
    rc = main(["export", str(tmp_path / "x"), "--sf", sf,
               "--snapshot-from", out0, "--delta-from", out0])
    assert rc == 2
    assert "mutually exclusive" in capsys.readouterr().err

    # verify: single dir, then the chain
    assert main(["verify-export", out1]) == 0
    assert main(["verify-export", out0, out1]) == 0
    assert "chain verified" in capsys.readouterr().out

    # reordered chain fails with named lineage breaks
    rc = main(["verify-export", out1, out0])
    assert rc == 1
    assert "not a delta export" in capsys.readouterr().out

    # damaged copy fails loudly
    out1_bad = str(tmp_path / "d1_bad")
    shutil.copytree(out1, out1_bad)
    shard = next(
        os.path.join(out1_bad, s) for s in os.listdir(out1_bad)
        if s.startswith("_shard=")
    )
    for f in os.listdir(shard):
        if f.endswith(".crc"):
            os.remove(os.path.join(shard, f))
    victim = next(
        os.path.join(shard, f) for f in os.listdir(shard)
        if not f.startswith(("_", "."))
    )
    with open(victim, "a") as f:
        f.write('{"doc_id": 1, "text": "x"}\n')
    assert main(["verify-export", out1_bad]) == 1


def _damage_shard(out_dir, k, mode="truncate"):
    import os
    import shutil

    d = os.path.join(out_dir, f"_shard={k}")
    if mode == "remove":
        shutil.rmtree(d)
        return
    for f in os.listdir(d):
        if f.endswith(".crc"):
            os.remove(os.path.join(d, f))
    victim = next(
        os.path.join(d, f) for f in os.listdir(d)
        if not f.startswith(("_", "."))
    )
    if mode == "truncate":
        lines = open(victim).read().splitlines()
        with open(victim, "w") as f:
            f.write("\n".join(lines[:-1]) + ("\n" if lines[:-1] else ""))
    else:  # inject
        with open(victim, "a") as f:
            f.write('{"doc_id": 987654, "text": "injected"}\n')


def test_repair_export_rebuilds_only_damaged_shards(
    spark, tmp_path, monkeypatch
):
    """Repair leg of the hand-off surface: truncate one shard, delete
    another, inject a foreign shard dir — repair re-materializes
    exactly those from the pinned snapshot, removes the foreign dir,
    and the result is byte-identical to the original export. Undamaged
    shard files are NOT rewritten (their mtimes prove O(damaged))."""
    import os
    import shutil

    from venus_spark import prepared
    from venus_spark.export import repair_export, verify_export

    sf, doc_dir, schema, words, snap0, out0 = _delta_fixture(
        spark, tmp_path, monkeypatch, n_base=12, shards=6
    )
    baseline = _shard_digests(out0)
    damaged = sorted(baseline)[:2]
    assert len(baseline) >= 3, "need an undamaged shard for the mtime probe"
    untouched = sorted(baseline)[-1]
    untouched_files = {
        f: os.path.getmtime(os.path.join(out0, f"_shard={untouched}", f))
        for f in os.listdir(os.path.join(out0, f"_shard={untouched}"))
    }
    _damage_shard(out0, damaged[0], "truncate")
    _damage_shard(out0, damaged[1], "remove")
    os.makedirs(os.path.join(out0, "_shard=9"))
    shutil.copy(
        next(
            os.path.join(out0, f"_shard={untouched}", f)
            for f in untouched_files if not f.startswith(("_", "."))
        ),
        os.path.join(out0, "_shard=9", "part-injected.txt"),
    )
    assert verify_export(spark, out0) != []

    result = repair_export(spark, sf, out0)
    assert result["repaired"] == damaged
    assert result["removed"] == [9]
    assert result["row_drift"] == {} and result["problems"] == []
    assert verify_export(spark, out0) == []
    assert _shard_digests(out0) == baseline  # byte-identical repair
    for f, mt in untouched_files.items():
        assert os.path.getmtime(
            os.path.join(out0, f"_shard={untouched}", f)
        ) == mt  # undamaged shards untouched


def test_repair_export_delta_lineage_aware(spark, tmp_path, monkeypatch):
    """A DELTA export repairs through the delta-curation core (base
    snapshot + pinned current snapshot re-derive the same curated
    delta), so damage to an incremental hand-off also costs O(damaged),
    not a re-export of the chain."""
    from venus_spark import prepared
    from venus_spark.export import repair_export, verify_export

    sf, doc_dir, schema, words, snap0, out0 = _delta_fixture(
        spark, tmp_path, monkeypatch
    )
    d = spark.createDataFrame(
        [(9101 + i, words(f"d{i}"), "en", "web", 144) for i in range(6)],
        schema,
    )
    d.coalesce(1).write.mode("append").parquet(doc_dir)
    prepared.write_minhash_pending(sf, d, batch_id=1)
    from venus_spark.export import export_delta_jsonl

    out1 = str(tmp_path / "d1")
    export_delta_jsonl(spark, sf, out1, snap0, shards=3)
    baseline = _shard_digests(out1)
    victim = sorted(baseline)[0]
    _damage_shard(out1, victim, "inject")
    result = repair_export(spark, sf, out1)
    assert result["repaired"] == [victim] and result["problems"] == []
    assert _shard_digests(out1) == baseline


def test_repair_export_reports_rtbf_drift(spark, tmp_path, monkeypatch):
    """RTBF wins over reproducibility in repair too: tombstone a doc
    AFTER the export, damage its shard — the repaired shard legitimately
    lacks the deleted doc, the manifest is recomputed, verify passes,
    and the row drift is REPORTED, never papered over."""
    import json
    import os

    from venus_spark import prepared
    from venus_spark.export import (
        read_export_manifest,
        repair_export,
        verify_export,
    )

    sf, doc_dir, schema, words, snap0, out0 = _delta_fixture(
        spark, tmp_path, monkeypatch, n_base=6
    )
    rows_before = read_export_manifest(out0)["n_rows"]
    # find a doc and its shard from the landed files
    some = spark.read.json(out0).select("doc_id").first()["doc_id"]
    import pyspark.sql.functions as F

    modulus = read_export_manifest(out0)["shard_modulus"]
    shard_of = (
        spark.range(1)
        .select(
            F.pmod(F.xxhash64(F.lit(int(some)).cast("long")), F.lit(modulus))
        )
        .first()[0]
    )
    prepared.tombstone_documents(spark, sf, [int(some)], batch_id=0)
    _damage_shard(out0, int(shard_of), "truncate")
    result = repair_export(spark, sf, out0)
    assert result["problems"] == []
    assert list(result["row_drift"]) == [int(shard_of)]
    before, after = result["row_drift"][int(shard_of)]
    assert before - after == 1  # exactly the deleted doc
    assert read_export_manifest(out0)["n_rows"] == rows_before - 1
    ids = {r["doc_id"] for r in spark.read.json(out0).collect()}
    assert int(some) not in ids
    assert verify_export(spark, out0) == []


def test_repair_export_refusals(spark, tmp_path, monkeypatch):
    """Cannot-repair states are loud: no manifest (torn export),
    pre-modulus manifest (unknown shard function)."""
    import json
    import os

    import pytest

    from venus_spark.export import EXPORT_MANIFEST, repair_export

    sf, doc_dir, schema, words, snap0, out0 = _delta_fixture(
        spark, tmp_path, monkeypatch
    )
    mp = os.path.join(out0, EXPORT_MANIFEST)
    with open(mp) as f:
        manifest = json.load(f)
    legacy = {k: v for k, v in manifest.items() if k != "shard_modulus"}
    with open(mp, "w") as f:
        json.dump(legacy, f)
    with pytest.raises(ValueError, match="shard_modulus"):
        repair_export(spark, sf, out0)
    os.remove(mp)
    with pytest.raises(ValueError, match="no manifest"):
        repair_export(spark, sf, out0)


def test_cli_repair_export(spark, tmp_path, monkeypatch, capsys):
    """`repair-export` drives the same path operationally: exit 0 with
    a JSON result on success, exit 2 with guidance when unrepairable."""
    import json
    import os

    from venus_spark.__main__ import main

    sf, doc_dir, schema, words, snap0, out0 = _delta_fixture(
        spark, tmp_path, monkeypatch
    )
    baseline = _shard_digests(out0)
    _damage_shard(out0, sorted(baseline)[0], "truncate")
    rc = main(["repair-export", out0, "--sf", sf])
    assert rc == 0
    out = capsys.readouterr().out
    assert json.loads(out.strip().splitlines()[-1])["repaired"] == [
        sorted(baseline)[0]
    ]
    assert _shard_digests(out0) == baseline

    os.remove(os.path.join(out0, "_export_manifest.json"))
    rc = main(["repair-export", out0, "--sf", sf])
    assert rc == 2
    assert "re-export" in capsys.readouterr().err


def test_verify_export_chain_review_hardenings(spark, tmp_path, monkeypatch):
    """r13 self-review fixes, pinned: (1) a chain whose position 0 is a
    DELTA export (full base lost/truncated) is named, not certified;
    (2) a dir that lost EVERY shard while its manifest says n_rows>0 is
    reported by the digest layer instead of crashing schema inference;
    (3) a systemic duplicate overlap reports a bounded list WITH an
    explicit more-beyond-the-cap marker."""
    import os
    import shutil

    from venus_spark import prepared
    from venus_spark.export import (
        export_delta_jsonl,
        export_jsonl,
        verify_export_chain,
        write_export_manifest,
    )

    sf, doc_dir, schema, words, snap0, out0 = _delta_fixture(
        spark, tmp_path, monkeypatch
    )
    d = spark.createDataFrame(
        [(9101, words("d1a"), "en", "web", 144)], schema
    )
    d.coalesce(1).write.mode("append").parquet(doc_dir)
    prepared.write_minhash_pending(sf, d, batch_id=1)
    out1 = str(tmp_path / "d1")
    export_delta_jsonl(spark, sf, out1, snap0, shards=2)

    # (1) prefix-truncated chain: deltas only
    probs = verify_export_chain(spark, [out1])
    assert len(probs) == 1 and "full base export is missing" in probs[0]

    # (2) all shards lost, manifest intact: named per-shard, no crash
    out0_lost = str(tmp_path / "full_lost")
    shutil.copytree(out0, out0_lost)
    for e in list(os.listdir(out0_lost)):
        if e.startswith("_shard="):
            shutil.rmtree(os.path.join(out0_lost, e))
    probs = verify_export_chain(spark, [out0_lost, out1])
    assert probs and all(p.startswith(out0_lost) for p in probs)
    assert all("actual None" in p for p in probs)

    # (3) systemic overlap: 25 duplicated ids -> 20 named + a marker
    many = spark.createDataFrame(
        [(5000 + i, words(f"m{i}"), "en") for i in range(25)],
        "doc_id long, text string, lang string",
    )
    a_dir, b_dir = str(tmp_path / "ova"), str(tmp_path / "ovb")
    export_jsonl(many, a_dir, shards=2)
    write_export_manifest(spark, a_dir, snapshot=snap0)
    export_jsonl(many, b_dir, shards=2)
    write_export_manifest(spark, b_dir, snapshot=snap0)
    probs = verify_export_chain(spark, [a_dir, b_dir])
    dup_lines = [p for p in probs if "shipped 2x" in p]
    marker = [p for p in probs if "beyond the 20 reported" in p]
    assert len(dup_lines) == 20 and len(marker) == 1


def test_repair_export_delta_expired_snapshot_is_loud(
    spark, tmp_path, monkeypatch
):
    """r13 self-review #3: repairing a delta export whose pinned delta
    files were compacted away refuses with the expired-snapshot
    ValueError (CLI exit 2), never a raw Spark path error."""
    import os

    import pytest

    from venus_spark import prepared
    from venus_spark.__main__ import main
    from venus_spark.export import export_delta_jsonl, repair_export

    sf, doc_dir, schema, words, snap0, out0 = _delta_fixture(
        spark, tmp_path, monkeypatch
    )
    d = spark.createDataFrame(
        [(9101, words("d1a"), "en", "web", 144)], schema
    )
    d.coalesce(1).write.mode("append").parquet(doc_dir)
    prepared.write_minhash_pending(sf, d, batch_id=1)
    out1 = str(tmp_path / "d1")
    m1 = export_delta_jsonl(spark, sf, out1, snap0, shards=2)

    shard = sorted(int(k) for k in m1["per_shard"])[0]
    _damage_shard(out1, shard, "truncate")
    # compaction: the delta's pinned part file is gone
    delta_file = sorted(
        set(m1["snapshot"]["documents"]) - set(snap0["documents"])
    )[0]
    os.remove(os.path.join(doc_dir, delta_file))
    with pytest.raises(ValueError, match="no longer materializable"):
        repair_export(spark, sf, out1)
    rc = main(["repair-export", out1, "--sf", sf])
    assert rc == 2


def test_relay_queue_max_requires_stdin(tmp_path):
    """r13 self-review #5: --queue-max in zmq mode would be silently
    unused (the admission queue is the stdin handoff) — loud refusal,
    same posture as --port with --connect."""
    import subprocess
    import sys

    script = os.path.join(
        os.path.dirname(__file__), "..", "scripts", "zmq_relay.py"
    )
    proc = subprocess.run(
        [sys.executable, script, "--landing", str(tmp_path),
         "--queue-max", "1024"],
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert proc.returncode == 2
    assert "--stdin only" in proc.stderr


def test_export_hardening_pass2(spark, tmp_path, monkeypatch):
    """r13 whole-file review fixes, pinned: (1) a corrupt/truncated
    manifest is NAMED damage, per-dir in a chain too; (2) a foreign
    non-integer `_shard=junk` directory is named by verify and removed
    by repair, never crashed on; (3) an empty delta aimed at an
    EXISTING export directory refuses instead of re-certifying its
    stale shards under delta lineage."""
    import json
    import os

    import pytest

    from venus_spark.export import (
        EXPORT_MANIFEST,
        export_delta_jsonl,
        repair_export,
        verify_export,
        verify_export_chain,
    )

    sf, doc_dir, schema, words, snap0, out0 = _delta_fixture(
        spark, tmp_path, monkeypatch
    )

    # (2) foreign non-integer shard dir
    junk = os.path.join(out0, "_shard=junk")
    os.makedirs(junk)
    with open(os.path.join(junk, "part-x.txt"), "w") as f:
        f.write('{"doc_id": 1}\n')
    probs = verify_export(spark, out0)
    assert len(probs) == 1 and probs[0].startswith("_shard=junk")
    res = repair_export(spark, sf, out0)
    assert res["removed"] == ["junk"] and res["repaired"] == []
    assert verify_export(spark, out0) == []

    # (3) empty delta into an existing directory refuses
    with pytest.raises(ValueError, match="already exists"):
        export_delta_jsonl(spark, sf, out0, snap0, shards=2)

    # (1) corrupt manifest: truncated JSON, then missing per_shard
    mp = os.path.join(out0, EXPORT_MANIFEST)
    good = open(mp).read()
    with open(mp, "w") as f:
        f.write(good[: len(good) // 2])
    probs = verify_export(spark, out0)
    assert len(probs) == 1 and "corrupt" in probs[0]
    chain_probs = verify_export_chain(spark, [out0])
    assert any("corrupt" in p for p in chain_probs)  # no crash, named
    with open(mp, "w") as f:
        json.dump({"n_rows": 1}, f)  # valid JSON, not a manifest
    probs = verify_export(spark, out0)
    assert len(probs) == 1 and "corrupt" in probs[0]
    with open(mp, "w") as f:
        f.write(good)
    assert verify_export(spark, out0) == []


def test_full_export_snapshot_race_cannot_drop_pinned_doc(
    spark, tmp_path, monkeypatch
):
    """r13 whole-file review #6: corpus_snapshot lists documents then
    the index; an append landing between the walks yields a snapshot
    whose index covers a doc outside its documents set. Forge exactly
    that inconsistent snapshot: without the semi-join the phantom's
    smaller id steals doc 40's cluster keepership and 40 silently
    vanishes from the export (while the phantom never ships either);
    with it, 40 ships."""
    import os

    from venus_spark import prepared
    from venus_spark.export import corpus_snapshot, export_curated_jsonl

    monkeypatch.setattr(prepared, "PREPARED_ROOT", str(tmp_path / "prep"))
    sf = str(tmp_path / "sf")
    doc_dir = os.path.join(sf, "documents.parquet")
    schema = "doc_id long, text string, lang string, source string, n_chars long"

    def words(seed, n=24):
        return " ".join(f"w{seed}x{k}" for k in range(n))

    base_rows = [(30 + 10 * i, words(i), "en", "web", 144) for i in range(4)]
    spark.createDataFrame(base_rows, schema).coalesce(1).write.parquet(doc_dir)
    snap_before = corpus_snapshot(spark, sf)

    # the racing append: id 7 < 40, text identical to doc 40's
    phantom = spark.createDataFrame(
        [(7, base_rows[1][1], "en", "web", 144)], schema
    )
    prepared.append_documents_batch(spark, sf, phantom, batch_id=1)
    snap_after = corpus_snapshot(spark, sf)

    forged = {
        "documents": snap_before["documents"],          # pre-append walk
        "documents_minhash": snap_after["documents_minhash"],  # post-append
    }
    assert set(forged["documents_minhash"]) > set(
        snap_before["documents_minhash"]
    ), "fixture must actually widen the index file set"

    out = str(tmp_path / "exp")
    export_curated_jsonl(spark, sf, out, shards=2, snapshot=forged)
    ids = {r["doc_id"] for r in spark.read.json(out).collect()}
    assert 40 in ids          # the pinned doc ships
    assert 7 not in ids       # the phantom (outside the pinned docs) does not
    assert ids == {r[0] for r in base_rows}


def test_cli_snapshot_from_inherits_shard_modulus(
    spark, tmp_path, monkeypatch, capsys
):
    """r13 whole-file review #4: a byte-identical re-export must reuse
    the prior manifest's shard modulus when --shards is not given —
    otherwise every file differs despite the identical row set."""
    from venus_spark.__main__ import main

    sf, doc_dir, schema, words, snap0, out0 = _delta_fixture(
        spark, tmp_path, monkeypatch, n_base=6, shards=3
    )
    out2 = str(tmp_path / "re")
    rc = main(["export", out2, "--sf", sf, "--snapshot-from", out0])
    assert rc == 0
    assert "(3 shards)" in capsys.readouterr().out
    assert _shard_digests(out2) == _shard_digests(out0)  # byte-identical


def test_repair_removes_foreign_shard_with_escaped_name(
    spark, tmp_path, monkeypatch
):
    """ADVICE r13 #1: a foreign shard dir whose NAME Spark percent-
    escaped on disk (`_shard=a%20b` decoding to 'a b') must be removed
    by its literal directory name — the old code rmtree'd the DECODED
    path and crashed with FileNotFoundError. An EMPTY foreign dir (no
    digest row at all) must be removed too."""
    import json
    import os

    from venus_spark.export import repair_export, verify_export

    sf, doc_dir, schema, words, snap0, out0 = _delta_fixture(
        spark, tmp_path, monkeypatch, n_base=8, shards=4
    )
    # inject: a space-bearing foreign shard (escaped on disk), with a
    # real line so the digest scan sees it, and an empty foreign dir
    esc = os.path.join(out0, "_shard=a%20b")
    os.makedirs(esc)
    with open(os.path.join(esc, "part-injected.txt"), "w") as f:
        f.write('{"doc_id": 77777}\n')
    os.makedirs(os.path.join(out0, "_shard=empty_junk"))

    result = repair_export(spark, sf, out0)
    assert result["repaired"] == []
    assert sorted(map(str, result["removed"])) == ["a b", "empty_junk"]
    assert not os.path.exists(esc)
    assert not os.path.exists(os.path.join(out0, "_shard=empty_junk"))
    assert verify_export(spark, out0) == []


def test_manifest_refuses_to_certify_foreign_shards(
    spark, tmp_path, monkeypatch
):
    """ADVICE r13 #2: a foreign `_shard=junk` (or out-of-modulus
    integer) directory present at manifest-WRITE time must fail loudly
    with its name, not get certified into per_shard where repair later
    dies on int('junk')."""
    import os

    import pytest

    from venus_spark.export import write_export_manifest

    sf, doc_dir, schema, words, snap0, out0 = _delta_fixture(
        spark, tmp_path, monkeypatch, n_base=8, shards=4
    )
    junk = os.path.join(out0, "_shard=junk")
    os.makedirs(junk)
    with open(os.path.join(junk, "part-x.txt"), "w") as f:
        f.write('{"doc_id": 1}\n')
    with pytest.raises(ValueError, match="junk"):
        write_export_manifest(spark, out0, extra={"shard_modulus": 4})
    os.rename(junk, os.path.join(out0, "_shard=11"))
    with pytest.raises(ValueError, match=r"\[0, 4\)"):
        write_export_manifest(spark, out0, extra={"shard_modulus": 4})


def test_chain_names_modulus_mismatch_and_legacy_links(
    spark, tmp_path, monkeypatch
):
    """ADVICE r13 #3: verify_export_chain must name (a) a link whose
    manifest predates shard_modulus recording and (b) links certified
    under DIFFERENT moduli; and the CLI's --delta-from must refuse a
    pre-modulus prior manifest unless --shards states one."""
    import json
    import os

    from venus_spark.export import (
        EXPORT_MANIFEST, export_delta_jsonl, verify_export_chain,
    )

    sf, doc_dir, schema, words, snap0, out0 = _delta_fixture(
        spark, tmp_path, monkeypatch, n_base=6, shards=3
    )
    from venus_spark import prepared

    d = spark.createDataFrame(
        [(9100, words("delta"), "en", "web", 144)], schema
    )
    d.coalesce(1).write.mode("append").parquet(doc_dir)
    prepared.write_minhash_pending(sf, d, batch_id=1)
    out1 = str(tmp_path / "delta1")
    export_delta_jsonl(spark, sf, out1, snap0, shards=3)
    assert verify_export_chain(spark, [out0, out1]) == []

    # (b) mismatched modulus on the delta link
    mp = os.path.join(out1, EXPORT_MANIFEST)
    with open(mp) as f:
        m1 = json.load(f)
    m1["shard_modulus"] = 5
    with open(mp, "w") as f:
        json.dump(m1, f)
    probs = verify_export_chain(spark, [out0, out1])
    assert any("shard_modulus 5 != chain's 3" in p for p in probs)

    # (a) legacy pre-modulus manifest
    del m1["shard_modulus"]
    with open(mp, "w") as f:
        json.dump(m1, f)
    probs = verify_export_chain(spark, [out0, out1])
    assert any("records no shard_modulus" in p for p in probs)

    # CLI refusal: --delta-from a pre-modulus manifest without --shards
    mp0 = os.path.join(out0, EXPORT_MANIFEST)
    with open(mp0) as f:
        m0 = json.load(f)
    del m0["shard_modulus"]
    with open(mp0, "w") as f:
        json.dump(m0, f)
    import venus_spark.__main__ as cli

    rc = cli.main([
        "export", str(tmp_path / "d2"), "--sf", sf,
        "--delta-from", out0,
    ])
    assert rc == 2


import pytest as _pytest


@_pytest.mark.parametrize("order", ["delta_mid_repair", "repair_mid_delta"])
def test_repair_races_delta_cut_chain_stays_exactly_once(
    spark, tmp_path, monkeypatch, order
):
    """VERDICT r13 #3 (chaos leg): `repair_export` on the chain's base
    and a DELTA cut extending the same chain, deterministically
    interleaved both ways — mid-repair the delta cut fires (reading
    the base's manifest while its shards are being rewritten), and
    mid-delta (between its curation and its manifest write) the repair
    fires. After EITHER interleaving the chain must verify clean and
    ship every doc exactly once: the base manifest's snapshot is
    immutable under repair (os.replace keeps every observable manifest
    complete), so the delta's lineage is the same whichever side wins."""
    import os

    from venus_spark import prepared
    import venus_spark.export as ex

    sf, doc_dir, schema, words, snap0, out0 = _delta_fixture(
        spark, tmp_path, monkeypatch, n_base=10, shards=4
    )
    baseline = _shard_digests(out0)
    victim = sorted(baseline)[0]

    d = spark.createDataFrame(
        [(9301, words("race1"), "en", "web", 144),
         (9302, words("race2"), "en", "web", 144)], schema
    )
    d.coalesce(1).write.mode("append").parquet(doc_dir)
    prepared.write_minhash_pending(sf, d, batch_id=1)

    _damage_shard(out0, victim, "truncate")
    assert ex.verify_export(spark, out0) != []
    out1 = str(tmp_path / "delta_race")
    fired = []

    if order == "delta_mid_repair":
        real_export = ex.export_jsonl

        def hook(df, out_dir, shards, only_shards=None, **kw):
            # the repair leg's only_shards call: cut the delta NOW,
            # while the base's damaged shards are still being rebuilt
            if only_shards is not None and not fired:
                fired.append(1)
                ex.export_delta_jsonl(spark, sf, out1, snap0, shards=4)
            return real_export(
                df, out_dir, shards, only_shards=only_shards, **kw
            )

        monkeypatch.setattr(ex, "export_jsonl", hook)
        result = ex.repair_export(spark, sf, out0)
        assert result["repaired"] == [victim]
        assert result["problems"] == []
    else:
        real_manifest = ex.write_export_manifest

        def hook(spark_, out_dir, snapshot=None, extra=None):
            # between the delta's shard write and its certification,
            # the base repairs underneath it
            if out_dir == out1 and not fired:
                fired.append(1)
                r = ex.repair_export(spark, sf, out0)
                assert r["repaired"] == [victim]
            return real_manifest(
                spark_, out_dir, snapshot=snapshot, extra=extra
            )

        monkeypatch.setattr(ex, "write_export_manifest", hook)
        ex.export_delta_jsonl(spark, sf, out1, snap0, shards=4)

    assert fired == [1], "interleaving hook never fired"
    assert _shard_digests(out0) == baseline  # byte-identical repair
    assert ex.verify_export(spark, out0) == []
    assert ex.verify_export(spark, out1) == []
    assert ex.verify_export_chain(spark, [out0, out1]) == []
    # the delta shipped exactly the streamed docs, once
    got = {
        int(r.doc_id)
        for r in spark.read.json(out1).select("doc_id").collect()
    }
    assert got == {9301, 9302}
