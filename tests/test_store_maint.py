"""Fingerprint-store lifecycle: compaction, stats, and the crash
windows (r10 VERDICT item 3 + r10 ADVICE item 1).

The store is append-only by design — a re-run batch appends duplicate
(fp, probe) rows that the remover's group-by makes semantically inert —
so the maintenance surface must prove three things: compaction rewrites
to the exact distinct set without changing dedup results, a crash at
ANY point degrades conservatively (keep a duplicate, never cut
unshipped text, never lose fingerprints), and stats report what an
operator needs to schedule compactions.
"""

from __future__ import annotations

import os

import pytest

import ir_analyses_spark.llm.substring_dedup as sd
from ir_analyses_spark.io.warc_datasource import IDENTITY_RENDERING


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


BOILER = "this exact disclaimer sentence is repeated verbatim everywhere"
DOCS = [
    (0, f"alpha opening words of the filing {BOILER} with a first tail"),
    (2, "beta page made of entirely original prose with its own words"),
]
NEW_BATCH = [
    (1, f"gamma report quoting the boilerplate {BOILER} and a fresh end"),
    (3, "delta page that carries only novel words start to finish"),
]


def _seed_store(spark, path, n_appends=2):
    fps = sd.winnow_fingerprints(_docs(spark, DOCS), k=16, window=8)
    for _ in range(n_appends):
        sd.write_fingerprint_store(fps, path, 16, 8)
    return fps


# slow: store-compaction lifecycle; compaction is oracle-checked (fingerprint_store_compact)
@pytest.mark.slow
def test_compact_rewrites_to_distinct_and_preserves_meta(spark, tmp_path):
    store = str(tmp_path / "store")
    _seed_store(spark, store, n_appends=2)
    pre = sd.fingerprint_store_stats(spark, store)
    assert pre["n_rows"] == 2 * pre["n_distinct"] > 0
    assert pre["n_compactions"] == 0

    res = sd.compact_fingerprint_store(spark, store)
    assert res["rows_before"] == pre["n_rows"]
    assert res["rows_after"] == pre["n_distinct"]
    assert res["bytes_after"] <= res["bytes_before"]

    post = sd.fingerprint_store_stats(spark, store)
    assert post["n_rows"] == post["n_distinct"] == pre["n_distinct"]
    assert post["n_compactions"] == 1
    # parameter meta survives the rewrite untouched
    assert (post["k"], post["window"], post["hash_scheme"]) == (
        pre["k"], pre["window"], pre["hash_scheme"],
    )
    # the store still appends under the same parameters...
    fps = sd.winnow_fingerprints(
        _docs(spark, NEW_BATCH), k=16, window=8
    )
    sd.write_fingerprint_store(fps, store, 16, 8)
    # ...and still refuses mismatched ones
    with pytest.raises(sd.FingerprintStoreMismatch):
        sd.write_fingerprint_store(fps, store, 24, 8)
    # a second compaction straight after the first is a no-op
    # (idempotence): the append above may or may not overlap the
    # existing set, so compact once to reach the fixed point first
    sd.compact_fingerprint_store(spark, store)
    res3 = sd.compact_fingerprint_store(spark, store)
    assert res3["rows_after"] == res3["rows_before"]
    assert sd.fingerprint_store_stats(spark, store)["n_compactions"] == 3


# slow: compaction-invariance lifecycle; oracle-checked via fingerprint_store_compact
@pytest.mark.slow
def test_dedup_results_identical_before_and_after_compaction(spark, tmp_path):
    """Duplicate store rows are semantically inert, so compaction must
    not change a single output byte of the incremental remover."""
    store = str(tmp_path / "store")
    _seed_store(spark, store, n_appends=2)
    new_docs = _docs(spark, NEW_BATCH)

    def run():
        fps, meta = sd.read_fingerprint_store(spark, store)
        cleaned, _ = sd.remove_substrings_against_store(
            new_docs, fps, k=16, window=8, store_meta=meta
        )
        return sorted((r["doc_id"], r["text"]) for r in cleaned.collect())

    before = run()
    sd.compact_fingerprint_store(spark, store)
    after = run()
    assert before == after
    # and the boilerplate was genuinely cut (the comparison is not
    # between two no-ops)
    assert not any(BOILER in t for _id, t in after)


def test_meta_only_store_is_empty_not_corrupt(spark, tmp_path):
    """r10 ADVICE item 1: a crash between the meta write and the first
    fingerprint append used to leave a store every later run choked on
    (uncaught AnalysisException). It now reads as EMPTY — the next
    batch keeps a duplicate (conservative) and its append repairs the
    store."""
    store = str(tmp_path / "store")
    spark.createDataFrame(
        [(16, 8, sd.DEFAULT_HASH_SCHEME, sd._STORE_FORMAT_VERSION, IDENTITY_RENDERING)],
        "k int, window int, hash_scheme string, format_version int, "
        "identity_rendering string",
    ).coalesce(1).write.mode("overwrite").json(f"{store}/_store_meta")

    fps, meta = sd.read_fingerprint_store(spark, store)
    assert meta is not None and meta["k"] == 16
    assert fps.count() == 0
    assert fps.columns == ["fp", "probe"]
    # an empty store cuts nothing: the new batch keeps its (single)
    # boilerplate occurrence instead of losing unshipped text
    cleaned, _ = sd.remove_substrings_against_store(
        _docs(spark, NEW_BATCH), fps, k=16, window=8, store_meta=meta
    )
    texts = [r["text"] for r in cleaned.collect()]
    assert sum(1 for t in texts if BOILER in t) == 1

    # stats on the meta-only store work too (it is a real store)
    st = sd.fingerprint_store_stats(spark, store)
    assert st["n_rows"] == st["n_files"] == st["bytes"] == 0

    # the next append repairs it
    sd.write_fingerprint_store(
        sd.winnow_fingerprints(_docs(spark, DOCS), k=16, window=8),
        store, 16, 8,
    )
    fps2, _ = sd.read_fingerprint_store(spark, store)
    assert fps2.count() > 0

    # compaction of a meta-only store is a no-op, not an error
    store2 = str(tmp_path / "store2")
    spark.createDataFrame(
        [(16, 8, sd.DEFAULT_HASH_SCHEME, sd._STORE_FORMAT_VERSION, IDENTITY_RENDERING)],
        "k int, window int, hash_scheme string, format_version int, "
        "identity_rendering string",
    ).coalesce(1).write.mode("overwrite").json(f"{store2}/_store_meta")
    assert sd.compact_fingerprint_store(spark, store2) == {
        "rows_before": 0, "rows_after": 0,
        "bytes_before": 0, "bytes_after": 0,
    }


def test_interrupted_compaction_recovery(spark, tmp_path):
    """A compaction that crashed between the two renames leaves
    ``fingerprints__old`` holding the only copy of the data. READS must
    resolve that shape WITHOUT mutating it (a stats/read call racing a
    live compaction must never rename directories out from under its
    swap — review-caught); WRITE entry points (append, compact) repair
    it before touching the store, or an append would recreate
    ``fingerprints/`` and strand the old rows forever."""
    store = str(tmp_path / "store")
    _seed_store(spark, store, n_appends=2)
    n = spark.read.parquet(f"{store}/fingerprints").count()

    # simulate the crash window: live dir renamed aside, swap never ran
    os.rename(
        os.path.join(store, "fingerprints"),
        os.path.join(store, sd._RETIRED_DIR),
    )
    fps, _ = sd.read_fingerprint_store(spark, store)
    assert fps.count() == n  # read AROUND the crash, nothing lost
    # ...and the crashed shape is untouched: reads are mutation-free
    assert os.path.exists(os.path.join(store, sd._RETIRED_DIR))
    assert not os.path.exists(os.path.join(store, "fingerprints"))
    st = sd.fingerprint_store_stats(spark, store)
    assert st["n_rows"] == n  # stats read around it too
    assert os.path.exists(os.path.join(store, sd._RETIRED_DIR))

    # the APPEND path repairs (the strand scenario)
    new_fps = sd.winnow_fingerprints(
        _docs(spark, NEW_BATCH), k=16, window=8
    )
    sd.write_fingerprint_store(new_fps, store, 16, 8)
    total = spark.read.parquet(f"{store}/fingerprints").count()
    assert total == n + new_fps.count()  # old rows restored, new appended
    assert not os.path.exists(os.path.join(store, sd._RETIRED_DIR))

    # same crash, repaired by the COMPACT path; a stale staging dir
    # from the crashed attempt is reclaimed, not tripped over
    os.rename(
        os.path.join(store, "fingerprints"),
        os.path.join(store, sd._RETIRED_DIR),
    )
    staging = os.path.join(store, sd._COMPACTING_DIR)
    os.makedirs(staging, exist_ok=True)
    res = sd.compact_fingerprint_store(spark, store)
    assert res["rows_before"] == total
    assert res["rows_after"] == spark.read.parquet(
        f"{store}/fingerprints"
    ).count()
    assert not os.path.exists(staging)


def test_post_swap_crash_reclaims_superseded_dir(spark, tmp_path):
    """Review-caught: a crash AFTER the second rename but before the
    delete leaves live + __old coexisting; the first recovery revision
    only handled live-missing, so the superseded copy leaked forever
    and the next compaction died on a non-empty rename target.
    Coexistence always means the swap completed (write entry points
    recover before writing, so they can never recreate live around a
    lingering __old dir) — reads use live and leave the shape alone;
    the next WRITE reclaims it."""
    store = str(tmp_path / "store")
    _seed_store(spark, store, n_appends=2)
    live = os.path.join(store, "fingerprints")
    retired = os.path.join(store, sd._RETIRED_DIR)
    n = spark.read.parquet(live).count()

    # simulate: swap completed (live is current), __old never deleted
    import shutil

    shutil.copytree(live, retired)
    fps, _ = sd.read_fingerprint_store(spark, store)
    assert fps.count() == n  # reads use LIVE when both exist
    assert os.path.exists(retired)  # ...and never mutate

    # the next compaction reclaims it and runs instead of dying on a
    # non-empty rename target
    res = sd.compact_fingerprint_store(spark, store)
    assert res["rows_after"] <= res["rows_before"] == n
    assert not os.path.exists(retired)

    # a stale staging dir next to a live one is store-sized garbage
    # from a pre-rename crash: the next WRITE reclaims it
    staging = os.path.join(store, sd._COMPACTING_DIR)
    os.makedirs(staging)
    sd.write_fingerprint_store(
        sd.winnow_fingerprints(_docs(spark, NEW_BATCH), k=16, window=8),
        store, 16, 8,
    )
    assert not os.path.exists(staging)


def test_append_killed_mid_job_reads_as_empty(spark, tmp_path):
    """Review-caught: an append killed mid-job (executor OOM, SIGKILL)
    leaves fingerprints/ holding only an uncommitted ``_temporary`` dir
    and no data files — UNABLE_TO_INFER_SCHEMA, not PATH_NOT_FOUND.
    That too must read as an EMPTY store (conservative keep-a-duplicate
    direction, repaired by the next append), not brick every later
    incremental batch."""
    store = str(tmp_path / "store")
    spark.createDataFrame(
        [(16, 8, sd.DEFAULT_HASH_SCHEME, sd._STORE_FORMAT_VERSION, IDENTITY_RENDERING)],
        "k int, window int, hash_scheme string, format_version int, "
        "identity_rendering string",
    ).coalesce(1).write.mode("overwrite").json(f"{store}/_store_meta")
    # the real kill shape: an uncommitted TASK ATTEMPT dir (the
    # committer's _temporary/<appAttempt>/_temporary/attempt_* layout —
    # a bare file at _temporary/0/ would collide with the next append's
    # own committer bookkeeping, which a real kill never produces)
    attempt = os.path.join(
        store, "fingerprints", "_temporary", "0", "_temporary",
        "attempt_202408152100_0001_m_000000_0",
    )
    os.makedirs(attempt)
    # give the uncommitted attempt real bytes: stats must NOT report
    # them next to n_rows=0 (an operator would schedule a compaction
    # off phantom bytes — review-caught)
    with open(os.path.join(attempt, "part-00000.parquet"), "wb") as fh:
        fh.write(b"\x00" * 4096)

    fps, meta = sd.read_fingerprint_store(spark, store)
    assert meta is not None and fps.count() == 0
    st = sd.fingerprint_store_stats(spark, store)
    assert st["n_rows"] == st["n_files"] == st["bytes"] == 0
    # ...but the dead attempt's bytes are NOT invisible: they show in
    # their own field, so a disk investigation finds them
    # (review-caught: committed-only accounting hid them entirely)
    assert st["uncommitted_bytes"] >= 4096
    # the maintenance command itself must not crash on this shape
    # (review-caught: it raised UNABLE_TO_INFER_SCHEMA — the one store
    # an operator reaches for --compact-store on) — and, being a WRITE,
    # it RECLAIMS the uncommitted garbage no other tool would delete
    assert sd.compact_fingerprint_store(spark, store)["rows_before"] == 0
    assert not os.path.exists(
        os.path.join(store, "fingerprints", "_temporary")
    )
    assert sd.fingerprint_store_stats(spark, store)["uncommitted_bytes"] == 0
    # the next append repairs the store
    sd.write_fingerprint_store(
        sd.winnow_fingerprints(_docs(spark, DOCS), k=16, window=8),
        store, 16, 8,
    )
    fps2, _ = sd.read_fingerprint_store(spark, store)
    assert fps2.count() > 0


def test_wrong_schema_fingerprints_raise_not_empty(spark, tmp_path):
    """Review-caught: the empty-store fallback must cover ONLY a
    missing fingerprints path — a fingerprints dir holding foreign
    parquet (partial restore, wrong data) must raise, not silently
    no-op the dedup and then mix schemas on the next append."""
    store = str(tmp_path / "store")
    spark.createDataFrame(
        [(16, 8, sd.DEFAULT_HASH_SCHEME, sd._STORE_FORMAT_VERSION, IDENTITY_RENDERING)],
        "k int, window int, hash_scheme string, format_version int, "
        "identity_rendering string",
    ).coalesce(1).write.mode("overwrite").json(f"{store}/_store_meta")
    spark.createDataFrame(
        [(1, "x")], "wrong_col int, other string"
    ).write.parquet(f"{store}/fingerprints")
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        sd.read_fingerprint_store(spark, store)
    with pytest.raises(AnalysisException):
        sd.fingerprint_store_stats(spark, store)


def test_maintenance_refuses_non_local_store(spark, monkeypatch, tmp_path):
    """Review-caught: a remote (HDFS/S3) store's meta reads fine via
    Spark but os.path.isdir is a LOCAL check, so compaction used to
    take the meta-only branch and report an all-zero 'compaction' the
    operator would believe. Maintenance must refuse loudly; reads and
    appends stay Hadoop-generic."""
    # simulate 'meta readable but path not a local directory'
    monkeypatch.setattr(
        sd, "_read_store_meta",
        lambda spark, path: {"k": 16, "window": 8,
                             "hash_scheme": sd.DEFAULT_HASH_SCHEME,
                             "format_version": sd._STORE_FORMAT_VERSION},
    )
    with pytest.raises(ValueError, match="local filesystems only"):
        sd.compact_fingerprint_store(spark, "hdfs://nn/stores/fps")
    with pytest.raises(ValueError, match="local filesystems only"):
        sd.fingerprint_store_stats(spark, "hdfs://nn/stores/fps")


def test_maintenance_on_missing_store_fails_loudly(spark, tmp_path):
    """Silently 'compacting' a typo'd path would leave the operator
    believing the real store shrank — same contract as txn_maint."""
    with pytest.raises(FileNotFoundError):
        sd.compact_fingerprint_store(spark, str(tmp_path / "nope"))
    with pytest.raises(FileNotFoundError):
        sd.fingerprint_store_stats(spark, str(tmp_path / "nope"))


def test_stats_distinct_counts_null_bearing_rows(spark, tmp_path):
    """Review-caught: COUNT(DISTINCT fp, probe) silently drops rows
    where either column is NULL, while the compactor's distinct()
    keeps them — n_distinct would understate the post-compaction size
    forever and the operator would chase a gap no compaction closes.
    The struct form must count them like the compactor does."""
    store = str(tmp_path / "store")
    spark.createDataFrame(
        [(16, 8, sd.DEFAULT_HASH_SCHEME, sd._STORE_FORMAT_VERSION, IDENTITY_RENDERING)],
        "k int, window int, hash_scheme string, format_version int, "
        "identity_rendering string",
    ).coalesce(1).write.mode("overwrite").json(f"{store}/_store_meta")
    spark.createDataFrame(
        [(None, "x"), (None, "x"), (1, None), (1, "y")],
        "fp bigint, probe string",
    ).write.parquet(f"{store}/fingerprints")

    st = sd.fingerprint_store_stats(spark, store)
    assert st["n_rows"] == 4
    assert st["n_distinct"] == 3  # (NULL,'x') dedups; (1,NULL) counts
    res = sd.compact_fingerprint_store(spark, store)
    assert res["rows_after"] == 3
    st2 = sd.fingerprint_store_stats(spark, store)
    assert st2["n_rows"] == st2["n_distinct"] == 3  # converged


def test_estimate_shuffle_ratio():
    """The operational surface of SCALE.md's winnowing-shuffle math:
    w=8 ≈ 10 bytes per text byte is exactly the number the r10 scale
    run measured against."""
    assert sd.estimate_shuffle_ratio(8) == pytest.approx(10.0)
    assert sd.estimate_shuffle_ratio(35) == pytest.approx(2.5)
    assert sd.estimate_shuffle_ratio(64) == pytest.approx(45 * 2 / 65)
    # monotone: bigger windows always shuffle less
    assert sd.estimate_shuffle_ratio(64) < sd.estimate_shuffle_ratio(35)
    with pytest.raises(ValueError):
        sd.estimate_shuffle_ratio(0)
