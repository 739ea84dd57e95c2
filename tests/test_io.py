"""IO layer tests: encoding-sniffed filing scans (SURVEY §2A S1–S3) and
parquet sink MERGE semantics (S6/S7, A5–A7).

Mirrors the reference's ingest edge cases: per-file charset detection
(reference utils/api.py:129-137 uses chardet), BOM'd UTF-8 fixtures
(reference tests/test_mapping.py:111-115), and the find-or-create /
upsert repository behavior
(reference utils/service/financial_service.py:184-232,
tests/repositories/test_company_repository.py:37-121).
"""

from __future__ import annotations

import codecs

import pytest
from pyspark.sql import functions as F

from ir_analyses_spark.io import sinks, sources
from ir_analyses_spark.schemas import RAW_JP_COLUMNS

HEADER = "\t".join(RAW_JP_COLUMNS)
ROW1 = "\t".join(
    ["jppfs_cor:NetSales", "売上高", "CurrentYTDDuration", "当四半期累計期間",
     "連結", "期間", "JPY", "円", "1000"]
)
ROW2 = "\t".join(
    ["jpcrp_cor:CompanyNameCoverPage", "会社名、表紙", "FilingDateInstant",
     "提出日時点", "その他", "時点", "－", "－", "テスト株式会社"]
)
CONTENT = f"{HEADER}\n{ROW1}\n{ROW2}\n"


# ---------------------------------------------------------------------------
# sniff_encoding + read_filing_csvs
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "enc,write_bom,expect",
    [
        ("utf-8", False, "UTF-8"),
        ("utf-8-sig", False, "UTF-8"),        # BOM path
        ("cp932", False, ("CP932", "SHIFT_JIS", "SHIFT-JIS", "WINDOWS-31J")),
        ("utf-16-le", True, "UTF-16LE"),
    ],
)
def test_sniff_encoding(tmp_path, enc, write_bom, expect):
    p = tmp_path / f"filing_{enc}.csv"
    data = CONTENT.encode(enc)
    if write_bom and enc == "utf-16-le":
        data = codecs.BOM_UTF16_LE + data
    p.write_bytes(data)
    got = sources.sniff_encoding(str(p))
    expected = (expect,) if isinstance(expect, str) else expect
    assert got.upper() in expected


def test_read_filing_csvs_mixed_encodings(spark, tmp_path):
    """One scan over files in three charsets: grouped per encoding, unioned,
    with per-file lineage — the Spark twin of the reference's per-file
    chardet loop (reference scripts/bypass_import_csv.py:56-72)."""
    (tmp_path / "a_utf8.csv").write_bytes(CONTENT.encode("utf-8"))
    (tmp_path / "b_sjis.csv").write_bytes(CONTENT.encode("cp932"))
    (tmp_path / "c_bom.csv").write_bytes(CONTENT.encode("utf-8-sig"))

    df = sources.read_filing_csvs(spark, str(tmp_path / "*.csv"))
    rows = df.collect()
    assert len(rows) == 6  # 2 rows × 3 files
    assert df.filter(F.col("要素ID") == "jppfs_cor:NetSales").count() == 3
    # JP text decoded identically from every charset
    names = {
        r["値"] for r in rows if r["要素ID"] == "jpcrp_cor:CompanyNameCoverPage"
    }
    assert names == {"テスト株式会社"}
    # lineage: 3 distinct source files
    assert df.select("_filing_path").distinct().count() == 3


def test_read_zip_members(spark, tmp_path):
    """S5: ZIP fan-out extracts only the jpcrp CSV members, in parallel
    (reference utils/api.py:113-118 does this per-ZIP on the driver)."""
    import zipfile

    for i in range(2):
        with zipfile.ZipFile(tmp_path / f"S10000{i}.zip", "w") as zf:
            zf.writestr(f"XBRL_TO_CSV/jpcrp_filing_{i}.csv", CONTENT.encode("cp932"))
            zf.writestr("XBRL_TO_CSV/jpaud_auditor.csv", b"ignored")
            zf.writestr("manifest.xml", b"<xml/>")

    members = sources.read_zip_members(spark, str(tmp_path / "*.zip"))
    rows = members.collect()
    assert len(rows) == 2
    assert all("jpcrp" in r["member"] for r in rows)
    # bytes round-trip: CP932 member decodes to the original filing text
    assert bytes(rows[0]["content"]).decode("cp932") == CONTENT


def test_edinet_python_datasource(spark, tmp_path):
    """S4 scale path: date-partitioned document lists via a Spark 4 Python
    DataSource — one input partition per date, substring filter applied
    relationally (reference utils/api.py:45-93 fetches per-date on the
    driver and filters in pandas)."""
    import json

    from ir_analyses_spark.io.edinet_datasource import EdinetFixtureDataSource

    d = tmp_path / "lists"
    d.mkdir()
    for date, descs in [
        ("2024-02-09", ["四半期報告書－第121期第３四半期", "有価証券届出書"]),
        ("2024-02-13", ["四半期報告書－第10期第２四半期"]),
    ]:
        payload = {
            "results": [
                {
                    "docID": f"S{abs(hash((date, i))) % 10**6:06d}",
                    "edinetCode": "E03562",
                    "filerName": "株式会社山梨中央銀行",
                    "docDescription": desc,
                    "submitDateTime": f"{date} 15:00",
                }
                for i, desc in enumerate(descs)
            ]
        }
        (d / f"{date}.json").write_text(json.dumps(payload), encoding="utf-8")

    spark.dataSource.register(EdinetFixtureDataSource)
    df = spark.read.format("edinet_fixture").option("path", str(d)).load()
    assert df.count() == 3
    assert df.rdd.getNumPartitions() == 2  # one partition per date
    # F4: quarterly-report substring filter
    quarterly = df.filter(F.col("docDescription").contains("四半期報告書"))
    assert quarterly.count() == 2
    assert {r["date"] for r in quarterly.collect()} == {"2024-02-09", "2024-02-13"}


def test_read_filing_csvs_empty_glob(spark, tmp_path):
    df = sources.read_filing_csvs(spark, str(tmp_path / "nothing" / "*.csv"))
    assert df.count() == 0
    assert "_filing_path" in df.columns


# ---------------------------------------------------------------------------
# sinks: merge_upsert / append_missing / replace_partition
# ---------------------------------------------------------------------------

def _df(spark, rows):
    return spark.createDataFrame(rows, "edinet_code string, company_name string")


def test_merge_upsert_insert_then_update(spark, tmp_path):
    target = str(tmp_path / "companies")
    sinks.merge_upsert(_df(spark, [("E1", "A"), ("E2", "B")]), target, ["edinet_code"])
    # update E2, insert E3 — the reference's find-or-create + merge
    sinks.merge_upsert(_df(spark, [("E2", "B2"), ("E3", "C")]), target, ["edinet_code"])
    got = {r["edinet_code"]: r["company_name"] for r in spark.read.parquet(target).collect()}
    assert got == {"E1": "A", "E2": "B2", "E3": "C"}


def test_swap_in_crash_window_leaves_valid_copy(spark, tmp_path, monkeypatch):
    """A crash between _swap_in's two renames must leave the complete old
    table at ``__old`` and the complete new table in staging — data is
    recoverable at every instant — and a re-run must converge to the new
    table with the remnant garbage-collected."""
    import os as _os

    import pytest as _pytest

    target = str(tmp_path / "t")
    _df(spark, [("E1", "old")]).write.parquet(target)
    staging = target + "__staging"
    _df(spark, [("E1", "new")]).write.parquet(staging)

    real_rename = _os.rename
    calls = {"n": 0}

    def crashy(src, dst):
        calls["n"] += 1
        if calls["n"] == 2:  # after old→__old, before staging→target
            raise OSError("simulated crash")
        real_rename(src, dst)

    monkeypatch.setattr(sinks.os, "rename", crashy)
    with _pytest.raises(OSError):
        sinks._swap_in(staging, target)
    assert spark.read.parquet(target + "__old").first()["company_name"] == "old"
    assert spark.read.parquet(staging).first()["company_name"] == "new"

    monkeypatch.setattr(sinks.os, "rename", real_rename)
    sinks._swap_in(staging, target)
    assert spark.read.parquet(target).first()["company_name"] == "new"
    assert not _os.path.exists(target + "__old")
    assert not _os.path.exists(staging)


def test_additive_merge_crash_mid_commit_no_double_count(
    spark, tmp_path, monkeypatch
):
    """VERDICT r3 item 4: the additive sink's merge and applied-marker
    commit in the SAME rename per partition, so a crash anywhere —
    including between two partitions' commits — can never double-count a
    replayed batch. Kill batch 1 after its first partition committed,
    replay it, and require exact totals."""
    import os as _os

    import pytest as _pytest

    target = str(tmp_path / "rollup")
    schema = "day string, event_type string, n_events long, value_micros long"
    d0 = spark.createDataFrame(
        [("2024-01-01", "a", 1, 10), ("2024-01-02", "a", 2, 20)], schema
    )
    sinks.additive_merge_committed(
        d0, target, "day", ["day", "event_type"],
        ["n_events", "value_micros"], batch_id=0,
    )

    d1 = spark.createDataFrame(
        [("2024-01-01", "a", 5, 50), ("2024-01-02", "a", 7, 70)], schema
    )
    real_rename = _os.rename

    def crashy(src, dst):
        # commit order is sorted, so day=01 promotes first; crash on the
        # promotion of day=02 (staging → live)
        if dst.endswith("day=2024-01-02") and "__staging" in src:
            raise OSError("simulated crash mid-commit")
        real_rename(src, dst)

    monkeypatch.setattr(sinks.os, "rename", crashy)
    with _pytest.raises(OSError, match="mid-commit"):
        sinks.additive_merge_committed(
            d1, target, "day", ["day", "event_type"],
            ["n_events", "value_micros"], batch_id=1,
        )
    monkeypatch.setattr(sinks.os, "rename", real_rename)

    # intermediate state: day=01 committed WITH its marker in one rename;
    # day=02's crash hit between its two renames, so its (unmarked) batch-0
    # data survives at __old awaiting recovery — never half-applied
    assert _os.path.exists(
        _os.path.join(target, "day=2024-01-01", "_applied_1")
    )
    day2_old = _os.path.join(target + "__oldparts", "day=2024-01-02")
    assert _os.path.exists(day2_old)
    assert not _os.path.exists(_os.path.join(day2_old, "_applied_1"))
    mid = {
        (r["day"], r["event_type"]): (r["n_events"], r["value_micros"])
        for r in spark.read.parquet(target).collect()
    }
    assert mid[("2024-01-01", "a")] == (6, 60)

    # replay of batch 1: day=01 skipped (marker), day=02 applied once
    for _ in range(2):  # second replay must be a full no-op
        sinks.additive_merge_committed(
            d1, target, "day", ["day", "event_type"],
            ["n_events", "value_micros"], batch_id=1,
        )
        got = {
            (r["day"], r["event_type"]): (r["n_events"], r["value_micros"])
            for r in spark.read.parquet(target).collect()
        }
        assert got[("2024-01-01", "a")] == (6, 60)
        assert got[("2024-01-02", "a")] == (9, 90)


def test_scd2_batch_marker_commits_with_swap(spark, tmp_path, monkeypatch):
    """The SCD2 sink's applied marker rides the staged swap: a crash
    before the swap leaves the batch unmarked (replay applies it exactly
    once); after the swap, data and marker are both present (replay
    skips). No state exists where the merge landed but the ledger didn't."""
    import datetime as _dt

    import pytest as _pytest

    target = str(tmp_path / "dim")
    schema = "code string, city string, effective_from date"
    b0 = spark.createDataFrame(
        [("K1", "A", _dt.date(2023, 1, 1))], schema
    )
    sinks.scd2_merge(b0, target, key="code", change_cols=["city"], batch_id=0)
    assert sinks.batch_ledger(target, 0)[0]

    b1 = spark.createDataFrame(
        [("K1", "B", _dt.date(2023, 2, 1))], schema
    )

    def boom(staging, target_dir):
        raise OSError("simulated crash before swap")

    monkeypatch.setattr(sinks, "_swap_in", boom)
    with _pytest.raises(OSError, match="before swap"):
        sinks.scd2_merge(
            b1, target, key="code", change_cols=["city"], batch_id=1
        )
    monkeypatch.undo()  # restore the real _swap_in for the replay below

    # nothing applied, nothing marked: the ledger and table agree
    assert not sinks.batch_ledger(target, 1)[0]
    assert spark.read.parquet(target).count() == 1

    # replay applies exactly once; marker 0 carried forward
    sinks.scd2_merge(b1, target, key="code", change_cols=["city"], batch_id=1)
    assert sinks.batch_ledger(target, 0)[0]
    assert sinks.batch_ledger(target, 1)[0]
    rows = {
        (r["city"], r["is_current"])
        for r in spark.read.parquet(target).collect()
    }
    assert rows == {("A", False), ("B", True)}


def test_append_missing_is_insert_only(spark, tmp_path):
    target = str(tmp_path / "items")
    sinks.append_missing(_df(spark, [("E1", "A"), ("E2", "B")]), target, "edinet_code")
    # E2 exists → its new value must NOT overwrite (existence-check insert)
    sinks.append_missing(_df(spark, [("E2", "CHANGED"), ("E3", "C")]), target, "edinet_code")
    got = {r["edinet_code"]: r["company_name"] for r in spark.read.parquet(target).collect()}
    assert got == {"E1": "A", "E2": "B", "E3": "C"}


def test_merge_upsert_partition_scoped(spark, tmp_path):
    """Partition-scoped MERGE must leave untouched partitions' files
    byte-identical — the O(touched-partitions) write path for 100 TB."""
    import glob
    import hashlib
    import os

    target = str(tmp_path / "facts")
    base = spark.createDataFrame(
        [("2023", "k1", 1), ("2023", "k2", 2), ("2024", "k3", 3)],
        "fy string, k string, v int",
    )
    sinks.write_table(base, target, partition_by=["fy"])

    def _files(part):
        out = {}
        for p in sorted(glob.glob(os.path.join(target, f"fy={part}", "*.parquet"))):
            with open(p, "rb") as fh:
                out[p] = hashlib.sha256(fh.read()).hexdigest()
        return out

    before_2024 = _files("2024")
    upd = spark.createDataFrame(
        [("2023", "k2", 99), ("2023", "k9", 7)], "fy string, k string, v int"
    )
    sinks.merge_upsert(upd, target, ["k"], partition_col="fy")
    got = sorted(
        (r["fy"], r["k"], r["v"]) for r in spark.read.parquet(target).collect()
    )
    assert got == [
        ("2023", "k1", 1),
        ("2023", "k2", 99),
        ("2023", "k9", 7),
        ("2024", "k3", 3),
    ]
    assert _files("2024") == before_2024, "untouched partition was rewritten"


def test_append_missing_keeps_existing_files(spark, tmp_path):
    """Insert-only append must not rewrite existing parquet files."""
    import glob
    import hashlib
    import os

    target = str(tmp_path / "items2")
    sinks.append_missing(_df(spark, [("E1", "A")]), target, "edinet_code")
    before = {
        p: hashlib.sha256(open(p, "rb").read()).hexdigest()
        for p in glob.glob(os.path.join(target, "*.parquet"))
    }
    sinks.append_missing(_df(spark, [("E2", "B")]), target, "edinet_code")
    after = {
        p: hashlib.sha256(open(p, "rb").read()).hexdigest()
        for p in glob.glob(os.path.join(target, "*.parquet"))
    }
    assert set(before) <= set(after)
    for p, h in before.items():
        assert after[p] == h, f"existing file {p} was rewritten"
    got = {r["edinet_code"]: r["company_name"] for r in spark.read.parquet(target).collect()}
    assert got == {"E1": "A", "E2": "B"}


def test_scd2_merge_versions_history(spark, tmp_path):
    """Type-2 merge: changed keys close the old version and append a new
    current one; unchanged keys and prior history stay untouched."""
    import datetime as dt

    target = str(tmp_path / "dim")

    def day(s):
        return dt.date.fromisoformat(s)

    b1 = spark.createDataFrame(
        [("E1", "Tokyo", day("2023-01-01")), ("E2", "Osaka", day("2023-01-01"))],
        "code string, city string, effective_from date",
    )
    sinks.scd2_merge(b1, target, key="code", change_cols=["city"])
    # E1 moves, E2 unchanged, E3 appears
    b2 = spark.createDataFrame(
        [
            ("E1", "Kyoto", day("2023-06-01")),
            ("E2", "Osaka", day("2023-06-01")),
            ("E3", "Nagoya", day("2023-06-01")),
        ],
        "code string, city string, effective_from date",
    )
    sinks.scd2_merge(b2, target, key="code", change_cols=["city"])
    rows = sorted(
        (
            r["code"],
            r["city"],
            str(r["effective_from"]),
            str(r["effective_to"]),
            r["is_current"],
        )
        for r in spark.read.parquet(target).collect()
    )
    assert rows == [
        ("E1", "Kyoto", "2023-06-01", "None", True),
        ("E1", "Tokyo", "2023-01-01", "2023-06-01", False),
        ("E2", "Osaka", "2023-01-01", "None", True),
        ("E3", "Nagoya", "2023-06-01", "None", True),
    ]
    # a third change for E1 must close the 2023-06 version, keep 2023-01 history
    b3 = spark.createDataFrame(
        [("E1", "Sendai", day("2024-01-01"))],
        "code string, city string, effective_from date",
    )
    sinks.scd2_merge(b3, target, key="code", change_cols=["city"])
    e1 = sorted(
        (r["city"], str(r["effective_to"]), r["is_current"])
        for r in spark.read.parquet(target).filter(F.col("code") == "E1").collect()
    )
    assert e1 == [
        ("Kyoto", "2024-01-01", False),
        ("Sendai", "None", True),
        ("Tokyo", "2023-06-01", False),
    ]


def test_scd2_point_in_time_join(spark, tmp_path):
    """Facts must resolve the dimension version valid AT their date:
    before the first version → null, between changes → the closed row,
    after the last change → the current row."""
    import datetime as dt

    target = str(tmp_path / "dim_pit")

    def day(s):
        return dt.date.fromisoformat(s)

    sinks.scd2_merge(
        spark.createDataFrame(
            [("E1", "Tokyo", day("2023-01-01"))],
            "code string, city string, effective_from date",
        ),
        target, key="code", change_cols=["city"],
    )
    sinks.scd2_merge(
        spark.createDataFrame(
            [("E1", "Kyoto", day("2023-06-01"))],
            "code string, city string, effective_from date",
        ),
        target, key="code", change_cols=["city"],
    )
    facts = spark.createDataFrame(
        [
            (1, "E1", day("2022-12-31")),  # before any version
            (2, "E1", day("2023-01-01")),  # first day of Tokyo
            (3, "E1", day("2023-05-31")),  # last day of Tokyo
            (4, "E1", day("2023-06-01")),  # first day of Kyoto
            (5, "E1", day("2024-01-01")),  # current
        ],
        "fact_id long, code string, fact_date date",
    )
    dim = spark.read.parquet(target)
    got = {
        r["fact_id"]: r["city"]
        for r in sinks.scd2_point_in_time_join(
            facts, dim, key="code", date_col="fact_date"
        ).collect()
    }
    assert got == {1: None, 2: "Tokyo", 3: "Tokyo", 4: "Kyoto", 5: "Kyoto"}


def test_scd2_merge_null_transitions(spark, tmp_path):
    """NULL→value and value→NULL must count as changes (null-safe struct
    compare); NULL→NULL must not."""
    import datetime as dt

    target = str(tmp_path / "dimnull")
    d1, d2 = dt.date(2023, 1, 1), dt.date(2023, 6, 1)
    b1 = spark.createDataFrame(
        [("E1", None, d1), ("E2", None, d1), ("E3", "A", d1)],
        "code string, city string, effective_from date",
    )
    sinks.scd2_merge(b1, target, key="code", change_cols=["city"])
    b2 = spark.createDataFrame(
        [("E1", "X", d2), ("E2", None, d2), ("E3", None, d2)],
        "code string, city string, effective_from date",
    )
    sinks.scd2_merge(b2, target, key="code", change_cols=["city"])
    versions = {
        r["code"]: n
        for r in spark.read.parquet(target)
        .groupBy("code")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
        for n in [r["n"]]
    }
    assert versions == {"E1": 2, "E2": 1, "E3": 2}
    cur = {
        r["code"]: r["city"]
        for r in spark.read.parquet(target).filter("is_current").collect()
    }
    assert cur == {"E1": "X", "E2": None, "E3": None}


def test_compact_splits_hot_partition(spark, tmp_path):
    """A single partition larger than the byte target must split across
    multiple files — the salt keeps compaction from collapsing a hot
    partition into one unsplittable file."""
    import glob
    import os

    target = str(tmp_path / "hot")
    df = spark.range(200_000).selectExpr(
        "'0' AS fy", "repeat(uuid(), 4) AS payload"
    )
    df.write.partitionBy("fy").parquet(target)
    stats = sinks.compact_small_files(
        spark, target, partition_col="fy", target_file_bytes=2 * 1024 * 1024
    )
    files = glob.glob(os.path.join(target, "fy=0", "*.parquet"))
    assert len(files) > 1, "hot partition stayed one file"
    assert stats["files_after"] == len(files)
    assert spark.read.parquet(target).count() == 200_000


def test_scd2_merge_random_batches_match_model(spark, tmp_path):
    """Randomized differential: a fixed-seed sequence of update batches
    through scd2_merge must equal an independent sequential Python model
    (the same N-cases-one-job pattern as the parser property tests)."""
    import datetime as dt
    import random

    rng = random.Random(7)
    keys = [f"K{i}" for i in range(6)]
    cities = ["A", "B", "C"]
    target = str(tmp_path / "dim_rand")

    # model: key -> list of [city, from, to, current]
    model: dict[str, list[list]] = {}

    def model_apply(batch, day):
        for k, city in batch:
            versions = model.setdefault(k, [])
            cur = next((v for v in versions if v[3]), None)
            if cur is None:
                versions.append([city, day, None, True])
            elif cur[0] != city:
                cur[2], cur[3] = day, False
                versions.append([city, day, None, True])

    for step in range(5):
        day = dt.date(2023, 1 + step, 1)
        batch = [(k, rng.choice(cities)) for k in rng.sample(keys, rng.randint(1, 5))]
        df = spark.createDataFrame(
            [(k, c, day) for k, c in batch],
            "code string, city string, effective_from date",
        )
        sinks.scd2_merge(df, target, key="code", change_cols=["city"])
        model_apply(batch, day)

    got = sorted(
        (r["code"], r["city"], str(r["effective_from"]), str(r["effective_to"]), r["is_current"])
        for r in spark.read.parquet(target).collect()
    )
    want = sorted(
        (k, v[0], str(v[1]), str(v[2]), v[3])
        for k, versions in model.items()
        for v in versions
    )
    assert got == want


def test_compact_small_files(spark, tmp_path):
    """Compaction must shrink the file count to the byte-target bound and
    leave the data (values AND schema) untouched."""
    target = str(tmp_path / "shards")
    # 40 tiny files via 40-way repartition of a small frame
    spark.range(1000).selectExpr("id", "id * 2 AS v").repartition(40).write.parquet(
        target
    )
    stats = sinks.compact_small_files(spark, target)
    assert stats["files_before"] == 40
    assert stats["files_after"] == 1  # total bytes << one target file
    df = spark.read.parquet(target)
    assert df.count() == 1000
    assert sorted(r["v"] for r in df.collect()) == sorted(2 * i for i in range(1000))


def test_compact_ignores_uncommitted_temporary_debris(spark, tmp_path):
    """A write killed mid-job leaves a ``_temporary`` task-attempt tree
    holding uncommitted parquet. Compaction must neither count that
    debris (files_before/total-bytes would lie) nor resurrect it into
    the compacted table — the same bug class the fingerprint store's
    ``_committed_files`` fixed (r11 VERDICT item 2)."""
    import os

    target = str(tmp_path / "killed")
    spark.range(100).selectExpr("id", "id * 2 AS v").repartition(4).write.parquet(
        target
    )
    # simulate the kill: a task-attempt dir with a large orphan file
    debris = os.path.join(
        target, "_temporary", "0", "_temporary", "attempt_0_0_m_0_0"
    )
    os.makedirs(debris)
    spark.range(10_000).selectExpr("id", "id AS v").coalesce(1).write.parquet(
        os.path.join(debris, "orphan")
    )
    # nested parquet files now exist under _temporary; also one directly
    with open(os.path.join(debris, "part-zzz.parquet"), "wb") as fh:
        fh.write(b"\x00" * (1 << 20))
    stats = sinks.compact_small_files(spark, target)
    assert stats["files_before"] == 4  # debris not counted
    assert stats["files_after"] == 1
    got = spark.read.parquet(target)
    assert got.count() == 100  # debris rows not resurrected
    # the swap replaced the directory wholesale — no _temporary left
    assert not os.path.exists(os.path.join(target, "_temporary"))


def test_compact_small_files_partitioned(spark, tmp_path):
    """Partitioned compaction keeps the directory layout (partition pruning
    still works afterwards) while collapsing per-directory shards."""
    import glob
    import os

    target = str(tmp_path / "pfacts")
    base = spark.range(400).selectExpr(
        "CAST(id % 2 AS STRING) AS fy", "id AS v"
    ).repartition(20)
    base.write.partitionBy("fy").parquet(target)
    assert len(glob.glob(os.path.join(target, "fy=0", "*.parquet"))) > 1
    sinks.compact_small_files(spark, target, partition_col="fy")
    for part in ("0", "1"):
        assert len(glob.glob(os.path.join(target, f"fy={part}", "*.parquet"))) == 1
    got = spark.read.parquet(target)
    assert got.count() == 400
    assert got.filter(F.col("fy") == "0").count() == 200


def test_compact_carries_applied_ledgers_through_swap(spark, tmp_path):
    """The applied-batch ledgers live INSIDE the table directory, so
    compaction's whole-directory swap must carry them — otherwise a
    replayed batch after maintenance double-counts (found by review)."""
    target = str(tmp_path / "rollup")
    schema = "day string, event_type string, n_events long, value_micros long"
    d0 = spark.createDataFrame([("2024-01-01", "a", 1, 10)], schema)
    d1 = spark.createDataFrame([("2024-01-01", "a", 5, 50)], schema)
    args = (target, "day", ["day", "event_type"], ["n_events", "value_micros"])
    sinks.additive_merge_committed(d0, *args, batch_id=0)
    sinks.additive_merge_committed(d1, *args, batch_id=1)
    sinks.compact_small_files(spark, target, partition_col="day")
    # replay both batches after compaction: markers must have survived
    sinks.additive_merge_committed(d0, *args, batch_id=0)
    sinks.additive_merge_committed(d1, *args, batch_id=1)
    rows = spark.read.parquet(target).collect()
    assert [(r.n_events, r.value_micros) for r in rows] == [(6, 60)]
    # scd2-style directory ledger survives the unpartitioned swap too
    dim = str(tmp_path / "dim")
    import datetime as _dt

    upd = spark.createDataFrame(
        [(1, "a", _dt.date(2024, 1, 1))], ["user_id", "state", "effective_from"]
    )
    sinks.scd2_merge(upd, dim, key="user_id", change_cols=["state"], batch_id=7)
    sinks.compact_small_files(spark, dim)
    applied, _mark = sinks.batch_ledger(dim, 7)
    assert applied


def test_additive_merge_replay_survives_empty_target_dir(spark, tmp_path):
    """A crash between the first batch's makedirs and its first partition
    rename leaves an EMPTY target directory; the replay must treat that
    as 'no current rows' instead of wedging on a parquet read of an empty
    dir (found by review)."""
    import os as _os

    target = str(tmp_path / "rollup")
    _os.makedirs(target)  # the post-crash remnant
    schema = "day string, event_type string, n_events long, value_micros long"
    d0 = spark.createDataFrame([("2024-01-01", "a", 1, 10)], schema)
    sinks.additive_merge_committed(
        d0, target, "day", ["day", "event_type"],
        ["n_events", "value_micros"], batch_id=0,
    )
    rows = spark.read.parquet(target).collect()
    assert [(r.n_events, r.value_micros) for r in rows] == [(1, 10)]


def test_batch_ledger_honors_legacy_sibling_markers(tmp_path):
    """Tables written before the ledger moved inside the table directory
    keep markers at <target>__applied; they must still count as applied
    after an upgrade (found by review)."""
    import os as _os

    target = str(tmp_path / "t")
    _os.makedirs(target)
    legacy = target + "__applied"
    _os.makedirs(legacy)
    with open(_os.path.join(legacy, "42"), "w"):
        pass
    applied, _mark = sinks.batch_ledger(target, 42)
    assert applied
    applied, _mark = sinks.batch_ledger(target, 43)
    assert not applied


def test_zorder_layout_bounds_both_columns_per_file(spark, tmp_path):
    """Z-ordered files must cover small rectangles of (a, b) space: the
    per-file span of BOTH columns stays well below the domain, where a
    1-D sort by `a` leaves `b` spanning ~the whole domain in every file.
    That bounded span is exactly what min/max skipping prunes on."""
    import glob
    import os

    from ir_analyses_spark.io.txn import _footer_stats

    n = 20_000
    # two independent-ish dimensions over [0, 4096)
    df = spark.range(n).selectExpr(
        "CAST((id * 2654435761) % 4096 AS LONG) AS a",
        "CAST((id * 40503) % 4096 AS LONG) AS b",
    )
    zpath = str(tmp_path / "z")
    spath = str(tmp_path / "s")
    sinks.write_zordered(df, zpath, "a", "b", n_shards=16)
    sinks.write_sorted_shards(df, spath, "a", n_shards=16)

    def spans(path):
        out = []
        for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
            st = _footer_stats(f, ["a", "b"])
            out.append(
                (
                    (st["a"][1] - st["a"][0]) / 4096.0,
                    (st["b"][1] - st["b"][0]) / 4096.0,
                )
            )
        return out

    z = spans(zpath)
    s = spans(spath)
    # 1-D layout: b is unconstrained (each file spans ~all of b)
    assert sum(b for _a, b in s) / len(s) > 0.9
    # z-order: BOTH dimensions bounded on average — files are rectangles
    avg_a = sum(a for a, _b in z) / len(z)
    avg_b = sum(b for _a, b in z) / len(z)
    assert avg_a < 0.6 and avg_b < 0.6, (avg_a, avg_b)
    # and a selective predicate on EITHER column skips files
    for col in ("a", "b"):
        hit = [
            f
            for f in sorted(glob.glob(os.path.join(zpath, "*.parquet")))
            if (st := _footer_stats(f, [col]))
            and not (st[col][0] > 300 or st[col][1] < 200)
        ]
        assert len(hit) < 16, col
    # rows survive the layout exactly
    assert spark.read.parquet(zpath).count() == n


def test_write_sorted_shards_disjoint_and_sorted(spark, tmp_path):
    """Shard files must hold disjoint key ranges (global order across
    shards) and be internally sorted — the property that makes point
    queries touch one file and shard readers independent."""
    import glob
    import os

    path = str(tmp_path / "shards")
    df = spark.range(10_000).selectExpr("(id * 2654435761) % 9973 AS k", "id AS v")
    sinks.write_sorted_shards(df, path, "k", n_shards=8)
    ranges = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        ks = [r["k"] for r in spark.read.parquet(f"file://{f}").collect()]
        if not ks:
            continue
        assert ks == sorted(ks), "shard not internally sorted"
        ranges.append((min(ks), max(ks)))
    ranges.sort()
    assert len(ranges) >= 4  # range partitioner actually spread the data
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, "shard key ranges overlap"
    total = spark.read.parquet(path).count()
    assert total == 10_000


def test_replace_partition(spark, tmp_path):
    target = str(tmp_path / "facts")
    base = spark.createDataFrame(
        [("2023", 1), ("2023", 2), ("2024", 3)], "fiscal_year string, v int"
    )
    sinks.write_table(base, target, partition_by=["fiscal_year"])
    # reload only fiscal_year=2023 (the roadmap's delete-then-insert)
    upd = spark.createDataFrame([("2023", 9)], "fiscal_year string, v int")
    sinks.replace_partition(upd, target, "fiscal_year")
    got = sorted(
        (r["fiscal_year"], r["v"]) for r in spark.read.parquet(target).collect()
    )
    assert got == [("2023", 9), ("2024", 3)]


def test_bucketed_join_skips_shuffle(spark, sf_dir):
    """Bucketed co-located join (SURVEY §7.3.6): joining two tables
    bucketed on the same key must produce a SortMergeJoin with NO shuffle
    exchange — the layout that makes fact⋈fact joins affordable at 100 TB."""
    from ir_analyses_spark.io.sources import load_table

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_quantity"
    )
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_totalprice")
    sinks.write_bucketed(li, "b_lineitem", ["l_orderkey"], n_buckets=8)
    sinks.write_bucketed(
        o.withColumnRenamed("o_orderkey", "l_orderkey"),
        "b_orders", ["l_orderkey"], n_buckets=8,
    )
    try:
        # force SMJ (at test scale the dim would broadcast and bypass
        # bucketing; at fact⋈fact scale SMJ is what the planner picks)
        joined = (
            spark.table("b_lineitem")
            .hint("merge")
            .join(spark.table("b_orders"), "l_orderkey")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan  # no shuffle
        assert joined.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_surrogate_key_deterministic(spark):
    df = spark.createDataFrame([("E1",), ("E1",), ("E2",)], "k string")
    keys = [r["sk"] for r in df.select(sinks.surrogate_key("k").alias("sk")).collect()]
    assert keys[0] == keys[1] != keys[2]


# ---------------------------------------------------------------------------
# events ts-unit probe: the same decode must hold for MICROS (current
# testdata), NANOS (earlier generator), and INT96 (legacy Spark writers).
# ---------------------------------------------------------------------------


def test_events_ts_unit_probe_and_decode(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ir_analyses_spark.io.sources import events_ts_unit, read_events

    sf = "/root/testdata/sf0.001"
    micros = read_events(spark, f"{sf}/events.parquet")
    assert events_ts_unit(f"{sf}/events.parquet") == "us"
    assert dict(micros.dtypes)["ts"] == "timestamp"

    # rewrite the same rows with a TIMESTAMP(NANOS) footer
    tbl = pq.read_table(f"{sf}/events.parquet")
    i = tbl.schema.get_field_index("ts")
    tbl_ns = tbl.set_column(
        i, "ts", tbl.column("ts").cast(pa.timestamp("ns"))
    )
    ns_path = str(tmp_path / "events_ns.parquet")
    pq.write_table(tbl_ns, ns_path)
    assert events_ts_unit(ns_path) == "ns"

    got = read_events(spark, ns_path)
    assert dict(got.dtypes)["ts"] == "timestamp"
    want_rows = sorted(map(tuple, micros.select("event_id", "ts").collect()))
    got_rows = sorted(map(tuple, got.select("event_id", "ts").collect()))
    assert got_rows == want_rows

    # empty-dir probe must NOT stick: files that arrive later decide the
    # unit (a cached 'us' here would decode the ns stage 1000x off)
    stage = tmp_path / "stage"
    stage.mkdir()
    assert events_ts_unit(str(stage)) == "us"
    pq.write_table(tbl_ns, str(stage / "part-0.parquet"))
    assert events_ts_unit(str(stage)) == "ns"

    # regenerating a file in place (new mtime/size) re-probes
    regen = tmp_path / "regen.parquet"
    pq.write_table(tbl_ns, str(regen))
    assert events_ts_unit(str(regen)) == "ns"
    import os as _os
    import time as _time

    _time.sleep(0.01)
    pq.write_table(tbl, str(regen))
    _os.utime(regen)
    assert events_ts_unit(str(regen)) == "us"

    # a mixed-unit directory fails loudly instead of decoding half wrong
    mixed = tmp_path / "mixed"
    mixed.mkdir()
    pq.write_table(tbl, str(mixed / "part-0.parquet"))
    pq.write_table(tbl_ns, str(mixed / "part-1.parquet"))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="mixed timestamp units"):
        events_ts_unit(str(mixed))


# ---------------------------------------------------------------------------
# EDINET HTTP client (io/edinet_http.py): full client logic exercised with
# an injected in-memory transport — zero network, same code paths.
# ---------------------------------------------------------------------------


def _fake_edinet_transport(tmp_path):
    """(transport, log): serves documents.json and per-doc ZIPs from memory."""
    import io as _io
    import json as _json
    import zipfile as _zip

    results = [
        {"docID": "D1", "filerName": "株式会社テスト", "docDescription": "四半期報告書（第3期）"},
        {"docID": "D2", "filerName": "年次株式会社", "docDescription": "有価証券報告書"},
        {"docID": "D3", "filerName": "第二テスト株式会社", "docDescription": "四半期報告書（第1期）"},
    ]
    tsv = (
        "要素ID\t項目名\tコンテキストID\t相対年度\t連結・個別\t期間・時点\t"
        "ユニットID\t単位\t値\n"
        'jpdei_cor:EDINETCodeDEI\tEDINETコード\tFilingDateInstant\t'
        "提出日時点\tその他\t時点\t－\t－\tE99999\n"
    ).encode("utf-16-le")
    tsv = b"\xff\xfe" + tsv  # BOM'd UTF-16LE, the real EDINET export shape

    def make_zip(doc_id):
        buf = _io.BytesIO()
        with _zip.ZipFile(buf, "w") as z:
            z.writestr(f"XBRL_TO_CSV/jpcrp_{doc_id}.csv", tsv)
            z.writestr("XBRL_TO_CSV/jpaud_ignored.csv", b"x")  # non-jpcrp
            z.writestr("manifest.xml", b"<m/>")
        return buf.getvalue()

    log = []

    def transport(url, params):
        log.append((url, dict(params)))
        if url.endswith("/documents.json"):
            if params["date"] == "2024-02-09":
                return _json.dumps({"results": results}).encode()
            return _json.dumps({"metadata": {"status": "404"}}).encode()
        if "/documents/" in url:
            doc_id = url.rsplit("/", 1)[1]
            if doc_id == "BADZIP":
                return b"this is not a zip"
            return make_zip(doc_id)
        raise AssertionError(f"unexpected url {url}")

    return transport, log


def test_edinet_client_list_filter_and_docid(tmp_path):
    from ir_analyses_spark.io.edinet_http import EdinetApiError, EdinetClient

    transport, log = _fake_edinet_transport(tmp_path)
    c = EdinetClient(api_key="k", transport=transport)
    quarterly = c.quarterly_filings("2024-02-09")
    assert [r["docID"] for r in quarterly] == ["D1", "D3"]  # 有報 filtered out
    assert log[0][1]["Subscription-Key"] == "k" and log[0][1]["type"] == 2
    assert c.doc_id_for_company(quarterly, "第二テスト株式会社") == "D3"
    with pytest.raises(EdinetApiError, match="見つかりませんでした"):
        c.doc_id_for_company(quarterly, "存在しない会社")
    with pytest.raises(EdinetApiError, match="no 'results'"):
        c.list_documents("2024-02-10")


def test_edinet_client_download_extract_and_spark_scan(spark, tmp_path):
    """End-to-end offline: list → ZIP download → jpcrp member extraction →
    the engine's encoding-sniffed distributed scan reads the extracted
    UTF-16 TSVs (the reference's fetch_single_company_dataframe path,
    reference utils/api.py:96-139)."""
    from ir_analyses_spark.io.edinet_http import EdinetApiError, EdinetClient
    from ir_analyses_spark.io.sources import read_filing_csvs

    transport, _ = _fake_edinet_transport(tmp_path)
    c = EdinetClient(api_key="k", transport=transport)
    paths = c.download_quarterly_filings(["2024-02-09"], str(tmp_path / "dl"))
    assert len(paths) == 2  # D1 + D3, one jpcrp member each
    assert all("jpaud" not in p for p in paths)

    df = read_filing_csvs(spark, paths)
    rows = df.collect()
    assert len(rows) == 2  # one data row per filing
    assert {r["値"] for r in rows} == {"E99999"}

    with pytest.raises(EdinetApiError, match="not a ZIP"):
        c.save_filing_csvs("BADZIP", str(tmp_path / "dl2"))


def test_edinet_client_typed_errors_and_skip(tmp_path, monkeypatch):
    """Missing key fails fast; transport exceptions surface as
    EdinetApiError; skip_errors=True keeps a backfill going and reports
    what it skipped."""
    from ir_analyses_spark.io.edinet_http import EdinetApiError, EdinetClient

    monkeypatch.delenv("EDINET_API_KEY", raising=False)
    with pytest.raises(EdinetApiError, match="no API key"):
        EdinetClient(transport=lambda u, p: b"{}").list_documents("2024-02-09")

    def flaky(url, params):
        raise TimeoutError("connect timeout")

    with pytest.raises(EdinetApiError, match="GET .* failed"):
        EdinetClient(api_key="k", transport=flaky).list_documents("2024-02-09")

    # skip_errors: one good date + one bad date + one corrupt ZIP
    transport, _ = _fake_edinet_transport(tmp_path)

    def mostly_good(url, params):
        if url.endswith("/documents/D3"):
            return b"broken"  # corrupt ZIP for one filing
        return transport(url, params)

    c = EdinetClient(api_key="k", transport=mostly_good)
    errs = []
    paths = c.download_quarterly_filings(
        ["2024-02-09", "2024-02-10"],  # 02-10 has no 'results'
        str(tmp_path / "dl3"),
        skip_errors=True,
        errors=errs,
    )
    assert len(paths) == 1  # D1 extracted; D3 and 02-10 skipped
    assert {e[0] for e in errs} == {"D3", "2024-02-10"}
    # default stays all-or-nothing
    with pytest.raises(EdinetApiError):
        c.download_quarterly_filings(
            ["2024-02-09", "2024-02-10"], str(tmp_path / "dl4")
        )


def test_sniff_encoding_truncated_multibyte_sample(tmp_path):
    """A 64 KiB sample that cuts a 3-byte UTF-8 character mid-sequence must
    still classify as UTF-8 (the incremental decoder treats the trailing
    partial sequence as pending, not an error) — a strict decode would
    misread the whole file as CP932 mojibake."""
    p = tmp_path / "big_utf8.csv"
    data = ("あいうえお" * 20000).encode("utf-8")
    # ensure the default 64 KiB cut lands mid-character
    assert_raises = False
    try:
        data[: 64 * 1024].decode("utf-8")
    except UnicodeDecodeError:
        assert_raises = True
    assert assert_raises, "fixture must cut a multibyte sequence"
    p.write_bytes(data)
    assert sources.sniff_encoding(str(p)) == "UTF-8"


def test_edinet_stream_reader_incremental(spark, tmp_path):
    """Streaming S4: the date-offset stream reader ingests each date
    exactly once across restarts — run to availableNow, add a date, rerun
    on the SAME checkpoint, and only the new date arrives; the WAL replay
    path (readBetweenOffsets) re-lists deterministically."""
    import json

    from ir_analyses_spark.io.edinet_datasource import (
        EdinetFixtureDataSource,
        EdinetFixtureStreamReader,
    )

    d = tmp_path / "lists"
    d.mkdir()

    def put(date, n):
        payload = {
            "results": [
                {
                    "docID": f"S{date}-{i}",
                    "edinetCode": "E1",
                    "filerName": "f",
                    "docDescription": "desc",
                    "submitDateTime": f"{date} 15:00",
                }
                for i in range(n)
            ]
        }
        (d / f"{date}.json").write_text(json.dumps(payload), encoding="utf-8")

    put("2024-02-09", 2)
    put("2024-02-13", 1)
    spark.dataSource.register(EdinetFixtureDataSource)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run_once():
        q = (
            spark.readStream.format("edinet_fixture")
            .option("path", str(d))
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert spark.read.parquet(out).count() == 3

    put("2024-02-20", 4)  # a new date appears; old dates unchanged
    run_once()
    got = spark.read.parquet(out)
    assert got.count() == 7  # 3 + the new 4, nothing re-ingested
    assert got.filter("date = '2024-02-20'").count() == 4

    # WAL replay: same offset pair → identical rows, any number of times
    r = EdinetFixtureStreamReader({"path": str(d)})
    a = list(r.readBetweenOffsets({"last_date": "2024-02-09"}, {"last_date": "2024-02-20"}))
    b = list(r.readBetweenOffsets({"last_date": "2024-02-09"}, {"last_date": "2024-02-20"}))
    assert a == b and len(a) == 5  # the 02-13 row + the four 02-20 rows
