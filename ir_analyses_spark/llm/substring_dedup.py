"""Character-level duplicated-substring detection and removal — the
bottom rung of the dedup ladder (document → line → span → SUBSTRING),
motivated by Lee et al. 2022 ("Deduplicating Training Data Makes
Language Models Better"): corpora repeat long character runs that line
or sentence units never align with (templated fragments mid-line,
concatenated boilerplate). Their suffix-array construction is a
single-machine recipe; the Spark-first equivalent here is WINNOWING
(Schleimer, Wilkerson & Aiken 2003, the MOSS fingerprinter):

- every k-char window gets a rolling hash; each sliding window of
  ``w`` consecutive hashes keeps its MINIMUM (rightmost on ties — the
  robust-winnowing rule). Guarantee: any exact match of length
  ≥ w + k − 1 shares at least one selected fingerprint, at density
  ~2/(w+1) instead of one row per character — that density factor is
  exactly what makes corpus-wide substring dedup shuffle-viable at
  100 TB (the per-character alternative ships one row per byte).

Two operators:

- :func:`winnow_fingerprints` — (doc_id, pos, fp) selected
  fingerprints; the audit/report surface (what plagiarism checkers and
  corpus inspectors consume).
- :func:`remove_duplicated_substrings` — removal at detection
  granularity: a selected fingerprint whose (fp, k-gram prefix) occurs
  in ≥2 documents marks its k-char window; per doc, marked windows
  merge into maximal character ranges, and every occurrence EXCEPT the
  corpus-wide smallest (doc_id, pos) loses its ranges (the same
  deterministic keep-one rule as `llm/linedup.remove_duplicate_spans`).
  Detection is exact at k-gram granularity (duplicated runs shorter
  than w + k − 1 may be missed — the winnowing bound, documented);
  false hash merges are excluded by carrying the k-gram's FIRST 8
  CHARS next to the 64-bit hash and grouping on both.

Scale posture: fingerprinting is one scan of codegen expressions
(transform over an index sequence — no explode until selection); the
corpus-wide shuffle ships (8-byte fp, 8-char probe, doc_id, pos) rows
at winnowed density; range merge + rebuild are per-doc aggregations on
the doc_id key. Text substrings never ride the dedup shuffle beyond
the 8-char collision probe.

New module per the evidence-ledger rule; pytest-oracled against a
pure-Python reference (`tests/test_substring_dedup.py`) — the
selection rule and removal semantics are deterministic, so the
reference is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _kgram_hashes(text_col, k: int):
    """Array of xxhash64 over each k-char window (empty when shorter)."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.when(
        F.length(t) >= k,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - F.lit(k - 1)),
            lambda i: F.xxhash64(t.substr(i, F.lit(k))),
        ),
    ).otherwise(F.array().cast("array<bigint>"))


def winnow_fingerprints(
    docs: DataFrame, k: int = 16, window: int = 8, text_col: str = "text"
) -> DataFrame:
    """(doc_id, pos, fp) — robust-winnowing selection over k-gram
    hashes. ``pos`` is the 0-based character offset of the selected
    k-gram. Guarantee: two documents sharing an exact substring of
    length ≥ ``window + k - 1`` share at least one (pos-aligned) fp."""
    if k < 2:
        raise ValueError("k must be >= 2")
    if window < 1:
        raise ValueError("window must be >= 1")
    hashes = _kgram_hashes(text_col, k)
    # robust winnowing: position j (0-based over hash windows) selects
    # the minimum of hashes[j .. j+window-1], RIGHTMOST occurrence on
    # ties; dedupe identical (pos, fp) selections from adjacent windows
    selected = F.when(
        F.size(hashes) >= window,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(hashes) - F.lit(window - 1)),
                lambda j: F.aggregate(
                    F.sequence(F.lit(0), F.lit(window - 1)),
                    F.struct(
                        F.lit(-1).cast("int").alias("pos"),
                        F.lit(None).cast("bigint").alias("fp"),
                    ),
                    lambda acc, off: F.when(
                        acc["fp"].isNull()
                        | (F.element_at(hashes, j + off) <= acc["fp"]),
                        F.struct(
                            (j + off - 1).cast("int").alias("pos"),
                            F.element_at(hashes, j + off).alias("fp"),
                        ),
                    ).otherwise(acc),
                ),
            )
        ),
    ).otherwise(
        F.array().cast("array<struct<pos:int,fp:bigint>>")
    )
    return docs.select(
        "doc_id", F.explode(selected).alias("s")
    ).select("doc_id", F.col("s.pos").alias("pos"), F.col("s.fp").alias("fp"))


def remove_duplicated_substrings(
    docs: DataFrame, k: int = 16, window: int = 8, text_col: str = "text"
) -> DataFrame:
    """(doc_id, text) with cross-document duplicated character runs cut
    out of every occurrence except the corpus-wide smallest
    (doc_id, pos) one. See module docstring for the guarantee and
    granularity."""
    fps = winnow_fingerprints(docs, k, window, text_col)
    # collision probe: the k-gram's first 8 chars ride along so a
    # 64-bit hash merge cannot fuse different substrings
    probed = fps.join(
        docs.select("doc_id", F.col(text_col).alias("_t")), "doc_id"
    ).select(
        "doc_id", "pos", "fp",
        F.col("_t").substr(F.col("pos") + 1, F.lit(8)).alias("probe"),
    )
    groups = probed.groupBy("fp", "probe").agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.min(F.struct("doc_id", "pos")).alias("w"),
    )
    losers = (
        probed.join(groups.filter(F.col("n_docs") >= 2), ["fp", "probe"])
        .filter(
            (F.col("doc_id") != F.col("w.doc_id"))
            | (F.col("pos") != F.col("w.pos"))
        )
        .select("doc_id", "pos")
    )
    # per-doc: marked k-char windows -> sorted (start, end) -> merge
    # overlapping/adjacent ranges -> cut from the text back to front
    ranges = losers.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct("pos"))).alias("marks")
    ).select(
        "doc_id",
        F.aggregate(
            F.col("marks"),
            F.array().cast("array<struct<s:int,e:int>>"),
            lambda acc, m: F.when(
                (F.size(acc) > 0)
                & (m["pos"] <= F.element_at(acc, -1)["e"]),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(
                        F.struct(
                            F.element_at(acc, -1)["s"].alias("s"),
                            F.greatest(
                                F.element_at(acc, -1)["e"],
                                m["pos"] + F.lit(k),
                            ).alias("e"),
                        )
                    ),
                ),
            ).otherwise(
                F.array_append(
                    acc,
                    F.struct(
                        m["pos"].alias("s"),
                        (m["pos"] + F.lit(k)).alias("e"),
                    ),
                )
            ),
        ).alias("ranges"),
    )
    rebuilt = docs.join(ranges, "doc_id", "left").select(
        "doc_id",
        F.when(F.col("ranges").isNull(), F.col(text_col)).otherwise(
            # survivors = the characters outside every cut range:
            # fold the ranges left-to-right, keeping [cursor, s) slices
            F.concat(
                F.aggregate(
                    F.col("ranges"),
                    F.struct(
                        F.lit(0).alias("cur"), F.lit("").alias("out")
                    ),
                    lambda acc, r: F.struct(
                        r["e"].alias("cur"),
                        F.concat(
                            acc["out"],
                            F.col(text_col).substr(
                                acc["cur"] + 1, r["s"] - acc["cur"]
                            ),
                        ).alias("out"),
                    ),
                    lambda acc: F.concat(
                        acc["out"],
                        F.col(text_col).substr(
                            acc["cur"] + 1,
                            F.length(F.col(text_col)) - acc["cur"],
                        ),
                    ),
                )
            )
        ).alias("text"),
    )
    return rebuilt
