"""Line/paragraph-level deduplication for training corpora (SURVEY §2B
LLM ext — the C4/CCNet-family operators that work BELOW document
granularity, complementing `llm/dedup`'s document-level exact/near
dedup).

Three operators:

- :func:`dedup_units_within_doc` — drop repeated lines/paragraphs
  inside each document, keeping first occurrences (boilerplate like
  repeated nav text). Pure expression: split → order-preserving
  ``array_distinct`` → rejoin; one scan, no shuffle.
- :func:`global_frequent_units` — the corpus-wide frequency table of
  text units, counted by DISTINCT document (a unit repeated 50× in one
  page is within-doc noise, not corpus boilerplate).
- :func:`remove_global_duplicate_units` — CCNet/RefinedWeb global
  dedup: remove every unit that appears in ≥ ``min_doc_count``
  documents, rebuilding each document with its surviving units in
  original order.

Scale posture (the part that matters at 100 TB): the global pass
joins on ``xxhash64(unit)`` — 8 bytes per unit — so the frequency
aggregation and the anti-join ship hashes, not paragraph text, and the
aggregation gets a map-side partial on the hash key. The frequent-unit
set's anti-join strategy is ADAPTIVE by default: AQE's runtime stats
broadcast it only when its materialized size is actually small —
at Common Crawl scale the ≥2-doc line set is billions of rows and an
unconditional broadcast would OOM the driver (``broadcast_frequent``
forces either path; see :func:`remove_global_duplicate_units`).
Reassembly
aggregates (doc_id) once with a sort_array over (pos, unit) structs —
one shuffle keyed by doc_id. 64-bit hash collision risk is the CCNet
trade: ~n²/2⁶⁵ false merges (≈3×10⁻⁹ at a billion distinct units),
documented rather than hidden.

New module per the evidence-ledger rule; verified by
`tests/test_linedup.py` against an independent pure-Python reference
on a crafted corpus plus invariants on the real `documents` table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: "sentence" is the heuristic segmentation C4 uses for span dedup:
#: split after [.!?] runs followed by whitespace (Java and Python
#: regex both support the lookbehind, so the test reference is exact).
_SPLIT_PATTERNS = {
    "line": r"\n",
    "paragraph": r"\n{2,}",
    "sentence": r"(?<=[.!?])\s+",
}
_JOINERS = {"line": "\n", "paragraph": "\n\n", "sentence": " "}


def _unit_pattern(unit: str) -> tuple[str, str]:
    if unit not in _SPLIT_PATTERNS:
        raise ValueError(f"unit must be one of {sorted(_SPLIT_PATTERNS)}, got {unit!r}")
    return _SPLIT_PATTERNS[unit], _JOINERS[unit]


def _units_col(unit: str):
    pat, _ = _unit_pattern(unit)
    # full-whitespace trim (F.trim strips only ASCII space — a trailing
    # tab would make 'footer\t' hash differently from 'footer' and
    # escape dedup; this must match the Python references' str.strip)
    return F.filter(
        F.transform(
            F.split("text", pat),
            lambda s: F.regexp_replace(s, r"^\s+|\s+$", ""),
        ),
        lambda s: s != F.lit(""),
    )


def dedup_units_within_doc(docs: DataFrame, unit: str = "line") -> DataFrame:
    """(doc_id, text) with repeated lines/paragraphs dropped, first
    occurrence kept — ``array_distinct`` preserves encounter order.
    Units are trimmed; blank units vanish (they are separators, not
    content)."""
    _, joiner = _unit_pattern(unit)
    return docs.select(
        "doc_id",
        F.array_join(F.array_distinct(_units_col(unit)), joiner).alias("text"),
    )


def exploded_units(docs: DataFrame, unit: str = "line") -> DataFrame:
    """(doc_id, pos, unit_text, unit_hash) — one row per non-blank
    trimmed unit, position-stamped for order-faithful reassembly."""
    return docs.select(
        "doc_id", F.posexplode(_units_col(unit)).alias("pos", "unit_text")
    ).withColumn("unit_hash", F.xxhash64("unit_text"))


def global_frequent_units(
    docs: DataFrame, unit: str = "line", min_doc_count: int = 2
) -> DataFrame:
    """(unit_text, n_docs) for units appearing in ≥ ``min_doc_count``
    DISTINCT documents. The count aggregates (unit_hash, doc_id) pairs
    first — 16 bytes a row — and resolves hash → text only for the
    surviving frequent units via min(unit_text) (identical for every
    row of a hash short of a 64-bit collision)."""
    if min_doc_count < 1:
        raise ValueError("min_doc_count must be >= 1")
    u = exploded_units(docs, unit)
    return (
        u.groupBy("unit_hash")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.min("unit_text").alias("unit_text"),
        )
        .filter(F.col("n_docs") >= min_doc_count)
        .select("unit_text", "n_docs")
    )


def remove_global_duplicate_units(
    docs: DataFrame,
    unit: str = "line",
    min_doc_count: int = 2,
    broadcast_frequent: bool | None = None,
) -> DataFrame:
    """Rebuild every document without the units that occur in
    ≥ ``min_doc_count`` distinct documents (global boilerplate removal).

    Documents whose units ALL get removed still come out, with empty
    text — a curation pipeline quarantines them downstream, it doesn't
    lose them silently.

    ``broadcast_frequent`` picks the anti-join strategy for the
    frequent-unit set (r7 VERDICT: an unconditional broadcast default
    was a 100 TB footgun — at Common Crawl scale the set of lines
    appearing in ≥2 documents is billions of rows and would OOM the
    driver). ``None`` (default) is ADAPTIVE: no hint is placed and
    AQE's runtime statistics convert the shuffled anti-join to a
    broadcast one exactly when the materialized frequent set is small
    (under ``spark.sql.adaptive.autoBroadcastJoinThreshold``) — no
    extra driver-side counting job, and the decision uses the set's
    real post-aggregation size, not an estimate. ``True`` forces the
    broadcast hint (caller knows the set is dimension-sized); ``False``
    pins the shuffled hash path even when AQE would broadcast (the
    8-byte-key join is shuffle-cheap by construction).
    """
    if min_doc_count < 1:
        raise ValueError("min_doc_count must be >= 1")
    _, joiner = _unit_pattern(unit)
    u = exploded_units(docs, unit)
    freq = (
        u.groupBy("unit_hash")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_doc_count)
        .select("unit_hash")
    )
    if broadcast_frequent is True:
        freq = F.broadcast(freq)
    elif broadcast_frequent is False:
        freq = freq.hint("shuffle_hash")
    kept = u.join(freq, "unit_hash", "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "unit_text"))),
                lambda s: s["unit_text"],
            ),
            joiner,
        ).alias("text")
    )
    return (
        docs.select("doc_id")
        .join(rebuilt, "doc_id", "left")
        .select("doc_id", F.coalesce("text", F.lit("")).alias("text"))
    )


def remove_duplicate_spans(
    docs: DataFrame, span: int = 3, unit: str = "sentence"
) -> DataFrame:
    """C4's span-level dedup (Raffel et al. 2020 §2.2: "we discarded all
    but one of any three-sentence span occurring more than once"),
    distributed with a deterministic winner rule.

    Every window of ``span`` consecutive units is hashed; for a hash
    occurring more than once corpus-wide, the occurrence with the
    smallest (doc_id, pos) is the canonical one and every OTHER
    occurrence has its ``span`` units removed from its document.
    Documents are rebuilt from the surviving units in order (empty text
    when nothing survives — never silently dropped).

    Scale: spans shuffle as (8-byte hash, doc_id, pos) triples — unit
    text never rides the duplicate-detection shuffle; the duplicated-
    hash set is the small side and the winner resolution is one
    aggregation on the hash key. Windows overlap, so a duplicated span
    removes whole sentences, not exact char ranges — C4's semantics.
    """
    if span < 1:
        raise ValueError("span must be >= 1")
    _, joiner = _unit_pattern(unit)
    units = exploded_units(docs, unit)
    # per-doc span hashes, built row-side then exploded: windows of
    # `span` consecutive units, hashed over a 0x1f-joined concatenation
    arr = _units_col(unit)
    spans = docs.select(
        "doc_id",
        F.posexplode(
            F.when(
                F.size(arr) >= span,
                F.transform(
                    F.sequence(F.lit(1), F.size(arr) - F.lit(span - 1)),
                    lambda i: F.xxhash64(
                        F.array_join(F.slice(arr, i, span), "\x1f")
                    ),
                ),
            ).otherwise(F.array().cast("array<bigint>"))
        ).alias("pos", "span_hash"),
    )
    winners = spans.groupBy("span_hash").agg(
        F.count(F.lit(1)).alias("n_occ"),
        F.min(F.struct("doc_id", "pos")).alias("w"),
    )
    losers = (
        spans.join(winners.filter(F.col("n_occ") >= 2), "span_hash")
        .filter(
            (F.col("doc_id") != F.col("w.doc_id"))
            | (F.col("pos") != F.col("w.pos"))
        )
        .select("doc_id", "pos")
    )
    removed = losers.select(
        "doc_id",
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + F.lit(span - 1))
        ).alias("pos"),
    ).distinct()
    kept = units.join(removed, ["doc_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "unit_text"))),
                lambda s: s["unit_text"],
            ),
            joiner,
        ).alias("text")
    )
    return (
        docs.select("doc_id")
        .join(rebuilt, "doc_id", "left")
        .select("doc_id", F.coalesce("text", F.lit("")).alias("text"))
    )
