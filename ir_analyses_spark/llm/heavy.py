"""Exact distributed heavy hitters — Misra-Gries two-phase (LLM ext).

Frequent-token mining over a corpus is the vocabulary/stopword side of
the tokenizer pipeline (`llm/tokenize.py` counts ALL pairs; this finds
only the heavy tail-free head, which is the query a 100 TB corpus can
actually afford). The naive plan — groupBy(token).count() over every
token occurrence — shuffles the full token-cardinality table just to
throw almost all of it away. The classic two-phase exact algorithm
avoids that:

Phase 1 (map-only, ZERO shuffle): each partition builds a Misra-Gries
summary (Misra & Gries 1982, "Finding repeated elements") with
``k = ceil(1000 / phi_permille)`` counters and emits at most k
(token, est) rows. The MG guarantee is one-sided: any token whose
partition-local count c_p exceeds n_p/k survives the partition's
summary. A GLOBAL heavy hitter (total count > phi·n = phi·Σ n_p) must
have c_p > phi·n_p ≥ n_p/k in at least one partition (else summing the
per-partition bounds contradicts the total), so every true heavy
hitter appears in at least one summary — candidates can only be
over-complete, never under.

Phase 2: the union of summaries (≤ k rows PER PARTITION) is distinct'd
and broadcast as the candidate set; one semi-join + groupBy recounts
only candidate tokens exactly, and an integer-arithmetic filter
(cnt·1000 > n·phi_permille, no float cut) keeps the true heavy
hitters. The result provably EQUALS the full groupBy answer — the
sketch only prunes the shuffle, never the semantics — which is why
this row carries a full DuckDB oracle rather than a bound twin.
Candidate-set sizing at 100 TB: the k·P worst case (10^5 partitions ×
k≈33 ≈ 3M tokens) is still a tens-of-MB broadcast, and the distinct
collapses it far below that in practice — a genuinely heavy token
appears in MOST partitions' summaries, and a partition whose stream
is locally uniform contributes few or zero survivors (every counter
decrements away; pinned in tests/test_heavy.py).

At 100 TB: the only shuffles are the ≤ k·P-row summary union and the
candidate-only recount (heavy tokens are by definition few); the
full-vocabulary shuffle never happens. The corpus is scanned twice
(once per phase) — at scale a rescan is cheaper than persisting an
exploded token table 5-10× the corpus size.

Inside the Arrow batches the merge loop runs over value_counts()'
UNIQUE tokens (the weighted-update form of MG — summaries are
mergeable, Agarwal et al. PODS 2012), not per row — the same
deduped-frontier shape as `ops/skyline._local_skyline`.

Tokenization is the repo's pinned single-space convention
(`llm/textstats.doc_frequency`), so the DuckDB twin reproduces the
stream exactly. Reference parity: the reference app has no sketch or
frequency mining at all — its closest aggregation surface is the
per-filing pandas extraction in `utils/data_mapper.py:11`
(standardize_raw_data) and the chart assembly in `app/app.py`; this
row is part of the §2B/LLM capability closure, not a port.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io.sources import load_table

#: registry threshold: 30‰ of the token stream. The sf corpora's most
#: frequent tokens sit at ~34-35‰ and the next tier well below — both
#: the kept and the recount-pruned branches are non-vacuous at every
#: correctness SF (pinned in tests/test_heavy.py).
_PHI_PERMILLE = 30


def _merge_weighted(counters: dict, tokens, weights, k: int) -> None:
    """Weighted Misra-Gries update, in place: add each (token, weight),
    then decrement-and-prune down to at most k live counters. The
    decrement step subtracts the (k+1)-th largest value from every
    counter (the batched form of MG's repeated min-decrement — same
    survivor set, one pass)."""
    for t, w in zip(tokens, weights):
        counters[t] = counters.get(t, 0) + int(w)
    if len(counters) > k:
        # the (k+1)-th largest count is the amount EVERY counter can
        # shed while keeping at most k strictly-positive survivors
        cut = sorted(counters.values(), reverse=True)[k]
        for t in list(counters):
            c = counters[t] - cut
            if c > 0:
                counters[t] = c
            else:
                del counters[t]


def misra_gries_summaries(tokens: DataFrame, k: int) -> DataFrame:
    """Per-partition MG(k) summaries: ≤ k (token, est) rows per input
    partition, no shuffle. ``tokens`` needs a single ``token`` column."""

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            vc = pdf["token"].value_counts()
            _merge_weighted(counters, vc.index.to_numpy(), vc.to_numpy(), k)
        yield pd.DataFrame(
            {"token": list(counters), "est": list(counters.values())}
        )

    return tokens.mapInPandas(part, schema="token string, est long")


def heavy_hitters(docs: DataFrame, phi_permille: int = _PHI_PERMILLE) -> DataFrame:
    """Exact tokens with count·1000 > n_tokens·phi_permille, via the
    two-phase plan above. Output: (token, cnt, n_tokens)."""
    if not 0 < phi_permille < 1000:
        raise ValueError(f"phi_permille must be in (0, 1000), got {phi_permille}")
    k = -(-1000 // phi_permille)  # ceil(1/phi) counters
    tokens = docs.select(F.explode(F.split("text", " ")).alias("token"))
    cands = misra_gries_summaries(tokens, k).select("token").distinct()
    # total token count rides the same scan shape but never explodes
    totals = docs.agg(
        F.sum(F.size(F.split("text", " "))).alias("n_tokens")
    )
    return (
        tokens.join(F.broadcast(cands), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(totals))
        .filter(
            F.col("cnt") * F.lit(1000)
            > F.col("n_tokens") * F.lit(phi_permille)
        )
    )


def heavy_hitters_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: exact >30‰ tokens over the documents table."""
    return heavy_hitters(load_table(spark, "documents", sf_dir))


HEAVY_HITTERS_SQL = f"""
WITH toks AS (
  SELECT UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents
),
tot AS (SELECT COUNT(*) AS n_tokens FROM toks)
SELECT token, COUNT(*) AS cnt, MAX(tot.n_tokens) AS n_tokens
FROM toks, tot
GROUP BY token
HAVING COUNT(*) * 1000 > MAX(tot.n_tokens) * {_PHI_PERMILLE}
"""

QUERIES = {"heavy_hitters_tokens": heavy_hitters_tokens}
ORACLES = {"heavy_hitters_tokens": HEAVY_HITTERS_SQL}
