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
  CHARS next to the 64-bit hash and grouping on both. Cuts splice at
  k-gram extents, never word boundaries — boundary words can fuse
  (see the cut-granularity contract on the function).
- :func:`remove_substrings_against_store` + the versioned on-disk
  fingerprint store (:func:`write_fingerprint_store` /
  :func:`read_fingerprint_store`) — the incremental form: new batches
  dedup against everything already exported, first-seen-wins across
  batches, and the store records its (k, window, hash scheme) so an
  incompatible call fails loudly instead of silently no-opping.

Scale posture: fingerprinting is one map-only scan — k-gram hashing is
a JVM expression and the selection pass is an Arrow-vectorized numpy
sliding-window argmin (no explode before selection, no shuffle; a pure
Catalyst-lambda formulation is quadratic because HOF bodies re-evaluate
embedded expressions per element, see ``_select_fingerprints_udf``).
Documents above ``_SEGMENT_CHARS`` are processed in overlapping
segments so no single row carries an unbounded hash array. The
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

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..ops.helpers import local_df

#: characters of the selected k-gram carried next to the 64-bit hash
#: so a hash collision can never fuse different substrings
_PROBE_CHARS = 8

#: default winnowing parameters — ONE definition shared by the
#: operator signatures here, `llm/curate.curation_stages`, and
#: `curatectl`'s store append (review-caught: three hard-coded copies
#: could drift, and a drifted CLI fallback would seed a store meta the
#: funnel's own dedup then refuses)
DEFAULT_K = 16
DEFAULT_WINDOW = 8

#: per-document segmentation bound: the k-gram hash array is built as a
#: single row value, so an unbounded document would become an
#: O(len·window) codegen evaluation and a very wide row (r8 VERDICT).
#: Documents above this bound are fingerprinted in overlapping
#: segments; the overlap (window + k − 2 chars) guarantees every run of
#: ``window`` consecutive k-gram hashes lies wholly inside at least one
#: segment, so the selected-fingerprint SET is exactly the unsegmented
#: one (winnowing selection is a pure per-window function).
_SEGMENT_CHARS = 1 << 20


def _kgram_hashes(text_col, k: int, hash_fn):
    """Array of 64-bit hashes over each k-char window (empty when
    shorter), via the caller-supplied JVM ``hash_fn`` (k-gram string
    column -> bigint column). Only the ``hash_fn`` path uses this —
    the default scale path hashes inside the Arrow worker
    (``poly_kgram_hashes``), so there is deliberately no fallback
    here."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    h = hash_fn
    return F.when(
        F.length(t) >= k,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - F.lit(k - 1)),
            lambda i: h(t.substr(i, F.lit(k))),
        ),
    ).otherwise(F.array().cast("array<bigint>"))


#: base of the scale path's polynomial k-gram hash (odd, so it is
#: invertible mod 2^64 and the rolling prefix trick below is exact)
_POLY_B = 1_000_003


def _inv_mod_2_64(b: int) -> int:
    """Multiplicative inverse of an odd ``b`` modulo 2^64 (Newton
    iteration doubles correct low bits each step: 6 steps ≥ 64 bits)."""
    x = b
    for _ in range(6):
        x = (x * (2 - b * x)) % (1 << 64)
    return x


_POLY_BINV = _inv_mod_2_64(_POLY_B)


def poly_kgram_hashes(s: str, k: int):
    """Exact uint64 polynomial hash of every k-char window of ``s`` —
    H(i) = Σ_t code[i+t]·B^t mod 2^64 — computed O(len) and fully
    vectorized: prefix sums of code[j]·B^j, then each window is
    (prefix[i+k] − prefix[i])·B⁻ⁱ (B odd ⇒ invertible mod 2^64, and
    numpy uint64 arithmetic wraps exactly like the modulus). This is
    the scale path's hash: a JVM ``substr``-based expression is
    O(len²) on long strings because UTF8String seeks character offsets
    linearly, and xxhash64 has no Python twin for the worker side.
    Collision-weak inputs are guarded by the probe, not the hash.
    Returns int64 (two's-complement view) to match Spark's bigint."""
    import numpy as np

    codes = np.frombuffer(s.encode("utf-32-le"), dtype="<u4").astype(
        np.uint64
    )
    n = codes.size
    if n < k:
        return np.empty(0, dtype=np.int64)
    b = np.uint64(_POLY_B)
    pw = np.empty(n, dtype=np.uint64)
    pw[0] = 1
    np.multiply.accumulate(
        np.full(n - 1, b, dtype=np.uint64), out=pw[1:]
    )
    prefix = np.zeros(n + 1, dtype=np.uint64)
    np.add.accumulate(codes * pw, out=prefix[1:])
    m = n - k + 1
    bpw = np.empty(m, dtype=np.uint64)
    bpw[0] = 1
    if m > 1:
        np.multiply.accumulate(
            np.full(m - 1, np.uint64(_POLY_BINV), dtype=np.uint64),
            out=bpw[1:],
        )
    return ((prefix[k:] - prefix[:-k]) * bpw).view(np.int64)


def _select_fingerprints_udf(
    k: int, window: int, jvm_hashes: bool, py_kgram_fn=None
):
    """Arrow-batched winnowing worker: hashes each segment's k-grams
    (``poly_kgram_hashes`` — or the caller's ``py_kgram_fn`` numpy
    twin — unless a JVM ``hash_fn`` already produced
    the array), then each sliding window of ``window`` hashes selects
    its minimum (rightmost on ties), runs of identical picks collapse
    to one, and the 8-char collision probe is cut from the segment
    text here — before any explode or shuffle."""
    from pyspark.sql.functions import pandas_udf

    empty = {"pos": [], "fp": [], "probe": []}

    # struct-of-arrays, zipped and exploded JVM-side by the caller: the
    # naive array<struct> return built one Python dict per selection —
    # at winnowed density that is ~0.2 dicts per corpus CHARACTER, and
    # the dict building dominated the whole operator
    @pandas_udf("struct<pos:array<int>,fp:array<bigint>,probe:array<string>>")
    def select(
        hs: pd.Series, seg: pd.Series, off: pd.Series
    ) -> pd.DataFrame:
        import numpy as np

        out: list[dict] = []
        for h, s, o in zip(hs, seg, off):
            if s is None:
                out.append(empty)
                continue
            if not jvm_hashes:
                h = (py_kgram_fn or poly_kgram_hashes)(s, k)
            if h is None or len(h) < window:
                out.append(empty)
                continue
            h = np.asarray(h, dtype=np.int64)
            wins = np.lib.stride_tricks.sliding_window_view(h, window)
            # rightmost tie: argmin over the REVERSED window gives the
            # distance from the window's right edge to the last minimum
            rel = (window - 1) - wins[:, ::-1].argmin(axis=1)
            pos = np.arange(h.size - window + 1, dtype=np.int64) + rel
            # consecutive windows picking the same position form a
            # contiguous run (the windows containing a given argmin are
            # contiguous); keep each run's first occurrence
            keep = np.empty(pos.size, dtype=bool)
            keep[0] = True
            np.not_equal(pos[1:], pos[:-1], out=keep[1:])
            sel = pos[keep]
            posl = sel.tolist()
            # the probe must never extend past the k-gram: for k < 8 an
            # 8-char slice would drag in per-document context and split
            # identical duplicated runs into different (fp, probe)
            # groups — the duplicate would silently survive
            # (review-caught); min(k, 8) also keeps the slice inside
            # the segment, so overlapping segments emit identical rows
            np_ = min(k, _PROBE_CHARS)
            out.append(
                {
                    "pos": (sel + int(o)).tolist(),
                    "fp": h[sel].tolist(),
                    "probe": [s[p : p + np_] for p in posl],
                }
            )
        # top-level StructType returns are a DataFrame of field columns
        return pd.DataFrame(out, columns=["pos", "fp", "probe"])

    return select


def _winnow_raw(
    docs: DataFrame,
    k: int,
    window: int,
    text_col: str,
    hash_fn=None,
    segment_chars: int = _SEGMENT_CHARS,
) -> DataFrame:
    """Selection rows BEFORE cross-segment dedup: a document longer
    than ``segment_chars`` may re-emit a boundary selection once per
    overlapping segment. The removal pipeline consumes this directly —
    its per-(fp, probe) window aggregates (min struct, max≠min doc
    test) and the range merge are duplicate-tolerant, so it skips the
    distinct's shuffle."""
    if k < 2:
        raise ValueError("k must be >= 2")
    if window < 1:
        raise ValueError("window must be >= 1")
    overlap = window + k - 2
    if segment_chars <= overlap:
        raise ValueError(
            f"segment_chars must exceed window + k - 2 = {overlap}"
        )
    t = F.col(text_col)
    step = segment_chars - overlap
    # ceil((len - segment_chars) / step) extra segments past the first;
    # a short doc gets exactly one (the explode is a 1-element array)
    n_segs = F.lit(1) + F.greatest(
        F.lit(0).cast("bigint"),
        F.ceil((F.length(t) - F.lit(segment_chars)) / F.lit(step)),
    )
    segs = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_segs - F.lit(1)),
                lambda s: F.struct(
                    (s * F.lit(step)).cast("int").alias("off"),
                    t.substr(
                        (s * F.lit(step) + 1).cast("int"),
                        F.lit(segment_chars),
                    ).alias("seg"),
                ),
            )
        ).alias("g"),
    ).select("doc_id", F.col("g.off").alias("off"), F.col("g.seg").alias("seg"))
    # Hashing + selection run in ONE Arrow-vectorized pandas UDF on the
    # scale path (O(len) rolling polynomial hash + O(len·window) numpy
    # sliding argmin, map-only — no shuffle, no explode before
    # selection). Two JVM-expression formulations were measured and
    # rejected: (a) higher-order-function winnowing is quadratic
    # because Catalyst inlines singly-referenced array columns back
    # into consuming lambdas and re-evaluates them per element (no CSE
    # inside HOF bodies); (b) even plain transform+substr k-gram
    # hashing is O(len²) on long strings because UTF8String seeks
    # character offsets linearly. A caller-supplied ``hash_fn`` keeps
    # the JVM expression path (the cross-engine oracle variant in
    # `llm/substring_queries.py` — dimension-sized docs, where the
    # substr seek cost is irrelevant).
    # r14 (guide §4): a ``hash_fn`` may carry a ``np_kgrams`` numpy
    # twin (segment str, k -> int64 array of every k-gram's hash,
    # bit-exact with the JVM expression). When it does, hashing moves
    # into the Arrow worker with the selection — the quadratic
    # substr-seek expression disappears AND the JVM ships one fewer
    # array column across the Python boundary. Measured on the sf0.1
    # documents table: the JVM porthash projection alone was 19-20 s;
    # the worker-side twin makes the whole winnow ~1.6 s.
    py_kgram_fn = getattr(hash_fn, "np_kgrams", None)
    jvm_hashes = hash_fn is not None and py_kgram_fn is None
    if jvm_hashes:
        hashed = segs.select(
            "doc_id", "off", "seg",
            _kgram_hashes(F.col("seg"), k, hash_fn).alias("_hs"),
        )
    else:
        hashed = segs.select(
            "doc_id", "off", "seg",
            F.lit(None).cast("array<bigint>").alias("_hs"),
        )
    picked = hashed.select(
        "doc_id",
        _select_fingerprints_udf(k, window, jvm_hashes, py_kgram_fn)(
            F.col("_hs"), F.col("seg"), F.col("off")
        ).alias("z"),
    )
    out = picked.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.col("z.pos").alias("pos"),
                F.col("z.fp").alias("fp"),
                F.col("z.probe").alias("probe"),
            )
        ).alias("s"),
    )
    return out.select(
        "doc_id",
        F.col("s.pos").alias("pos"),
        F.col("s.fp").alias("fp"),
        F.col("s.probe").alias("probe"),
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = DEFAULT_K,
    window: int = DEFAULT_WINDOW,
    text_col: str = "text",
    hash_fn=None,
    segment_chars: int = _SEGMENT_CHARS,
) -> DataFrame:
    """(doc_id, pos, fp, probe) — robust-winnowing selection over
    k-gram hashes. ``pos`` is the 0-based character offset of the
    selected k-gram; ``probe`` is its first ``min(k, _PROBE_CHARS)``
    characters (never past the k-gram — longer would drag in
    per-document context and split identical runs into different
    groups), emitted HERE, while the text is still in hand — so
    downstream consumers never join fingerprints back to corpus text
    just to rule out hash collisions (r8 VERDICT: that join put the
    text on the dedup shuffle the module claims it avoids). Guarantee:
    two documents sharing an exact substring of length
    ≥ ``window + k - 1`` share at least one (pos-aligned) fp.

    The default k-gram hash is the exact uint64 rolling POLYNOMIAL
    (``poly_kgram_hashes``, computed inside the Arrow worker — NOT
    xxhash64, which has no Python twin for the worker side);
    ``hash_fn`` swaps in a JVM expression hash instead — the portable
    mod-prime variant in `llm/substring_queries.py` uses this for its
    cross-engine oracle. ``segment_chars`` bounds the per-row cost:
    longer documents are fingerprinted in overlapping segments whose
    union of selections is exactly the unsegmented set (see
    ``_SEGMENT_CHARS``); the closing distinct (one hash exchange of
    winnowed-density rows, no text) folds boundary re-selections."""
    return _winnow_raw(
        docs, k, window, text_col, hash_fn, segment_chars
    ).distinct()


def _cut_marked(
    docs: DataFrame, losers: DataFrame, k: int, text_col: str
) -> DataFrame:
    """(doc_id, text) with every marked k-char window cut: marks
    merge into maximal ranges per doc and the survivors rebuild the
    text — the shared tail of the batch and incremental removers.
    Duplicate (doc_id, pos) marks are tolerated (range merge)."""
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


def remove_duplicated_substrings(
    docs: DataFrame,
    k: int = DEFAULT_K,
    window: int = DEFAULT_WINDOW,
    text_col: str = "text",
    hash_fn=None,
) -> DataFrame:
    """(doc_id, text) with cross-document duplicated character runs cut
    out of every occurrence except the corpus-wide smallest
    (doc_id, pos) one. See module docstring for the guarantee and
    granularity.

    CUT-GRANULARITY CONTRACT (r9 VERDICT item 6, decided: stay faithful
    to Lee et al. 2022, who splice at byte offsets): cuts happen at
    k-gram extents, NOT word boundaries, so the characters on either
    side of a cut are concatenated verbatim — a cut that swallows
    ``" and a "`` between ``"report"`` and ``"second"`` leaves the
    fused token ``"reportsecond"`` in the loser. This is deliberate
    (word-boundary snapping would re-grow text the corpus demonstrably
    duplicates and is language-specific), but it interacts with
    DOWNSTREAM WORD-BASED GATES: a loser document's post-cut word/
    stopword counts can differ from either original, so quality gates
    that run after this operator (the funnel runs Gopher rules after
    the substring stage) must be read as gating the CUT text. Pinned by
    ``tests/test_substring_dedup.py::test_cut_fuses_boundary_words``.

    The collision probe (k-gram prefix next to the 64-bit hash, so a
    hash merge cannot fuse different substrings) arrives ON the
    fingerprint rows — corpus text never rides any shuffle before the
    final per-doc rebuild join (r8 VERDICT: an earlier revision joined
    fingerprints back to the text just to cut the probe)."""
    from pyspark.sql import Window

    probed = _winnow_raw(docs, k, window, text_col, hash_fn)
    # loser detection is ONE pass over the fingerprint rows (a window
    # over the (fp, probe) key), not a groups⋈probed self-join: the
    # self-join form evaluated the Arrow winnowing scan — the
    # operator's entire cost — once per side (review-caught). The
    # "appears in ≥2 documents" test is max(doc_id) != min(doc_id)
    # over the group (exact, and window-legal where count_distinct is
    # not); the winner is the group-min (doc_id, pos) struct.
    grp = Window.partitionBy("fp", "probe")
    losers = (
        probed.withColumn("_w", F.min(F.struct("doc_id", "pos")).over(grp))
        .withColumn(
            "_multi", F.max("doc_id").over(grp) != F.min("doc_id").over(grp)
        )
        .filter(
            F.col("_multi")
            & (
                (F.col("doc_id") != F.col("_w.doc_id"))
                | (F.col("pos") != F.col("_w.pos"))
            )
        )
        .select("doc_id", "pos")
    )
    return _cut_marked(docs, losers, k, text_col)


#: scheme tag of the default Arrow-worker rolling hash; a store built
#: with any other ``hash_fn`` must carry its own tag (the fingerprints
#: of two schemes never join, so a mismatch silently no-ops the dedup —
#: r9 ADVICE; the store meta + guard below make it loud instead)
DEFAULT_HASH_SCHEME = f"poly64-b{_POLY_B}"

#: bump when the on-disk store layout changes incompatibly
_STORE_FORMAT_VERSION = 1


class FingerprintStoreMismatch(ValueError):
    """A fingerprint store's recorded (k, window, hash_scheme) does not
    match the parameters of the call trying to use it. Raised loudly:
    mismatched fingerprints never join, so proceeding would silently
    turn incremental dedup into a no-op while appending incompatible
    rows (r9 ADVICE)."""


class FingerprintStoreIdentityMismatch(FingerprintStoreMismatch):
    """The store was built under a DIFFERENT doc-identity rendering
    vintage than the engine's current one (``IDENTITY_RENDERING``,
    io/warc_datasource.py) — or predates the stamp entirely, in which
    case its vintage is unknowable after the fact (SCALE.md, r12
    migration note). The store's probe keys are (fp, xxhash64-derived
    probe) pairs whose doc side hashed the OLD rendering, so dedup
    against it can silently no-op (never cut text it shouldn't — the
    conservative direction — but the operator believes cross-batch
    dedup happened). Rebuild the store from the exported corpora, or
    pass ``allow_stale_identity=True`` (CLI: ``--force-store-vintage``)
    after verifying every path the store ever hashed renders
    identically under the current rule (r13 VERDICT item 2)."""


def _check_store_identity(
    meta: dict, allow_stale_identity: bool = False
) -> None:
    from ..io.warc_datasource import IDENTITY_RENDERING

    got = meta.get("identity_rendering")
    if got != IDENTITY_RENDERING and not allow_stale_identity:
        raise FingerprintStoreIdentityMismatch(
            f"fingerprint store identity_rendering is "
            f"{got if got is not None else 'UNSTAMPED (pre-r14 store)'}, "
            f"engine renders {IDENTITY_RENDERING!r}; rebuild the store "
            f"or pass allow_stale_identity=True / --force-store-vintage "
            f"after verifying path-rendering stability"
        )


def _check_store_meta(
    meta: dict,
    k: int,
    window: int,
    hash_scheme: str,
    allow_stale_identity: bool = False,
) -> None:
    want = {"k": k, "window": window, "hash_scheme": hash_scheme}
    got = {f: meta.get(f) for f in want}
    if got != want:
        raise FingerprintStoreMismatch(
            f"fingerprint store was built with {got}, call uses {want}"
        )
    v = meta.get("format_version")
    if v != _STORE_FORMAT_VERSION:
        raise FingerprintStoreMismatch(
            f"store format_version {v} != supported {_STORE_FORMAT_VERSION}"
        )
    _check_store_identity(meta, allow_stale_identity)


def write_fingerprint_store(
    fps: DataFrame,
    path: str,
    k: int,
    window: int,
    hash_scheme: str = DEFAULT_HASH_SCHEME,
    allow_stale_identity: bool = False,
) -> None:
    """Append ``(fp, probe)`` rows to the versioned on-disk store at
    ``path``, creating it (with its parameter record) on first write.

    Layout: ``<path>/fingerprints`` (parquet, append-only) +
    ``<path>/_store_meta`` (one JSON row: k, window, hash_scheme,
    format_version, identity_rendering — written via Spark so the
    store works on any Hadoop-visible filesystem, not just the local
    one). Every append validates the call's parameters against the
    recorded ones and raises :class:`FingerprintStoreMismatch` instead
    of mixing incompatible fingerprints; a store stamped with (or
    predating) a different doc-identity rendering vintage raises
    :class:`FingerprintStoreIdentityMismatch` unless
    ``allow_stale_identity`` (r13 VERDICT item 2 — probe keys hash the
    emitted path, so a rendering change silently un-joins old stores). Single-writer append-only discipline
    (the same contract as the txn table's manifest): the store is only
    ever appended AFTER its batch's export lands, so a crash in
    between leaves future batches keeping a duplicate (conservative)
    rather than cutting text the corpus never shipped. A crash between
    the meta write and the fingerprint append leaves a meta-only store,
    which readers treat as EMPTY (same conservative direction) and the
    next append repairs (r10 ADVICE)."""
    from ..io.warc_datasource import IDENTITY_RENDERING

    spark = fps.sparkSession
    meta = _read_store_meta(spark, path)
    if meta is None:
        local_df(
            spark,
            [(
                int(k), int(window), hash_scheme, _STORE_FORMAT_VERSION,
                IDENTITY_RENDERING,
            )],
            "k int, window int, hash_scheme string, format_version int, "
            "identity_rendering string",
        ).coalesce(1).write.mode("overwrite").json(f"{path}/_store_meta")
    else:
        _check_store_meta(meta, k, window, hash_scheme, allow_stale_identity)
    # an interrupted compaction must be resolved BEFORE appending: an
    # append that recreates ``fingerprints/`` while the __old dir still
    # holds the real data would permanently strand it
    _recover_store_swap(path)
    fps.select("fp", "probe").write.mode("append").parquet(
        f"{path}/fingerprints"
    )


def _read_store_meta(spark, path: str) -> dict | None:
    from pyspark.errors import AnalysisException

    try:
        row = spark.read.json(f"{path}/_store_meta").head()
    except AnalysisException:
        return None
    if row is None:
        return None
    return row.asDict()


#: directory the live fingerprints sit at while a compaction swap is in
#: flight — `io/sinks._swap_in`'s ``__old`` convention (the store reuses
#: the sinks staged-swap helpers rather than re-implementing the
#: rename/rollback logic — review-caught duplication; the local copy's
#: first revision missed a crash shape the shared helper had long
#: handled)
_RETIRED_DIR = "fingerprints__old"
#: staging directory a compaction writes the distinct set to before
#: the swap; a leftover is a store-sized derived copy reclaimed by the
#: next WRITE entry point
_COMPACTING_DIR = "fingerprints__staging"

_FPS_SCHEMA = "fp bigint, probe string"


def _recover_store_swap(path: str) -> None:
    """WRITE-side recovery from a compaction crash: resolve a crashed
    swap via `io/sinks._recover_swap` (restore ``__old`` when live is
    missing, reclaim it when live exists), then delete any stale
    staging copy (store-sized — the 288M-row run's was 3 GB). Called by
    the two write entry points (append, compact) ONLY: reads must stay
    mutation-free or a stats call racing a live compaction could rename
    directories out from under its swap (review-caught; reads resolve
    the crashed shape without touching it, `_store_data_dir`)."""
    import os
    import shutil

    from ..io.sinks import _recover_swap

    live = os.path.join(path, "fingerprints")
    _recover_swap(live)
    staging = os.path.join(path, _COMPACTING_DIR)
    if os.path.isdir(staging) and os.path.isdir(live):
        shutil.rmtree(staging)


def _store_data_dir(path: str) -> str:
    """READ-ONLY resolution of where the fingerprints currently live:
    normally ``<path>/fingerprints``; after a compaction crashed between
    its two renames the only complete copy sits at ``fingerprints__old``
    — read THAT, without repairing anything (repair is a write, and
    reads must not race a live compaction's swap). On a non-local store
    the isdir probes are False and the normal path falls through to
    Spark untouched. Reader-vs-maintenance raciness is inherent (same
    as txn vacuum vs pinned readers): a compaction finishing mid-job
    can delete the resolved dir under an in-flight reader, which then
    fails and retries against the repaired store."""
    import os

    live = os.path.join(path, "fingerprints")
    old = os.path.join(path, _RETIRED_DIR)
    if not os.path.isdir(live) and os.path.isdir(old):
        return old
    return live


def read_fingerprint_store(
    spark, path: str, allow_stale_identity: bool = False
) -> tuple[DataFrame, dict] | tuple[None, None]:
    """Load a store written by :func:`write_fingerprint_store`:
    ``((fp, probe) DataFrame, meta dict)``, or ``(None, None)`` when no
    store exists at ``path`` yet (the incremental pipeline's first
    batch). A store whose recorded ``identity_rendering`` differs from
    the engine's current vintage — or that predates the stamp — raises
    :class:`FingerprintStoreIdentityMismatch` AT LOAD unless
    ``allow_stale_identity``: its probe keys hashed paths under an old
    rendering rule, so dedup against it can silently no-op (r13
    VERDICT item 2; both prior rendering changes, r12 local and r13
    remote-scheme, invalidated every earlier store with no load-time
    signal — this makes the third change detectable by the engine). Mutation-free: a crashed compaction swap is READ AROUND
    (:func:`_store_data_dir`), not repaired — repair happens on the
    next write entry point. LINEAGE CAVEAT that follows: a DataFrame
    resolved against the crashed shape reads ``fingerprints__old``
    paths, which the next WRITE's recovery renames away — re-executing
    such a plan after a write fails. Materialize or re-read after
    writes; `curatectl` orders its funnel audit before the store
    append for exactly this reason (review-caught).

    A store whose meta is present but whose fingerprint DATA is missing
    reads as an EMPTY store, not a corrupt one: a crash between the
    meta write and the first append, or one that killed an append
    mid-job (an uncommitted ``_temporary`` dir and no data files),
    degrades in the documented conservative direction — the next batch
    keeps a duplicate instead of cutting text, and its append repairs
    the store (r10 ADVICE; the previous contract raised an uncaught
    AnalysisException until the directory was manually deleted). Any
    OTHER analysis error (e.g. parquet lacking the fp/probe columns — a
    partial restore or foreign data) re-raises, because treating it as
    empty would silently no-op the dedup AND let the next append mix a
    second schema into the directory (review-caught)."""
    from pyspark.errors import AnalysisException

    meta = _read_store_meta(spark, path)
    if meta is None:
        return None, None
    _check_store_identity(meta, allow_stale_identity)
    try:
        fps = spark.read.parquet(_store_data_dir(path)).select("fp", "probe")
    except AnalysisException as e:
        if not _reads_as_empty(e):
            raise
        fps = spark.createDataFrame([], _FPS_SCHEMA)
    return fps, meta


def _reads_as_empty(e) -> bool:
    """True when an AnalysisException means the fingerprints path holds
    NO committed data — path absent, or only an uncommitted
    ``_temporary`` dir from an append killed mid-job (schema inference
    finds no files) — vs schema/column errors, which must propagate.
    ``getCondition`` is Spark 4's name; older releases spell it
    ``getErrorClass`` (deprecated alias in 4.x — calling it warns)."""
    getter = getattr(e, "getCondition", None) or getattr(
        e, "getErrorClass", None
    )
    cls = (getter() if getter else None) or ""
    return (
        "PATH_NOT_FOUND" in cls
        or "UNABLE_TO_INFER_SCHEMA" in cls
        or "Path does not exist" in str(e)
    )


def compact_fingerprint_store(spark, path: str) -> dict:
    """Distinct-compact the append-only fingerprint store at ``path``:
    rewrite ``fingerprints/`` as the DISTINCT (fp, probe) set, preserve
    the parameter meta untouched, and append a compaction record to
    ``<path>/_maintenance``. Re-running a batch appends duplicate rows
    by design (semantically inert — the remover groups on (fp, probe))
    but at production cadence the store grows without bound (r10
    VERDICT: 191M rows after two 2.5M-page batches); this is the
    maintenance op that reclaims it, mirroring what `io/txn_maint.py`'s
    OPTIMIZE does for the txn table.

    Crash-safe swap (local-filesystem renames, the txn maintenance
    scope): the distinct set lands fully in a staging dir first, the
    live dir is renamed aside, the staging dir renamed live, and only
    then is the old data deleted. A crash before the final rename is
    resolved by :func:`_recover_store_swap` at the next write entry
    point (reads read AROUND the crashed shape without mutating), so no
    crash point loses fingerprints — the worst outcome is the original,
    uncompacted store. The swap itself is `io/sinks._swap_in` — the
    SAME staged-swap helper the batch sinks promote tables with, not a
    second implementation of the rename/rollback logic
    (review-caught). Concurrency: the store is SINGLE-WRITER by
    contract (see :func:`write_fingerprint_store`), and compaction
    counts as a write — run it in the gap between batches; an append
    racing the staging write would vanish in the swap.

    Returns ``{"rows_before", "rows_after", "bytes_before",
    "bytes_after"}``. Raises ``FileNotFoundError`` when no store exists
    at ``path`` — silently 'compacting' a typo'd path would leave the
    operator believing the real store shrank (the same loud-failure
    contract as ``txn_maint._require_table``)."""
    import os
    import time

    from ..io.sinks import _swap_in

    meta = _read_store_meta(spark, path)
    if meta is None:
        raise FileNotFoundError(f"no fingerprint store at {path}")
    _require_local_store(path)
    _recover_store_swap(path)
    live = os.path.join(path, "fingerprints")
    if not os.path.isdir(live):
        # meta-only store (crash before the first append): nothing to
        # compact, and nothing to swap
        return {
            "rows_before": 0, "rows_after": 0,
            "bytes_before": 0, "bytes_after": 0,
        }
    staging = os.path.join(path, _COMPACTING_DIR)
    from pyspark.errors import AnalysisException

    bytes_before = _dir_bytes(live)
    # The row counts are plain parquet count()s — footer-metadata reads
    # under Spark's count pushdown, not data scans, so they cost file
    # listing + footers, not a second pass over the 4.6 GB store. Do
    # NOT fold them into the rewrite via pyspark.sql.Observation: an
    # Observation on this shared session left
    # spark.sql.classic.ObservationManager reachable from LATER,
    # unrelated RDD closures (MLlib fits), failing them all with
    # NotSerializableException — reproduced in this repo's own suite
    # (store-maint test then any test_quality_clf fit in one session).
    try:
        rows_before = spark.read.parquet(live).count()
        (
            spark.read.parquet(live)
            .select("fp", "probe")
            .distinct()
            .write.mode("overwrite")
            .parquet(staging)
        )
    except AnalysisException as e:
        # an append killed mid-job leaves live/ holding only an
        # uncommitted _temporary dir: the same no-committed-data shape
        # the READ surface treats as empty must not crash the very
        # maintenance command an operator reaches for (review-caught);
        # schema errors still propagate. Compaction is a WRITE under
        # the single-writer contract, so it also RECLAIMS the
        # uncommitted garbage — without this the dead attempt's bytes
        # (GBs) were invisible to stats' committed-only accounting and
        # no tool would ever delete them (review-caught)
        if not _reads_as_empty(e):
            raise
        _reclaim_uncommitted(live)
        return {
            "rows_before": 0, "rows_after": 0,
            "bytes_before": 0, "bytes_after": 0,
        }
    rows_after = spark.read.parquet(staging).count()
    _swap_in(staging, live)
    # the swap replaced live wholesale, which already drops any stale
    # _temporary that rode along in the OLD dir; nothing to reclaim
    bytes_after = _dir_bytes(live)
    record = {
        "op": "compact",
        "ts": time.time(),
        "rows_before": rows_before,
        "rows_after": rows_after,
        "bytes_before": bytes_before,
        "bytes_after": bytes_after,
    }
    local_df(
        spark,
        [tuple(record.values())],
        "op string, ts double, rows_before bigint, rows_after bigint, "
        "bytes_before bigint, bytes_after bigint",
    ).coalesce(1).write.mode("append").json(f"{path}/_maintenance")
    return {k: record[k] for k in (
        "rows_before", "rows_after", "bytes_before", "bytes_after"
    )}


#: measured average bytes one fingerprint row adds to the loser-
#: detection shuffle (fp int64 + probe + pos/doc_id + row overhead) —
#: SCALE.md's r10 winnowing-shuffle calibration
FP_ROW_SHUFFLE_BYTES = 45


def estimate_shuffle_ratio(
    window: int, row_bytes: int = FP_ROW_SHUFFLE_BYTES
) -> float:
    """Expected fingerprint-shuffle bytes PER TEXT BYTE for a winnowing
    window ``w``: robust winnowing selects ``2/(w+1)`` fingerprints per
    character (Schleimer et al. 2003, Thm. 2's density bound), each
    ~:data:`FP_ROW_SHUFFLE_BYTES` on the wire. The operational surface
    of SCALE.md's r10 sizing math (r10 VERDICT item 6): the test-tuned
    default w=8 means ~10 bytes of shuffle per text byte — fine at
    correctness SFs, pathological on a 100 TB corpus, where w=35
    (~2.5×) or w=64 (~1.4×; 2/65·45 = 1.385 — an earlier "~1.3×"
    rounding contradicted this function's own output, review-caught)
    is the guidance. `curatectl` logs this estimate whenever the stage
    is enabled so a default-w production run is loud instead of
    silently 10×."""
    if window < 1:
        raise ValueError(f"winnowing window must be >= 1, got {window}")
    return 2.0 / (window + 1) * row_bytes


def _require_local_store(path: str) -> None:
    """The maintenance surface (compaction swap, file/byte stats) is
    local-filesystem directory work, while the store's READ/APPEND
    surface goes through Spark and works on any Hadoop-visible
    filesystem. A store whose meta Spark can read but whose path is not
    a local directory is therefore remote — refuse LOUDLY instead of
    taking the meta-only branch and reporting an all-zero 'compaction'
    the operator would believe (review-caught silent no-op)."""
    import os

    if not os.path.isdir(path):
        raise ValueError(
            f"fingerprint-store maintenance supports local filesystems "
            f"only (the same scope as io/txn_maint.py); {path!r} is not "
            f"a local directory — reads and appends still work via Spark"
        )


def _reclaim_uncommitted(live: str) -> None:
    """Delete uncommitted ``_temporary`` committer debris under a
    fingerprints dir — called only from WRITE entry points (compaction;
    the single-writer contract means no append can be mid-flight).
    Uncommitted attempts are garbage by definition: their job died
    before commit, and no committed file ever lives under
    ``_temporary``."""
    import os
    import shutil

    p = os.path.join(live, "_temporary")
    if os.path.isdir(p):
        shutil.rmtree(p, ignore_errors=True)


def _uncommitted_bytes(d: str) -> int:
    """Bytes under pruned (``_``/``.``-prefixed) directories — the
    complement of :func:`_committed_files`: committed-only accounting
    must not make a dead append attempt's GBs INVISIBLE to an operator
    chasing a disk alert (review-caught), so stats reports them in
    their own field instead of mixing them into ``bytes``."""
    import os

    total = 0
    for root, dirs, files in os.walk(d):
        pruned = [x for x in dirs if x.startswith(("_", "."))]
        dirs[:] = [x for x in dirs if not x.startswith(("_", "."))]
        for sub in pruned:
            for r2, _d2, f2 in os.walk(os.path.join(root, sub)):
                for f in f2:
                    try:
                        total += os.path.getsize(os.path.join(r2, f))
                    except OSError:
                        pass
    return total


def _committed_files(d: str):
    """Walk only the COMMITTED files of a Spark output directory:
    prune ``_``/``.``-prefixed dirs (``_temporary`` task attempts from
    an append killed mid-job can hold GBs of uncommitted parquet) and
    skip hidden/marker files — otherwise stats would report n_rows=0
    next to nonzero files/bytes for the same store and an operator
    would schedule a compaction off phantom bytes (review-caught)."""
    import os

    for root, dirs, files in os.walk(d):
        dirs[:] = [x for x in dirs if not x.startswith(("_", "."))]
        for f in files:
            if not f.startswith(("_", ".")):
                yield os.path.join(root, f)


def _dir_bytes(d: str) -> int:
    import os

    total = 0
    for p in _committed_files(d):
        try:
            total += os.path.getsize(p)
        except OSError:
            pass
    return total


def fingerprint_store_stats(spark, path: str) -> dict:
    """Operator-facing stats surface for a fingerprint store: row
    count, distinct (fp, probe) count (the size a compaction would
    shrink it to), on-disk bytes, file count, the recorded parameters,
    and how many compactions have run — the observability half of the
    store lifecycle (r10 VERDICT item 3), shaped like ``DESCRIBE
    HISTORY`` for the txn table. Raises ``FileNotFoundError`` on a
    missing store (same contract as :func:`compact_fingerprint_store`).
    """
    import os

    from pyspark.errors import AnalysisException

    meta = _read_store_meta(spark, path)
    if meta is None:
        raise FileNotFoundError(f"no fingerprint store at {path}")
    _require_local_store(path)
    # read-only like read_fingerprint_store: stats must never mutate a
    # store a live compaction is mid-swap on (review-caught) — a
    # crashed shape is read around via the same dir resolution
    live = _store_data_dir(path)
    try:
        # ONE aggregation pass for both counts — the first revision
        # scanned the full store twice (count, then distinct().count());
        # at the measured 288M-row store that was half of a 33.5 s call
        # (review-caught). count_distinct over a STRUCT, not the bare
        # columns: COUNT(DISTINCT fp, probe) silently drops rows where
        # either side is NULL, so n_distinct would understate "the size
        # a compaction would shrink it to" forever on a store holding
        # such a row and the operator would chase a gap no compaction
        # closes (review-caught; the struct form counts them exactly
        # like the compactor's distinct())
        row = (
            spark.read.parquet(live)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.count_distinct(F.struct("fp", "probe")).alias("d"),
            )
            .head()
        )
        n_rows, n_distinct = row["n"], row["d"]
    except AnalysisException as e:
        if not _reads_as_empty(e):
            raise
        n_rows = n_distinct = 0
    n_files = sum(
        1
        for p in _committed_files(live)
        if p.endswith(".parquet")
    ) if os.path.isdir(live) else 0
    try:
        n_compactions = (
            spark.read.json(f"{path}/_maintenance")
            .filter("op = 'compact'")
            .count()
        )
    except AnalysisException:
        n_compactions = 0
    return {
        "n_rows": n_rows,
        "n_distinct": n_distinct,
        "n_files": n_files,
        "bytes": _dir_bytes(live) if os.path.isdir(live) else 0,
        # committer debris from a killed append — reported separately
        # so committed-only accounting can't hide GBs from a disk
        # investigation; a compaction (a write) reclaims them
        "uncommitted_bytes": (
            _uncommitted_bytes(live) if os.path.isdir(live) else 0
        ),
        "k": meta.get("k"),
        "window": meta.get("window"),
        "hash_scheme": meta.get("hash_scheme"),
        "format_version": meta.get("format_version"),
        # None = pre-r14 store, vintage unknowable (the load paths
        # refuse it; stats is the read-only surface operators use to
        # SEE that before deciding to rebuild or --force)
        "identity_rendering": meta.get("identity_rendering"),
        "n_compactions": n_compactions,
    }


def remove_substrings_against_store(
    new_docs: DataFrame,
    store_fps: DataFrame,
    k: int = DEFAULT_K,
    window: int = DEFAULT_WINDOW,
    text_col: str = "text",
    hash_fn=None,
    store_meta: dict | None = None,
    hash_scheme: str | None = None,
    allow_stale_identity: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Incremental duplicated-substring removal: dedup a NEW shard
    against the fingerprint store of an already-exported corpus —
    without re-reading or re-fingerprinting a byte of it.

    ``store_fps`` is (fp, probe) at minimum (the
    :func:`winnow_fingerprints` output of everything shipped so far;
    extra columns are ignored). Rules:

    - a selection whose (fp, probe) exists in the store loses in EVERY
      new occurrence — the exported corpus' copy is canonical and
      cannot be edited retroactively;
    - selections new to the store dedup among the new docs exactly as
      the batch remover would (corpus-wide-smallest occurrence wins).

    Returns ``(cleaned, new_fps)``: the deduped shard and the
    fingerprints OF THE CLEANED TEXT to append to the store (computed
    on the output, so the store always describes exactly what shipped;
    that second fingerprint pass is the price of an always-consistent
    store and is the same map-only scan shape).

    Semantics note: incremental keep-one is FIRST-SEEN-wins across
    batches (the store's copy survived when it shipped), which
    deliberately diverges from a one-shot batch run over the
    concatenated corpus (corpus-wide smallest (doc_id, pos) wins) —
    the exported data cannot change, so first-seen is the only
    consistent rule. Within one shard the two rules agree.

    Scale shape: one Arrow winnowing scan of the shard, one hash join
    of winnowed-density fingerprint rows against the store's (fp,
    probe) keys (no text on either side), then the shared range-merge
    + per-doc rebuild. The store never rewrites — it only appends.

    ``store_meta`` (the dict :func:`read_fingerprint_store` returns)
    makes the compatibility contract executable: the call's
    (k, window, hash scheme) must equal the store's recorded ones or
    :class:`FingerprintStoreMismatch` is raised BEFORE any join —
    mismatched fingerprints never join, so proceeding would silently
    no-op the dedup while appending incompatible rows (r9 ADVICE).
    With the default ``hash_fn=None`` the scheme is
    :data:`DEFAULT_HASH_SCHEME`; a custom ``hash_fn`` must name its
    scheme via ``hash_scheme`` when a meta check is requested.
    """
    from pyspark.sql import Window

    if store_meta is not None:
        scheme = hash_scheme or (
            DEFAULT_HASH_SCHEME if hash_fn is None else None
        )
        if scheme is None:
            raise ValueError(
                "store_meta validation with a custom hash_fn requires "
                "an explicit hash_scheme tag"
            )
        _check_store_meta(store_meta, k, window, scheme, allow_stale_identity)

    probed = _winnow_raw(new_docs, k, window, text_col, hash_fn)
    store_keys = (
        store_fps.select("fp", "probe")
        .distinct()
        .withColumn("_in_store", F.lit(True))
    )
    grp = Window.partitionBy("fp", "probe")
    marked = (
        probed.join(store_keys, ["fp", "probe"], "left")
        .withColumn("_w", F.min(F.struct("doc_id", "pos")).over(grp))
        .withColumn(
            "_multi", F.max("doc_id").over(grp) != F.min("doc_id").over(grp)
        )
    )
    losers = marked.filter(
        F.col("_in_store").isNotNull()
        | (
            F.col("_multi")
            & (
                (F.col("doc_id") != F.col("_w.doc_id"))
                | (F.col("pos") != F.col("_w.pos"))
            )
        )
    ).select("doc_id", "pos")
    cleaned = _cut_marked(new_docs, losers, k, text_col)
    new_fps = winnow_fingerprints(cleaned, k, window, "text", hash_fn)
    return cleaned, new_fps
