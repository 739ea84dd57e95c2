"""THE portable polynomial hash — one definition for every surface
that must agree bit-for-bit across Spark, DuckDB, and Python.

h(s, n) = ( Σ_{j=0..n-1} codepoint(s[j]) · B^(n−1−j) mod M ) with
B = 131, M = 1e9+7; characters past the end of ``s`` contribute
codepoint 0 (``ascii('')`` is 0 in both Spark and DuckDB, and the
Python twin pads the same way). Every term stays < 1.2e6 · 1e9 and the
n-term sum < 2^54 — no engine can overflow or diverge.

Three consumers must stay in exact agreement (review-caught: the
scheme was hand-duplicated in each):

- `llm/substring_queries.py` — k-gram hash for the winnowing oracles;
- `llm/clf_gate.py` — token bucket for the quantized classifier gate
  (its checked-in weight artifact was TRAINED against the Python twin
  in `tools/train_clf_gate.py`, so a drift here silently invalidates
  the artifact);
- `tools/train_clf_gate.py` — the trainer's featurizer.

Scale note: the JVM expression re-evaluates ``substring`` per
character (UTF8String seeks char offsets linearly), which is fine for
the dimension-sized gram/token inputs these surfaces hash; bulk
corpus-scale hashing belongs in
`llm/substring_dedup.poly_kgram_hashes` (vectorized, mod 2^64).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

B = 131
M = 1_000_000_007
_MAX_CHARS = 16
#: B^j mod M, j = 0.._MAX_CHARS-1 — exact in every engine
PW = [pow(B, j, M) for j in range(_MAX_CHARS)]

#: THE cross-engine token boundary class — the same string literal is
#: a valid, identical-semantics regex in Java (Spark), RE2 (DuckDB),
#: and Python re. A bare \\s+ silently diverges: Java's \\s includes
#: \\x0B (vertical tab) but RE2's does not, and Python's is
#: unicode-wide. Equals Java's ASCII \\s. ONE definition
#: (review-caught: it had drifted into six hand-copies): Spark splits,
#: the DuckDB oracle SQL strings, and the gate trainer all import or
#: interpolate THIS constant.
WS_CLASS = "[ \\t\\n\\r\\f\\x0B]+"


def port_hash_expr(col: Column, n_chars: int) -> Column:
    """JVM expression: the hash of ``col``'s first ``n_chars`` chars."""
    if not (1 <= n_chars <= _MAX_CHARS):
        raise ValueError(f"n_chars must be in 1..{_MAX_CHARS}")
    terms = None
    for j in range(n_chars):
        t = (
            F.ascii(F.substring(col, j + 1, 1)).cast("bigint")
            * F.lit(PW[n_chars - 1 - j])
        )
        terms = t if terms is None else terms + t
    return terms % F.lit(M)


def port_hash_sql(expr: str, n_chars: int) -> str:
    """DuckDB SQL: the same hash over the string expression ``expr``
    (which may reference columns; it is substituted verbatim)."""
    if not (1 <= n_chars <= _MAX_CHARS):
        raise ValueError(f"n_chars must be in 1..{_MAX_CHARS}")
    terms = " + ".join(
        f"CAST(ascii(substr({expr}, {j + 1}, 1)) AS BIGINT)"
        f" * {PW[n_chars - 1 - j]}"
        for j in range(n_chars)
    )
    return f"(({terms}) % {M})"


def port_hash_kgrams_np(s: str, k: int):
    """Vectorized numpy twin: the hash of EVERY k-char window of
    ``s``, as one int64 array (empty when ``len(s) < k``). Bit-exact
    with ``port_hash_expr``/``port_hash_py`` applied per gram: each
    term codepoint·B^j < 1.2e6·1e9 and the k-term int64 sum < 2^54, so
    the sum is exact and the single final ``% M`` is the same
    association the JVM expression uses. Exists because the JVM
    expression re-seeks character offsets per gram (O(pos) UTF8String
    substr — measured 19-20 s for the sf0.1 documents table vs ~0.1 s
    here); corpus-scale k-gram hashing belongs in the Arrow worker."""
    import numpy as np

    if not (1 <= k <= _MAX_CHARS):
        raise ValueError(f"k must be in 1..{_MAX_CHARS}")
    codes = np.frombuffer(s.encode("utf-32-le"), dtype="<u4").astype(
        np.int64
    )
    m = codes.size - k + 1
    if m <= 0:
        return np.empty(0, dtype=np.int64)
    h = np.zeros(m, dtype=np.int64)
    for j in range(k):
        h += codes[j : j + m] * PW[k - 1 - j]
    return h % M


def port_hash_py(s: str, n_chars: int) -> int:
    """Python twin (used by the gate trainer and by tests)."""
    if not (1 <= n_chars <= _MAX_CHARS):
        raise ValueError(f"n_chars must be in 1..{_MAX_CHARS}")
    h = 0
    for j in range(n_chars):
        c = ord(s[j]) if j < len(s) else 0
        h += c * PW[n_chars - 1 - j]
    return h % M
