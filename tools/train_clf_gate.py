"""One-off trainer for the quantized quality-classifier gate artifact
embedded in `ir_analyses_spark/llm/clf_gate.py`.

Deterministic end to end (fixed seed, fixed iteration count, plain
numpy full-batch gradient descent), so re-running this script
regenerates the exact same weight table. The model is a logistic
regression over 256 hashed token buckets — the same portable
polynomial bucket hash the serving path and its DuckDB oracle use —
trained on a synthetic reference-vs-crawl corpus whose reference half
leans on the analytics vocabulary the synthetic `documents` table is
drawn from and whose crawl half leans on boilerplate/spam tokens.
Training is float; SERVING is exact integer arithmetic because the
weights are quantized to millionths before they ship — that
quantization is what makes the gate decision cross-engine
hash-oracle-able (the same reason `llm/lm_score.py` certifies integer
sufficient statistics, one step further: quantize once, serve exact).

Usage: python tools/train_clf_gate.py  (prints the literal tables)
"""

from __future__ import annotations

import os
import random
import re
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from ir_analyses_spark.llm.porthash import WS_CLASS, port_hash_py  # noqa: E402

N_BUCKETS = 256
#: the ONE cross-engine token boundary class — same constant the Spark
#: serving path and the DuckDB oracle interpolate
_WS = re.compile(WS_CLASS)

# reference half of the shared analytics vocabulary vs crawl-ish half +
# junk: weights on SHARED tokens are what make scores vary on real rows
REF_VOCAB = [
    "table", "query", "join", "agg", "sort", "group", "window", "data",
    "column", "merge", "hash", "scan", "order", "key", "vector", "batch",
]
CRAWL_VOCAB = [
    "click", "free", "win", "offer", "buy", "now", "cheap", "deal",
    "slow", "spam", "part", "row", "value", "line", "filter", "stream",
    "customer", "big", "small", "fast", "a", "the",
]


def bucket(tok: str) -> int:
    """First-8-chars polynomial bucket — the SHARED definition
    (`llm/porthash.py`), so the trainer, the Spark serving path, and
    the DuckDB oracle are provably the same scheme."""
    return port_hash_py(tok, 8) % N_BUCKETS


def featurize(text: str) -> np.ndarray:
    x = np.zeros(N_BUCKETS)
    for tok in _WS.split(text.lower()):
        if not tok:
            continue
        x[bucket(tok)] += 1.0
    return x


def synth(rng: random.Random, vocab_a, vocab_b, bias: float, n: int):
    docs = []
    for _ in range(n):
        length = rng.randint(20, 60)
        words = [
            rng.choice(vocab_a if rng.random() < bias else vocab_b)
            for _ in range(length)
        ]
        docs.append(" ".join(words))
    return docs


def main() -> None:
    rng = random.Random(20260815)
    pos = synth(rng, REF_VOCAB, CRAWL_VOCAB, 0.75, 2000)
    neg = synth(rng, CRAWL_VOCAB, REF_VOCAB, 0.75, 2000)
    X = np.stack([featurize(t) for t in pos + neg])
    y = np.concatenate([np.ones(len(pos)), np.zeros(len(neg))])
    # full-batch logistic regression, L2, fixed schedule
    w = np.zeros(N_BUCKETS)
    b = 0.0
    lr, lam = 0.05, 1e-3
    for _ in range(500):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = X.T @ (p - y) / len(y) + lam * w
        gb = float(np.mean(p - y))
        w -= lr * g
        b -= lr * gb
    acc = float(np.mean((X @ w + b > 0) == y))
    wq = np.round(w * 1_000_000).astype(np.int64)
    bq = int(round(b * 1_000_000))
    print(f"# train accuracy: {acc:.4f}")
    print(f"_INTERCEPT_MILLIONTHS = {bq}")
    print("_WEIGHTS_MILLIONTHS = [")
    for i in range(0, N_BUCKETS, 8):
        row = ", ".join(str(int(v)) for v in wq[i : i + 8])
        print(f"    {row},")
    print("]")


if __name__ == "__main__":
    main()
