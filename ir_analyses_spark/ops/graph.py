"""Iterative graph analytics as DataFrame loops — the tier llm/dedup.py's
connected-components opened (min-label propagation to fixpoint); this
module adds weighted PageRank, the other canonical "iterate a join+agg
until done" workload.

Scale discipline shared with dedup_components: each round is ONE shuffle
keyed by the destination node; the rank frame (2 narrow columns) is the
only thing that iterates — edges are computed once and reused; a fixed
iteration count keeps the plan finite and lets the DuckDB oracle express
the identical computation as unrolled CTEs. Per-edge contributions cast
to DECIMAL(38,18) before the SUM, so the fold is associative and
partition-order-proof — the same helpers.py discipline that makes every
other float aggregate in this repo hash-exact cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io.sources import load_table

#: damping factor (the standard 0.85) and fixed iteration count
_DAMPING = 0.85
_N_ITER = 3


def _decimal_sum(col) -> F.Column:
    # the repo's one decimal-accumulator discipline point, at PageRank's
    # 18-digit scale (rank mass ~1e-2 per node needs the headroom)
    from .helpers import dsum

    return dsum(col, scale=18)


def _undirected_degree(edges: DataFrame) -> DataFrame:
    """(node, degree) over a canonical undirected (a, b) edge frame —
    computed ONCE per query and shared by orientation and the output
    rollup (previously built twice from the same checkpointed edges)."""
    return (
        edges.selectExpr("a AS node").unionAll(edges.selectExpr("b AS node"))
        .groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    )


def _nation_trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst, w): nation → nation lineitem-count trade edges, shared by
    pagerank / triangles / BFS. Suppliers and customers resolve nations via
    broadcast dim joins; the fact shuffles ONCE for the (src, dst) rollup."""
    t = {n: load_table(spark, n, sf_dir) for n in
         ["nation", "customer", "supplier", "orders", "lineitem"]}
    supp_n = t["supplier"].join(
        F.broadcast(t["nation"].select(
            F.col("n_nationkey").alias("sn_key"),
            F.col("n_name").alias("src"),
        )),
        F.col("s_nationkey") == F.col("sn_key"),
    ).select("s_suppkey", "src")
    cust_n = t["customer"].join(
        F.broadcast(t["nation"].select(
            F.col("n_nationkey").alias("cn_key"),
            F.col("n_name").alias("dst"),
        )),
        F.col("c_nationkey") == F.col("cn_key"),
    ).select("c_custkey", "dst")
    return (
        t["lineitem"].select("l_orderkey", "l_suppkey")
        .join(t["orders"].select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp_n, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cust_n, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    n_iter: int = _N_ITER,
    damping: float = _DAMPING,
) -> DataFrame:
    """Generic weighted PageRank: ``nodes`` is one ``node`` column,
    ``edges`` is (``src``, ``dst``, ``w``) with integer-valued weights.
    Returns (node, rank) after ``n_iter`` damped iterations from a
    uniform start, rank rounded to 9 decimals (see trade_pagerank for
    why the report rounds).

    The loop is the scale contract: edges normalize and checkpoint ONCE;
    every iteration moves only the (node, rank) pairs through one shuffle
    keyed on dst with a decimal-accumulator fold; rank sinks keep the
    teleport term via the left join back to ``nodes``. The node count is
    the only driver-side action (one scalar)."""
    out_w = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    # ratio is exact-int / exact-int → one deterministic double per edge
    ratio_edges = edges.join(out_w, "src").select(
        "src",
        "dst",
        (F.col("w").cast("double") / F.col("out_w").cast("double")).alias(
            "ratio"
        ),
    ).localCheckpoint(eager=True)  # n_iter consumers below — compute once

    n_nodes = nodes.count()  # one scalar, driver-side by design
    if n_nodes == 0:
        # a filtered-to-empty node frame would otherwise surface as a raw
        # ZeroDivisionError from the teleport arithmetic (review-caught)
        raise ValueError("pagerank requires a non-empty nodes frame")
    teleport = (1.0 - damping) / n_nodes
    rank = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    for _ in range(n_iter):
        contrib = (
            ratio_edges.join(rank.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(_decimal_sum(F.col("rank") * F.col("ratio")).alias("inflow"))
        )
        rank = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(teleport)
                + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
            ).alias("rank"),
        )
    return rank.select("node", F.round("rank", 9).alias("rank")).orderBy(
        F.col("rank").desc(), "node"
    )


def trade_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the nation trade graph: nodes are nations,
    an edge supp_nation → cust_nation is weighted by the number of
    lineitems shipped between them; 3 damped iterations (d=0.85) from a
    uniform start.

    Scale shape: the edge list builds ONCE — supplier and customer each
    resolve a nation via a broadcast dim join, the fact shuffles once for
    the (src, dst) weight rollup — then every iteration moves only the
    (node, rank) pairs: join rank→edges on src (broadcast at this node
    count; hash join keyed on src at web scale), partial+final decimal
    aggregate by dst, left join back to the node list so rank sinks keep
    the teleport term. Nothing in the loop depends on partitioning order:
    w/out_w ratios and rank multiplications are per-row IEEE doubles,
    and the per-destination fold is the decimal accumulator.

    The REPORTED rank is rounded to 9 decimals (same contract as
    pct_rank in ops/windows.py): the double→decimal(38,18) cast inside
    the accumulator goes through the JVM's shortest-string representation
    while DuckDB converts the full binary expansion, so the engines can
    disagree in the 17th significant digit; the damping factor keeps that
    bounded at ulp scale across iterations, and 9 reported decimals are
    ~8 digits of slack away from it."""
    edges = _nation_trade_edges(spark, sf_dir)
    nodes = load_table(spark, "nation", sf_dir).select(
        F.col("n_name").alias("node")
    )
    return pagerank(nodes, edges)


def _pr_iter_sql(k: int) -> str:
    return f"""
pr{k} AS (
  SELECT n.node,
         {(1.0 - _DAMPING)!r} / (SELECT COUNT(*) FROM nodes)
           + {_DAMPING!r} * COALESCE(c.inflow, 0.0) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node,
           CAST(SUM(CAST(p.rank * e.ratio AS DECIMAL(38,18))) AS DOUBLE)
             AS inflow
    FROM edges e JOIN pr{k - 1} p ON e.src = p.node
    GROUP BY e.dst
  ) c ON n.node = c.node
)"""


TRADE_PAGERANK_SQL = f"""
WITH nodes AS (SELECT n_name AS node FROM nation),
raw_edges AS (
  SELECT n1.n_name AS src, n2.n_name AS dst, COUNT(*) AS w
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  GROUP BY 1, 2
),
edges AS (
  SELECT src, dst,
         CAST(w AS DOUBLE)
           / CAST(SUM(w) OVER (PARTITION BY src) AS DOUBLE) AS ratio
  FROM raw_edges
),
pr0 AS (
  SELECT node, 1.0 / (SELECT COUNT(*) FROM nodes) AS rank FROM nodes
),{",".join(_pr_iter_sql(k) for k in range(1, _N_ITER + 1))}
SELECT node, ROUND(rank, 9) AS rank FROM pr{_N_ITER}
ORDER BY ROUND(rank, 9) DESC, node
"""


def _degree_oriented(edges: DataFrame, degree: DataFrame) -> DataFrame:
    """Orient canonical undirected edges (a, b) by the total order
    (degree, node): each edge points from its lower-degree endpoint to the
    higher (node name breaks ties), returning (src, dst, dst_key) with
    ``dst_key`` the destination's (degree, node) struct so the wedge join
    can compare order positions without a second degree lookup.
    ``degree`` is the caller's :func:`_undirected_degree` frame — passed
    in so the one aggregation serves both orientation and the output.

    This is THE skew defense for distributed triangle counting: after
    orientation every vertex's out-degree is at most O(√m) (a vertex with
    out-degree k has k neighbors of degree ≥ its own ≥ k, so k² ≤ 2m),
    which caps the wedge join at O(m^1.5) REGARDLESS of how skewed the
    raw degree distribution is. Orienting by lexicographic endpoint
    instead lets one low-sorting hub of degree d contribute C(d, 2)
    wedges — the quadratic blowup ``tests/test_graph_orientation.py``
    demonstrates on a star fixture."""
    da = degree.select(F.col("node").alias("a"), F.col("degree").alias("deg_a"))
    db = degree.select(F.col("node").alias("b"), F.col("degree").alias("deg_b"))
    keyed = edges.join(da, "a").join(db, "b")
    key_a = F.struct(F.col("deg_a").alias("d"), F.col("a").alias("n"))
    key_b = F.struct(F.col("deg_b").alias("d"), F.col("b").alias("n"))
    a_first = key_a < key_b
    return keyed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(a_first, key_b).otherwise(key_a).alias("dst_key"),
    )


def _oriented_wedges(oriented: DataFrame) -> DataFrame:
    """(u, v, w): two out-edges u→v, u→w of the same source with v before
    w in the orientation order — each candidate triangle generated exactly
    once, from its order-minimal vertex."""
    e1 = oriented.select(
        F.col("src").alias("u"), F.col("dst").alias("v"),
        F.col("dst_key").alias("v_key"),
    )
    e2 = oriented.select(
        F.col("src").alias("u2"), F.col("dst").alias("w"),
        F.col("dst_key").alias("w_key"),
    )
    return (
        e1.join(
            e2,
            (F.col("u") == F.col("u2")) & (F.col("v_key") < F.col("w_key")),
        )
        .select("u", "v", "w")
    )


def triangle_counts(traded: DataFrame) -> DataFrame:
    """Exact per-node triangle participation + degree over a directed
    trade frame (src, dst) — self-loop-free input; (a, b)/(b, a)/
    multi-edges collapse to one undirected edge.

    Plan: canonicalize once, orient by (degree, node), wedge-join the
    oriented out-edges, close each wedge against the oriented edge list.
    In the orientation's total order every triangle has exactly one
    vertex with out-edges to both others, and the closing edge v→w is
    oriented that way precisely because the wedge asserted
    key(v) < key(w) — so each triangle is produced exactly once, no
    post-hoc dedup. The oriented frame feeds three consumers (both wedge
    sides + the closure probe), hence the eager checkpoint."""
    edges = traded.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct().localCheckpoint(eager=True)
    degree = _undirected_degree(edges).localCheckpoint(eager=True)
    oriented = _degree_oriented(edges, degree).localCheckpoint(eager=True)
    closing = oriented.select(
        F.col("src").alias("v2"), F.col("dst").alias("w2")
    )
    tri = _oriented_wedges(oriented).join(
        closing, (F.col("v") == F.col("v2")) & (F.col("w") == F.col("w2"))
    ).select("u", "v", "w")
    per_node = (
        tri.selectExpr("u AS node").unionAll(tri.selectExpr("v AS node"))
        .unionAll(tri.selectExpr("w AS node"))
        .groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return degree.join(per_node, "node", "left").select(
        "node", "degree", F.coalesce("n_triangles", F.lit(0)).alias("n_triangles")
    )


def trade_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle counting on the undirected nation trade graph (the
    clustering-coefficient / community-density primitive), DEGREE-ORIENTED:
    edges point low-degree → high-degree endpoint, wedges enumerate only
    pairs of OUT-edges, and the closing join probes the oriented edge list
    — the production plan for skewed graphs (out-degrees are √m-bounded,
    so no hub ever explodes the wedge join). See :func:`triangle_counts`.

    Scale shape: the canonical edge list is built once (same
    broadcast-dim resolution as trade_pagerank, one fact shuffle); the
    orientation adds one node-keyed degree join; the wedge join keys on
    the shared source and the closure on (v, w). Output: one exact count
    per nation of triangles it participates in, plus the node's degree —
    ORDER-free, integer-exact, and identical to the unoriented two-join
    form (the DuckDB oracle keeps that form as the cross-engine twin)."""
    traded = _nation_trade_edges(spark, sf_dir).select("src", "dst").filter(
        F.col("src") != F.col("dst")
    )
    return triangle_counts(traded)


TRADE_TRIANGLES_SQL = """
WITH traded AS (
  SELECT DISTINCT
         LEAST(n1.n_name, n2.n_name) AS a,
         GREATEST(n1.n_name, n2.n_name) AS b
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE n1.n_name <> n2.n_name
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM traded e1
  JOIN traded e2 ON e1.a = e2.a AND e1.b < e2.b
  JOIN traded e3 ON e3.a = e1.b AND e3.b = e2.b
),
per_node AS (
  SELECT node, COUNT(*) AS n_triangles FROM (
    SELECT x AS node FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri
  ) GROUP BY node
),
degree AS (
  SELECT node, COUNT(*) AS degree FROM (
    SELECT a AS node FROM traded UNION ALL SELECT b FROM traded
  ) GROUP BY node
)
SELECT d.node, d.degree, COALESCE(p.n_triangles, 0) AS n_triangles
FROM degree d LEFT JOIN per_node p ON d.node = p.node
"""


def trade_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS shortest hop distance (single-source shortest paths, unit
    weights) over the SPARSIFIED trade graph: only edges at or above the
    90th-percentile weight survive (the full graph is near-complete, so
    un-thresholded BFS would vacuously put everything at hop 1 — the
    same never-fires trap the vacuity guards exist for; the disc
    percentile keeps the cut engine-exact). Seed = lexicographically
    first surviving source; 4 min-relaxation rounds as a DataFrame loop,
    nations not reached within 4 hops (or disconnected) report NULL.

    Scale shape: each round is ONE shuffle joining the frontier to the
    edge list keyed on src + a min-fold by destination — the
    dedup_components discipline; hop counts are exact integers, so every
    round is partition-order-proof. Oracle = 4 unrolled relax CTEs."""
    w = _nation_trade_edges(spark, sf_dir).filter(F.col("src") != F.col("dst"))
    cut = w.select(
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY w)").alias("q")
    )
    sparse = (
        w.crossJoin(F.broadcast(cut)).filter(F.col("w") >= F.col("q"))
        .select("src", "dst")
    )
    und = sparse.union(
        sparse.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint(eager=True)  # 4 consumers: compute once
    seed = und.agg(F.min("src").alias("node")).withColumn("hop", F.lit(0))
    dist = seed
    for _ in range(4):
        relaxed = (
            und.join(dist.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"), (F.col("hop") + 1).alias("hop"))
        )
        # per-round lineage truncation (r14 optimization, the
        # dedup_components discipline): dist feeds BOTH the union and the
        # relaxation, so without materialization each round DOUBLES the
        # unexecuted subtree — the final plan re-ran the seed aggregation
        # 2⁴ times. One tiny (≤|V| rows) eager checkpoint per round keeps
        # every round's work linear in the edge list.
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("hop").alias("hop"))
            .localCheckpoint(eager=True)
        )
    nations = load_table(spark, "nation", sf_dir).select(
        F.col("n_name").alias("node")
    )
    return nations.join(dist, "node", "left").select("node", "hop")


TRADE_BFS_HOPS_SQL = """
WITH w AS (
  SELECT n1.n_name AS src, n2.n_name AS dst, COUNT(*) AS w
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE n1.n_name <> n2.n_name
  GROUP BY 1, 2
),
cut AS (SELECT quantile_disc(w, 0.9) AS q FROM w),
sp AS (SELECT src, dst FROM w, cut WHERE w.w >= cut.q),
und AS (SELECT src, dst FROM sp UNION SELECT dst, src FROM sp),
d0 AS (SELECT MIN(src) AS node, 0 AS hop FROM und),
r1 AS (
  SELECT node, MIN(hop) AS hop FROM (
    SELECT node, hop FROM d0
    UNION ALL SELECT e.dst, d.hop + 1 FROM und e JOIN d0 d ON e.src = d.node
  ) GROUP BY node
),
r2 AS (
  SELECT node, MIN(hop) AS hop FROM (
    SELECT node, hop FROM r1
    UNION ALL SELECT e.dst, d.hop + 1 FROM und e JOIN r1 d ON e.src = d.node
  ) GROUP BY node
),
r3 AS (
  SELECT node, MIN(hop) AS hop FROM (
    SELECT node, hop FROM r2
    UNION ALL SELECT e.dst, d.hop + 1 FROM und e JOIN r2 d ON e.src = d.node
  ) GROUP BY node
),
r4 AS (
  SELECT node, MIN(hop) AS hop FROM (
    SELECT node, hop FROM r3
    UNION ALL SELECT e.dst, d.hop + 1 FROM und e JOIN r3 d ON e.src = d.node
  ) GROUP BY node
)
SELECT n.n_name AS node, r4.hop
FROM nation n LEFT JOIN r4 ON n.n_name = r4.node
"""


QUERIES = {
    "trade_pagerank": trade_pagerank,
    "trade_triangles": trade_triangles,
    "trade_bfs_hops": trade_bfs_hops,
}

ORACLES = {
    "trade_pagerank": TRADE_PAGERANK_SQL,
    "trade_triangles": TRADE_TRIANGLES_SQL,
    "trade_bfs_hops": TRADE_BFS_HOPS_SQL,
}
