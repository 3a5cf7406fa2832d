"""Graph analytics on DataFrames: PageRank over the supplier↔customer
trade graph. Second member of the iterative-algorithm class (with d08's
connected components): a driver loop of join+aggregate steps, one
shuffle per iteration, state = one (node, rank) row per node.

The oracle unrolls the same two iterations as nested plain-SQL CTEs
(recursive CTEs cannot aggregate in the recursive member, so unrolling
is the only oracle-expressible form — which also pins the iteration
count deterministically).

Scale story: each iteration shuffles (edge endpoint → rank
contribution) keyed on dst — co-partitioned with the previous
iteration's output, so AQE reuses the exchange layout; edges and
degrees are computed once and cached. At 100 TB-of-edges this is the
standard Pregel-on-DataFrames shape (GraphFrames does the same under
the hood); iterate-to-convergence replaces the fixed unroll, with the
same per-iteration plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_datalake_aws_spark.catalog import table
from serverless_datalake_aws_spark.plans import query

_DAMP = 0.85
_ITERS = 2


def _trade_sym(spark: SparkSession, sf_dir: str):
    """The cached symmetric supplier<->customer trade graph shared by
    p02 (PageRank) and p04 (BFS). The node encoding (src=l_suppkey*2,
    dst=o_custkey*2+1) is a cross-query invariant baked into BOTH
    oracles — one construction site keeps the two queries from
    drifting apart. Caller materializes (sym.count()) before looping."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            (F.col("l_suppkey") * 2).alias("src"),
            (F.col("o_custkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    return edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).cache()


@query(
    "p02_pagerank",
    oracle="""
    WITH edges AS (
      SELECT DISTINCT l_suppkey * 2 AS src, o_custkey * 2 + 1 AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    sym AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
    nodes AS (SELECT DISTINCT src AS node FROM sym),
    deg AS (SELECT src, count(*) AS outd FROM sym GROUP BY src),
    n AS (SELECT count(*) AS n_nodes FROM nodes),
    pr0 AS (SELECT node, 1.0 / n.n_nodes AS r FROM nodes, n),
    pr1 AS (
      SELECT nodes.node,
        0.15 / n.n_nodes + 0.85 * coalesce(sum(pr0.r / deg.outd), 0) AS r
      FROM nodes CROSS JOIN n
      LEFT JOIN sym ON sym.dst = nodes.node
      LEFT JOIN pr0 ON pr0.node = sym.src
      LEFT JOIN deg ON deg.src = sym.src
      GROUP BY nodes.node, n.n_nodes
    ),
    pr2 AS (
      SELECT nodes.node,
        0.15 / n.n_nodes + 0.85 * coalesce(sum(pr1.r / deg.outd), 0) AS r
      FROM nodes CROSS JOIN n
      LEFT JOIN sym ON sym.dst = nodes.node
      LEFT JOIN pr1 ON pr1.node = sym.src
      LEFT JOIN deg ON deg.src = sym.src
      GROUP BY nodes.node, n.n_nodes
    )
    SELECT CASE WHEN node % 2 = 0 THEN concat('s', node // 2)
                ELSE concat('c', (node - 1) // 2) END AS node,
           round(r * 1000, 6) AS rank_milli
    FROM pr2
    """,
)
def p02_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two damped PageRank iterations (d=0.85) over the undirected
    supplier↔customer graph induced by lineitem⋈orders. Driver-looped
    join+agg per iteration; rank mass of dangling nodes is handled by
    the uniform 0.15/N teleport term (the symmetric graph has no
    danglers, matching the oracle's LEFT JOIN + coalesce form)."""
    sym = _trade_sym(spark, sf_dir)
    sym.count()  # materialize: read every iteration + for nodes/deg
    nodes = sym.select(F.col("src").alias("node")).distinct().cache()
    n_nodes = nodes.count()  # also materializes the nodes cache
    deg = sym.groupBy("src").agg(F.count("*").alias("outd")).cache()
    deg.count()
    ranks = nodes.withColumn("r", F.lit(1.0 / n_nodes))
    for _ in range(_ITERS):
        # ranks/deg/contribs are node-sized (≪ edges): broadcast them so
        # the big cached edge table never re-shuffles; materialize each
        # iteration's ranks to truncate the recomputed lineage
        contribs = (
            sym.join(F.broadcast(ranks), sym["src"] == ranks["node"])
            .join(F.broadcast(deg), "src")
            .select(F.col("dst").alias("node"), (F.col("r") / F.col("outd")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("mass"))
        )
        ranks = (
            nodes.join(F.broadcast(contribs), "node", "left")
            .select(
                "node",
                (
                    F.lit(0.15 / n_nodes)
                    + F.lit(_DAMP) * F.coalesce(F.col("mass"), F.lit(0.0))
                ).alias("r"),
            )
            # eager localCheckpoint: materializes AND truncates lineage,
            # so the logical plan stays one-iteration deep
            .localCheckpoint()
        )
    node_str = F.when(
        F.col("node") % 2 == 0, F.concat(F.lit("s"), (F.col("node") / 2).cast("long"))
    ).otherwise(F.concat(F.lit("c"), ((F.col("node") - 1) / 2).cast("long")))
    # long node ids keep every shuffle 8-byte; strings only materialize
    # in the final projection
    return ranks.select(
        node_str.alias("node"), F.round(F.col("r") * 1000, 6).alias("rank_milli")
    )


@query(
    "p03_trade_triangles",
    oracle="""
    WITH edges AS (
      SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
    )
    SELECT e1.src AS nation, count(*) AS n_triangles
    FROM edges e1
    JOIN edges e2 ON e1.dst = e2.src
    JOIN edges e3 ON e2.dst = e3.src AND e3.dst = e1.src
    WHERE e1.src < e2.src AND e1.src < e3.src
    GROUP BY e1.src
    ORDER BY n_triangles DESC, nation
    """,
)
def p03_trade_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed triangle counting on the nation-level trade graph
    (nation A's customers buy from nation B's suppliers ⇒ edge A→B):
    3-cycles anchored at their minimum node so each cycle counts once.
    Triangle census is the classic graph-analytics benchmark op and the
    clustering-coefficient numerator.

    Scale: the fact-table join distills to a ≤25²-edge graph BEFORE any
    graph math — distinct-project early, then the cubic self-join runs
    on a broadcast-sized edge list. At web scale the same plan holds
    with degree-ordered edge direction (count each triangle at its
    lowest-degree vertex) to bound the quadratic hop."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .distinct()
        .cache()
    )
    edges.count()  # materialize once: three self-join consumers below
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    return (
        e1.join(F.broadcast(e2), F.col("e1.dst") == F.col("e2.src"))
        .join(
            F.broadcast(e3),
            (F.col("e2.dst") == F.col("e3.src"))
            & (F.col("e3.dst") == F.col("e1.src")),
        )
        .filter(
            (F.col("e1.src") < F.col("e2.src"))
            & (F.col("e1.src") < F.col("e3.src"))
        )
        .groupBy(F.col("e1.src").alias("nation"))
        .agg(F.count("*").alias("n_triangles"))
        .orderBy(F.desc("n_triangles"), "nation")
    )


@query(
    "p04_bfs_hops",
    oracle="""
    WITH edges AS (
      SELECT DISTINCT l_suppkey * 2 AS src, o_custkey * 2 + 1 AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    sym AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
    nodes AS (SELECT DISTINCT src AS node FROM sym),
    d0 AS (
      SELECT node, CASE WHEN node = 0 THEN 0 END AS d FROM nodes
    ),
    d1 AS (
      SELECT n.node,
             least(any_value(d0c.d),
                   min(d0n.d) + 1) AS d
      FROM nodes n
      JOIN d0 d0c ON d0c.node = n.node
      LEFT JOIN sym ON sym.dst = n.node
      LEFT JOIN d0 d0n ON d0n.node = sym.src
      GROUP BY n.node
    ),
    d2 AS (
      SELECT n.node,
             least(any_value(d1c.d),
                   min(d1n.d) + 1) AS d
      FROM nodes n
      JOIN d1 d1c ON d1c.node = n.node
      LEFT JOIN sym ON sym.dst = n.node
      LEFT JOIN d1 d1n ON d1n.node = sym.src
      GROUP BY n.node
    )
    SELECT CAST(d AS BIGINT) AS hops, count(*) AS n_nodes
    FROM d2 WHERE d IS NOT NULL
    GROUP BY d
    """,
)
def p04_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two unrolled BFS rounds from supplier 0 over the undirected
    trade graph: per-node hop distance via iterated min-propagation
    (dist = min(own, min(neighbor)+1)), reported as a reachability
    histogram (hops → node count). Completes the graph-operator family:
    p02 centrality, p03 clustering, d08 connectivity, p04 DISTANCE.

    Scale: each round is one join of the frontier against the cached
    edge list plus a min-aggregation — the standard Pregel-on-DataFrames
    step; production loops this plan with per-iteration
    localCheckpoint (d08's lineage rule). All-integer distances."""
    sym = _trade_sym(spark, sf_dir)
    sym.count()  # materialize: read every round
    nodes = sym.select(F.col("src").alias("node")).distinct()
    dist = nodes.withColumn(
        "d", F.when(F.col("node") == 0, F.lit(0)).cast("int")
    )
    for _ in range(2):
        neigh = (
            sym.join(
                F.broadcast(dist.withColumnRenamed("node", "src")), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg((F.min("d") + 1).alias("nd"))
        )
        dist = (
            dist.join(F.broadcast(neigh), "node", "left")
            .select("node", F.least("d", "nd").alias("d"))
            .localCheckpoint()
        )
    return (
        dist.filter(F.col("d").isNotNull())
        .groupBy(F.col("d").cast("long").alias("hops"))
        .agg(F.count("*").alias("n_nodes"))
    )
