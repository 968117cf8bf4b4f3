"""Graph analytics over the event stream: PageRank on the event-type
transition graph (north-star extension; the reference never builds graphs —
its per-day loop is `audit_data_ingest.py:236-260`).

The oracle unrolls the fixed iteration count into chained CTEs — every
arithmetic step is BIGINT floor division (see
``functions.graph.pagerank_integer``), so a 3-iteration distributed run
hash-matches plain SQL exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.graph import pagerank_integer
from ..tables import table
from .base import register

_PR_SCALE = 10**12
_PR_ITERS = 3
_PR_DAMP = 85  # damping percentage


def _pagerank_oracle_sql() -> str:
    """Unrolled-iteration DuckDB oracle mirroring ``pagerank_integer``."""
    head = f"""
    WITH ordered AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ) AS prev_type
      FROM events
    ), edges AS (
      SELECT prev_type AS src, event_type AS dst, COUNT(*) AS w
      FROM ordered WHERE prev_type IS NOT NULL
      GROUP BY src, dst
    ), nodes AS (
      SELECT DISTINCT src AS node FROM edges
      UNION SELECT DISTINCT dst FROM edges
    ), cnt AS (
      SELECT COUNT(*) AS n FROM nodes
    ), outw AS (
      SELECT src, SUM(w) AS ow FROM edges GROUP BY src
    ), r0 AS (
      SELECT node, {_PR_SCALE} // c.n AS r FROM nodes CROSS JOIN cnt c
    )"""
    body = ""
    prev = "r0"
    for i in range(1, _PR_ITERS + 1):
        body += f""", c{i} AS (
      SELECT e.dst AS node, SUM((r.r * e.w) // o.ow) AS c
      FROM edges e JOIN outw o USING (src) JOIN {prev} r ON r.node = e.src
      GROUP BY e.dst
    ), r{i} AS (
      SELECT n.node,
             ({100 - _PR_DAMP} * {_PR_SCALE}) // (100 * c.n)
             + ({_PR_DAMP} * COALESCE(s.c, 0)) // 100 AS r
      FROM nodes n CROSS JOIN cnt c LEFT JOIN c{i} s ON s.node = n.node
    )"""
        prev = f"r{i}"
    tail = f"""
    SELECT node, CAST(r AS BIGINT) AS rank_scaled
    FROM {prev}
    ORDER BY rank_scaled DESC, node
    """
    return head + body + tail


@register(
    "q106_event_pagerank",
    sql=_pagerank_oracle_sql(),
    tags=("events", "graph", "pagerank", "iterative"),
)
def q106_event_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the event-type transition graph (edges = q102's
    first-order Markov counts): which states a user journey gravitates
    toward — the centrality signal behind funnel prioritization and
    anomaly weighting.

    The event-type graph is small, but the kernel
    (``functions.graph.pagerank_integer``) is fully distributed — rank
    vector and edges stay DataFrames, each iteration is one src-keyed
    join plus one dst-keyed sum — so the same call handles a
    billion-node user-interaction graph; O(iterations) shuffles of
    (node, rank) pairs. Fixed-point BIGINT arithmetic makes the
    3-iteration result engine-exact (oracle unrolls the iterations as
    CTEs)."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    edges = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type").alias("src"), F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    ranks = pagerank_integer(
        edges, iterations=_PR_ITERS, scale=_PR_SCALE, damping_pct=_PR_DAMP
    )
    return ranks.orderBy(F.desc("rank_scaled"), "node")


# ---------------------------------------------------------------------------
# q146 — triangle census of the near-dup candidate graph
# ---------------------------------------------------------------------------
# `functions/graph.py::triangle_count` over the q52c SimHash pair graph: a
# healthy near-dup graph is clique-ish (re-encodes of one document all pair
# with each other → high closure); low closure means the banding is
# chaining unrelated documents through hubs — the dedup-QA signal that
# says "tighten the Hamming threshold before transitive-closing clusters".
# The oracle reuses q52c's full SQL as the edge CTE, then runs the same
# ordered-edge algebra — all integer, hash-exact.


def _triangle_oracle_sql() -> str:
    from .dedup import _simhash60_sql

    pair_sql = _simhash60_sql().strip().rstrip(";")
    return f"""
    WITH pairs AS (
      {pair_sql}
    ), e AS (
      SELECT DISTINCT LEAST(doc_a, doc_b) AS u, GREATEST(doc_a, doc_b) AS v
      FROM pairs WHERE doc_a != doc_b
    ), deg AS (
      SELECT n, COUNT(*) AS d FROM (
        SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e)
      GROUP BY n
    ), counts AS (
      SELECT COUNT(*) AS n_nodes, SUM(d * (d - 1) // 2) AS n_wedges FROM deg
    ), tri AS (
      SELECT COUNT(*) AS n_triangles
      FROM e e1 JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
                JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
    )
    SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           CAST(n_wedges AS BIGINT) AS n_wedges,
           CAST(n_triangles AS BIGINT) AS n_triangles,
           CAST(CASE WHEN n_wedges > 0
                     THEN 10000 * 3 * n_triangles // n_wedges
                     ELSE 0 END AS BIGINT) AS closure_bps
    FROM counts, tri
    """


@register(
    "q146_dedup_triangle_census",
    sql=_triangle_oracle_sql(),
    tags=("graph", "triangles", "dedup", "audit"),
)
def q146_dedup_triangle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census (`functions/graph.py::triangle_count`) of the
    60-bit SimHash near-dup pair graph (q52c's edges): global clustering
    coefficient in bps as the dedup-QA closure metric — clique-like
    clusters (true re-encode piles) close their wedges; hub-and-spoke
    chaining (banding artifacts) does not, and a low closure_bps is the
    signal to tighten thresholds before transitive clustering (q58/q90).

    Scale shape: the ordered-edge algorithm — wedges built at each
    edge's LOWER endpoint only (each triangle counted once), closure via
    one edge-keyed join; wedge volume Σ deg² stays bounded because the
    LSH bucket cap bounds degrees by construction."""
    from ..functions.graph import triangle_count
    from .dedup import q52c_simhash60_hamming

    pairs = q52c_simhash60_hamming(spark, sf_dir)
    return triangle_count(pairs, src="doc_a", dst="doc_b")


# ---------------------------------------------------------------------------
# q224 — degree assortativity of the near-dup graph (hub detection)
# ---------------------------------------------------------------------------
# q146's closure says whether wedges close; assortativity says WHO pairs
# with whom: re-encode piles are cliques (every node the same degree →
# r ≈ +1-ish), banding artifacts are hubs chaining low-degree satellites
# (high-degree↔low-degree edges → r < 0). Newman's r is the Pearson
# correlation of endpoint degrees over edges, symmetrized — exact in
# integers: with M = 2|E| samples, Sx = Σ(du+dv), Sxx = Σ(du²+dv²),
# Sxy = 2·Σ(du·dv):  r = (M·Sxy − Sx²) / (M·Sxx − Sx²). The milli
# output splits sign from magnitude (SIGN(num)·(1000·|num| DIV den)) —
# Spark's DIV truncates toward zero where DuckDB's // floors, so signed
# integer division must never see a negative operand (the q110-era
# discipline). Products run in DECIMAL(38,0)/HUGEINT.


def _assortativity_oracle_sql() -> str:
    from .dedup import _simhash60_sql

    pair_sql = _simhash60_sql().strip().rstrip(";")
    return f"""
    WITH pairs AS MATERIALIZED (
      {pair_sql}
    ), e AS MATERIALIZED (
      SELECT DISTINCT LEAST(doc_a, doc_b) AS u, GREATEST(doc_a, doc_b) AS v
      FROM pairs WHERE doc_a != doc_b
    ), deg AS MATERIALIZED (
      SELECT n, COUNT(*) AS d FROM (
        SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e)
      GROUP BY n
    ), ed AS (
      SELECT du.d AS d_u, dv.d AS d_v
      FROM e JOIN deg du ON du.n = e.u JOIN deg dv ON dv.n = e.v
    ), moments AS (
      SELECT CAST(2 * COUNT(*) AS HUGEINT) AS m,
             CAST(SUM(d_u + d_v) AS HUGEINT) AS sx,
             CAST(SUM(CAST(d_u AS HUGEINT) * d_u
                      + CAST(d_v AS HUGEINT) * d_v) AS HUGEINT) AS sxx,
             CAST(2 * SUM(CAST(d_u AS HUGEINT) * d_v) AS HUGEINT) AS sxy,
             COUNT(*) AS n_edges
      FROM ed
    )
    SELECT CAST(n_edges AS BIGINT) AS n_edges,
           CAST(sx AS BIGINT) AS sum_deg,
           CAST(sxx AS BIGINT) AS sum_deg_sq,
           CAST(sxy AS BIGINT) AS sum_deg_prod,
           CAST(CASE WHEN m * sxx - sx * sx = 0 THEN 0
                ELSE CASE WHEN m * sxy - sx * sx < 0 THEN -1 ELSE 1 END
                     * (1000 * ABS(m * sxy - sx * sx)
                        // (m * sxx - sx * sx)) END AS BIGINT)
             AS assortativity_milli
    FROM moments
    """


@register(
    "q224_dedup_assortativity",
    sql=_assortativity_oracle_sql(),
    tags=("graph", "audit", "dedup", "exact-integer"),
)
def q224_dedup_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman degree assortativity (exact milli) of the q52c near-dup
    pair graph, with the raw degree moments alongside (module comment):
    negative = hub-and-spoke banding artifacts, near-zero/positive =
    clique-like re-encode piles. The companion hub diagnostic to q146's
    wedge closure.

    Scale shape: degrees are one count over the edge endpoints, the
    (d_u, d_v) join touches only the (bucket-cap-bounded) edge list,
    and the moments collapse to one row — the corpus never re-enters
    after the pair query. Signed ratio splits sign from magnitude so
    cross-engine integer division never sees a negative operand.
    """
    from .dedup import q52c_simhash60_hamming

    pairs = q52c_simhash60_hamming(spark, sf_dir)
    # materialize the edge list ONCE: it feeds three plan branches (deg
    # twice, the moment join once) and would otherwise re-run the whole
    # simhash pipeline per branch — the kernel idiom in functions/graph.py
    e = (
        pairs.filter(F.col("doc_a") != F.col("doc_b"))
        .select(
            F.least("doc_a", "doc_b").alias("u"),
            F.greatest("doc_a", "doc_b").alias("v"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ed = (
        e.join(deg.select(F.col("n").alias("u"), F.col("d").alias("d_u")), "u")
        .join(deg.select(F.col("n").alias("v"), F.col("d").alias("d_v")), "v")
    )
    dec = "DECIMAL(38,0)"
    moments = ed.agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.expr(f"CAST(SUM(d_u + d_v) AS {dec})").alias("sx"),
        F.expr(
            f"CAST(SUM(CAST(d_u AS {dec}) * d_u + CAST(d_v AS {dec}) * d_v)"
            f" AS {dec})"
        ).alias("sxx"),
        F.expr(f"CAST(2 * SUM(CAST(d_u AS {dec}) * d_v) AS {dec})").alias(
            "sxy"
        ),
    ).withColumn("m", F.expr(f"CAST(2 * n_edges AS {dec})"))
    return moments.select(
        F.col("n_edges").cast("bigint").alias("n_edges"),
        F.col("sx").cast("bigint").alias("sum_deg"),
        F.col("sxx").cast("bigint").alias("sum_deg_sq"),
        F.col("sxy").cast("bigint").alias("sum_deg_prod"),
        F.expr(
            "CAST(CASE WHEN m * sxx - sx * sx = 0 THEN 0"
            " ELSE CASE WHEN m * sxy - sx * sx < 0 THEN -1 ELSE 1 END"
            " * (1000 * ABS(m * sxy - sx * sx) DIV (m * sxx - sx * sx))"
            " END AS BIGINT)"
        ).alias("assortativity_milli"),
    )


# ---------------------------------------------------------------------------
# q263 — weighted cheapest path over the journey graph (recursive CTE,
# one statement shared verbatim by both engines).
# ---------------------------------------------------------------------------
# q228 walks the MODAL journey graph by hop count; operations questions
# are usually weighted: "how fast can a user possibly reach state X from
# the entry point?" Edge weight = the FASTEST observed transition
# (exact integer micros — a lower bound the funnel can't beat), path
# cost = sum of weights, answer = min cost per reachable type within a
# hop budget. Bellman-Ford unrolled by the recursion, bounded because
# weights are non-negative and hops are capped.

_Q263_SEED = "view"
_Q263_MAX_HOPS = 4


def _q263_sql(events_rel: str) -> str:
    """One statement, two engines (q228's mechanism): Spark runs it
    verbatim; the DuckDB twin swaps STRING->VARCHAR and
    UNIX_MICROS->EPOCH_US (same function, same integer)."""
    return f"""
    WITH RECURSIVE ordered AS (
      SELECT user_id, event_type, event_id,
             UNIX_MICROS(CAST(ts AS TIMESTAMP)) AS us,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
             LAG(UNIX_MICROS(CAST(ts AS TIMESTAMP))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      FROM {events_rel}
    ), edges AS (
      SELECT prev_type, event_type AS next_type,
             CAST(MIN(us - prev_us) AS BIGINT) AS w
      FROM ordered WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    ), walk (t, cost, hops) AS (
      SELECT CAST('{_Q263_SEED}' AS STRING), CAST(0 AS BIGINT), 0
      UNION ALL
      SELECT e.next_type, w2.cost + e.w, w2.hops + 1
      FROM walk w2 JOIN edges e ON e.prev_type = w2.t
      WHERE w2.hops < {_Q263_MAX_HOPS}
    )
    SELECT t AS event_type, CAST(MIN(cost) AS BIGINT) AS min_cost_us
    FROM walk GROUP BY t ORDER BY min_cost_us, event_type
    """


@register(
    "q263_cheapest_journey_path",
    sql=_q263_sql("events")
    .replace("AS STRING", "AS VARCHAR")
    .replace("UNIX_MICROS(", "EPOCH_US("),
    tags=("events", "graph", "recursive-cte", "weighted-path", "journey"),
)
def q263_cheapest_journey_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheapest-path costs (exact micros) from the '{seed}' entry type to
    every journey state reachable in <= {hops} transitions, where each
    edge costs its fastest observed dwell — the latency lower bound per
    funnel state. Spark 4's WITH RECURSIVE executes the same statement
    text as the DuckDB oracle (module comment).

    Scale shape: the corpus is scanned ONCE, outside the recursion (one
    user-keyed window exchange + a |types|² rollup builds the edge
    list); every recursion step joins the frontier against that
    broadcast-sized edge table, and non-negative weights + the hop cap
    bound the frontier at |types|^hops paths of a |types|-node graph —
    driver-small however large the corpus grows.
    """
    e = table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", "ts"
    )
    e.createOrReplaceTempView("q263_events")
    return spark.sql(_q263_sql("q263_events"))
