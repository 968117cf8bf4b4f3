"""SQL-scripting operators — Spark 4's procedural SQL (BEGIN…END,
DECLARE, WHILE, IF) driven from the engine.

Spark 4.0 added ANSI SQL scripting (SPARK-48338, enabled via
``spark.sql.scripting.enabled``): control flow lives INSIDE one SQL
statement, so a fixpoint loop can ship as a single auditable script —
no driver-side Python between rounds. This module runs the repo's
min-label connected-components fixpoint that way, making it the FOURTH
independent CC implementation (iterative DataFrame kernel, star
contraction, chained recursive CTEs — q232 — and now scripted SQL); the
four-way agreement drill pins them against each other on real pair
lists.

Shape notes: each round materializes under a FRESH per-round view name
through EXECUTE IMMEDIATE (Spark temp views store unresolved plans, so
any fixed-name swap trips the recursive-view detector — the dynamic
name side-steps it and keeps plans nesting linearly); each round is the
same one-hop min-propagation join the DataFrame kernel runs, and the
loop exits at the observed fixpoint — the EXACT fixpoint, like the
kernel, with no hop guard (q232's recursion needs one because recursion
cannot observe convergence). Plans nest one level per round, so this
form fits the near-dup regime (diameter ≤ a few); the kernel's
localCheckpoint discipline remains the deep-graph path.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# refcount for the session-wide scripting flag: concurrent calls on one
# SparkSession must not restore the conf while a sibling is mid-fixpoint.
# Keyed PER SESSION — the conf is session-scoped, so a process-global
# depth would skip enabling the flag on a second session and restore the
# wrong saved value across sessions.
_SCRIPTING_LOCK = threading.Lock()
_SCRIPTING_STATE: dict[int, list] = {}  # id(session) -> [depth, saved]


def scripted_connected_components(
    spark: SparkSession,
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 30,
) -> DataFrame:
    """(node_id, cluster_id) with cluster id = component minimum — the
    min-label fixpoint executed entirely as ONE SQL script. Mirrors the
    kernel's exhaustion contract: if ``max_iter`` rounds pass without
    convergence the result is verified post-hoc (`verify_cc_fixpoint`)
    and a warning fires rather than silently returning mid-iteration
    labels."""
    import uuid

    skey = id(spark)
    with _SCRIPTING_LOCK:
        state = _SCRIPTING_STATE.setdefault(skey, [0, "false"])
        if state[0] == 0:
            state[1] = spark.conf.get(
                "spark.sql.scripting.enabled", "false"
            )
            spark.conf.set("spark.sql.scripting.enabled", "true")
        state[0] += 1
    # per-call view namespace: session-global temp views under FIXED names
    # would let two concurrent calls on one SparkSession clobber each
    # other's views mid-fixpoint (the per-ROUND suffix below is a separate
    # requirement — fixed-name swaps trip the recursive-view detector)
    tok = uuid.uuid4().hex[:8]
    base = f"cc_scripted_{tok}"
    try:
        edge_pairs = pairs.select(
            pairs[src].alias("doc_a"), pairs[dst].alias("doc_b")
        ).localCheckpoint(eager=True)
        edge_pairs.createOrReplaceTempView(f"{base}_pairs")
        # one propagation round, dst/src view names spliced per round
        step = (
            f"CREATE OR REPLACE TEMPORARY VIEW {base}_r' || (rounds + 1) || ' AS"
            " SELECT l.node_id,"
            "        LEAST(l.label, COALESCE(m.nlabel, l.label)) AS label"
            f" FROM {base}_r' || rounds || ' l LEFT JOIN ("
            "   SELECT e.u AS node_id, MIN(l2.label) AS nlabel"
            f"   FROM {base}_edges e"
            f"   JOIN {base}_r' || rounds || ' l2 ON l2.node_id = e.v"
            "   GROUP BY e.u) m"
            " ON m.node_id = l.node_id"
        )
        diff = (
            f"SELECT COUNT(*) FROM {base}_r' || (rounds + 1) || ' n"
            f" JOIN {base}_r' || rounds || ' o"
            " ON n.node_id = o.node_id AND n.label != o.label"
        )
        out = spark.sql(f"""
        BEGIN
          DECLARE changed BIGINT DEFAULT 1;
          DECLARE rounds INT DEFAULT 0;
          CREATE OR REPLACE TEMPORARY VIEW {base}_edges AS
            SELECT doc_a AS u, doc_b AS v FROM {base}_pairs
            UNION ALL
            SELECT doc_b AS u, doc_a AS v FROM {base}_pairs;
          CREATE OR REPLACE TEMPORARY VIEW {base}_r0 AS
            SELECT DISTINCT u AS node_id, u AS label
            FROM {base}_edges;
          WHILE changed > 0 AND rounds < {max_iter} DO
            EXECUTE IMMEDIATE '{step}';
            EXECUTE IMMEDIATE '{diff}' INTO changed;
            SET rounds = rounds + 1;
          END WHILE;
          EXECUTE IMMEDIATE
            'SELECT node_id, label AS cluster_id FROM {base}_r'
            || rounds;
        END
        """)
        out = out.localCheckpoint(eager=True)
        if not verify_cc_fixpoint(
            spark, out, edge_pairs, src="doc_a", dst="doc_b"
        ):
            import warnings

            warnings.warn(
                f"scripted_connected_components hit max_iter={max_iter}"
                " before fixpoint; labels may not be component minima —"
                " raise max_iter for graphs with diameter beyond it",
                stacklevel=2,
            )
        return out
    finally:
        # drop this call's whole view namespace (count of _r<N> views is
        # only known at runtime — sweep the catalog by prefix)
        for t in spark.catalog.listTables():
            if t.name.startswith(base):
                spark.catalog.dropTempView(t.name)
        with _SCRIPTING_LOCK:
            state = _SCRIPTING_STATE[skey]
            state[0] -= 1
            if state[0] == 0:
                spark.conf.set(
                    "spark.sql.scripting.enabled", state[1]
                )
                del _SCRIPTING_STATE[skey]


def verify_cc_fixpoint(
    spark: SparkSession, labels: DataFrame, pairs: DataFrame,
    src: str = "doc_a", dst: str = "doc_b",
) -> bool:
    """True iff ``labels`` is a min-label fixpoint of ``pairs`` — one
    extra propagation step changes nothing. The convergence guard for
    `scripted_connected_components` (a script that exhausts ``max_iter``
    returns non-converged labels with no signal of its own — mirror the
    kernel's contract by checking, and warn, at the call site):

        labels = scripted_connected_components(spark, pairs)
        assert verify_cc_fixpoint(spark, labels, pairs)
    """
    e = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    both = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    neigh = (
        both.join(
            labels.select(
                F.col("node_id").alias("v"), F.col("cluster_id").alias("nl")
            ),
            "v",
        )
        .groupBy(F.col("u").alias("node_id"))
        .agg(F.min("nl").alias("nlabel"))
    )
    changed = (
        labels.join(neigh, "node_id")
        .filter(F.col("nlabel") < F.col("cluster_id"))
        .limit(1)
        .count()
    )
    return changed == 0
