"""SRP-LSH parameter study: recall@k and candidate volume of the q89
sign-random-projection banding against exact brute-force cosine top-k.

    python tools/srp_study.py [--sf /root/testdata/sf0.01]

All arithmetic mirrors q89 exactly (portable-hash hyperplanes,
integer-quantized projections via the shared SRP_SCALE) but runs in
DuckDB for sweep speed — the Spark and DuckDB
forms are value-identical by the q89 oracle check, so recall measured here
is the recall of the Spark plan. Reported per (bands x bits) split of the
16-bit signature; candidates = distinct (query, neighbor) pairs the band
join emits, the verify-stage join size at scale.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

from dataworks_audit_data_ingest_spark.queries.similarity import (  # noqa: E402
    _N_QUERIES,
    _SRP_BITS,
    _SRP_SCALE,
    _srp_h,
)

TOP_K = 3
CONFIGS = [(2, 8), (4, 4), (8, 2), (16, 1)]  # (bands, bits per band)



def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{args.sf}/embeddings.parquet'"
    )
    con.execute(
        f"""
        CREATE TEMP TABLE elems AS
        SELECT vec_id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS v
        FROM (SELECT vec_id, embedding,
                     UNNEST(RANGE(1, LEN(embedding) + 1)) AS i
              FROM embeddings)
        """
    )
    con.execute(
        f"""
        CREATE TEMP TABLE bits AS
        WITH hyper AS (
          SELECT j, pos, {_srp_h("j", "pos", "duckdb")} AS h
          FROM (SELECT UNNEST(RANGE(0, {_SRP_BITS})) AS j)
          CROSS JOIN (SELECT DISTINCT pos FROM elems)
        )
        SELECT vec_id, j,
               CASE WHEN SUM(CAST(FLOOR(v * h * {_SRP_SCALE}) AS BIGINT)) >= 0
                    THEN 1 ELSE 0 END AS bit
        FROM elems JOIN hyper USING (pos)
        GROUP BY vec_id, j
        """
    )
    # exact ground truth: brute-force cosine top-k per query
    con.execute(
        f"""
        CREATE TEMP TABLE truth AS
        WITH norms AS (
          SELECT vec_id, SQRT(SUM(v * v)) AS nrm FROM elems GROUP BY vec_id
        ), dots AS (
          SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
                 SUM(q.v * t.v) AS dot
          FROM elems q JOIN elems t USING (pos)
          WHERE q.vec_id < {_N_QUERIES} AND t.vec_id != q.vec_id
          GROUP BY query_id, neighbor_id
        )
        SELECT query_id, neighbor_id FROM (
          SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY dot / (nq.nrm * nt.nrm) DESC, neighbor_id) AS rnk
          FROM dots
            JOIN norms nq ON nq.vec_id = dots.query_id
            JOIN norms nt ON nt.vec_id = dots.neighbor_id)
        WHERE rnk <= {TOP_K}
        """
    )
    n_truth = con.execute("SELECT COUNT(*) FROM truth").fetchone()[0]

    print(f"sf={args.sf} queries={_N_QUERIES} k={TOP_K} truth_pairs={n_truth}")
    print("| bands x bits | candidates | recall@3 |")
    print("|---|---|---|")
    for bands, bits in CONFIGS:
        assert bands * bits == _SRP_BITS
        con.execute("DROP TABLE IF EXISTS cands")
        con.execute(
            f"""
            CREATE TEMP TABLE cands AS
            WITH bnd AS (
              SELECT vec_id, CAST(j // {bits} AS INT) AS band,
                     SUM(bit << CAST(j % {bits} AS INT)) AS bval
              FROM bits GROUP BY vec_id, band
            )
            SELECT DISTINCT q.vec_id AS query_id, t.vec_id AS neighbor_id
            FROM bnd q JOIN bnd t USING (band, bval)
            WHERE q.vec_id < {_N_QUERIES} AND t.vec_id != q.vec_id
            """
        )
        n_cand = con.execute("SELECT COUNT(*) FROM cands").fetchone()[0]
        hit = con.execute(
            "SELECT COUNT(*) FROM truth JOIN cands USING (query_id, neighbor_id)"
        ).fetchone()[0]
        print(f"| {bands} x {bits} | {n_cand} | {hit}/{n_truth} |")


if __name__ == "__main__":
    main()
