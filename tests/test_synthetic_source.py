"""Python Data Source drills (`sources/synthetic.py`): deterministic
generation, partition fan-out, batch == streaming == local generator ==
DuckDB regeneration, and checkpointed streaming resume."""

from __future__ import annotations

import duckdb

from dataworks_audit_data_ingest_spark.sources.synthetic import (
    SyntheticEventsDataSource,
    checkpoint_offset,
    duckdb_generation_sql,
    gen_row,
)

ROWS = 2_000


def _register(spark):
    spark.dataSource.register(SyntheticEventsDataSource)


def test_batch_read_matches_generator_and_duckdb(spark):
    _register(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("rows", ROWS)
        .option("n_partitions", 7)
        .load()
    )
    assert df.rdd.getNumPartitions() == 7
    got = sorted(map(tuple, df.collect()))
    assert got == [gen_row(i) for i in range(ROWS)]
    assert got == sorted(duckdb.sql(duckdb_generation_sql(ROWS)).fetchall())


def test_partition_count_invariance(spark):
    _register(spark)
    reads = [
        sorted(
            map(
                tuple,
                spark.read.format("synthetic_events")
                .option("rows", 500)
                .option("n_partitions", n)
                .load()
                .collect(),
            )
        )
        for n in (1, 3, 32)
    ]
    assert reads[0] == reads[1] == reads[2]


def test_stream_resumes_from_checkpoint_in_bounded_chunks(
    spark, tmp_path
):
    """Each availableNow drain snapshots one latestOffset poll — one
    bounded rows_per_batch chunk — and the next drain resumes from the
    checkpoint's committed index: no duplicates, no gaps, full range
    after ceil(rows / rows_per_batch) drains."""
    _register(spark)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.format("synthetic_events")
            .option("rows", ROWS)
            .option("rows_per_batch", 600)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return checkpoint_offset(ckpt)

    offsets = [drain()]
    while offsets[-1] < ROWS:
        offsets.append(drain())
    assert offsets == [600, 1200, 1800, 2000]  # bounded chunks, capped
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert got == [gen_row(i) for i in range(ROWS)]
    # a further drain past the cap is a no-op (no duplicates)
    assert drain() == ROWS
    assert spark.read.parquet(out).count() == ROWS
