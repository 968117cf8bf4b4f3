"""Sinks, pandas_udf surface, and operators façade tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.functions.udfs import (
    byte_length,
    normalize_text,
    normalized_fingerprint,
)
from dataworks_audit_data_ingest_spark.sinks import (
    start_parquet_stream_sink,
    write_partitioned_parquet,
)
from dataworks_audit_data_ingest_spark.tables import table

SF = "/root/testdata/sf0.001"


def test_partitioned_parquet_roundtrip_prunes(spark, tmp_path):
    ev = table(spark, SF, "events").withColumn(
        "day", F.date_trunc("day", "ts").cast("date")
    )
    out = str(tmp_path / "lake")
    write_partitioned_parquet(ev, out, partition_by=("day",), files_per_partition=2)
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    # partition pruning: a day filter must touch one partition directory
    one_day = back.filter(F.col("day") == "2024-01-05")
    plan = one_day._sc._jvm.PythonSQLUtils.explainString(
        one_day._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan
    assert one_day.count() == ev.filter(F.col("day") == "2024-01-05").count()


def test_streaming_parquet_sink(spark, tmp_path):
    import json

    src = tmp_path / "src"
    src.mkdir()
    rows = table(spark, SF, "events").limit(50).collect()
    with open(src / "e.json", "w") as f:
        for r in rows:
            f.write(
                json.dumps(
                    {
                        "event_id": r.event_id,
                        "ts": r.ts.isoformat(sep=" "),
                        "user_id": r.user_id,
                        "event_type": r.event_type,
                        "value": r.value,
                        "props": r.props,
                    }
                )
                + "\n"
            )
    from dataworks_audit_data_ingest_spark.streaming import stream_events_json

    q = start_parquet_stream_sink(
        stream_events_json(spark, str(src)),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    assert spark.read.parquet(str(tmp_path / "out")).count() == 50


def test_pandas_udfs(spark):
    df = spark.createDataFrame(
        [("  Hello   WORLD  ",), ("ünï  code",)], "s string"
    )
    out = df.select(
        normalize_text("s").alias("norm"),
        byte_length("s").alias("blen"),
        normalized_fingerprint("s").alias("fp"),
    ).collect()
    assert out[0].norm == "hello world"
    assert out[1].norm == "ünï code"
    assert out[0].blen == len("  Hello   WORLD  ".encode())
    import hashlib

    assert out[0].fp == hashlib.md5(b"hello world").hexdigest()


def test_operators_facade():
    from dataworks_audit_data_ingest_spark import operators

    assert len(operators.all_queries()) >= 55
    joins = operators.by_tag("join")
    assert "q03_regional_revenue" in joins and "q25_asof_join" in joins
    assert callable(operators.run_ingest)
    assert callable(operators.running_user_profiles)


def test_chunk_document_udtf(spark):
    from dataworks_audit_data_ingest_spark.functions.udtfs import ChunkDocument

    spark.udtf.register("chunk_document", ChunkDocument)
    d = table(spark, SF, "documents")
    d.createOrReplaceTempView("udtf_docs")
    out = spark.sql(
        """
        SELECT doc_id, c.chunk_idx, c.n_tokens
        FROM udtf_docs, LATERAL chunk_document(text, 16) AS c
        WHERE doc_id < 20
        """
    ).collect()
    assert out
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    src = {r.doc_id: len(r.text.split(" ")) for r in d.filter("doc_id < 20").collect()}
    for doc_id, chunks in by_doc.items():
        assert sum(c.n_tokens for c in chunks) == src[doc_id]
        assert all(c.n_tokens <= 16 for c in chunks)
        assert sorted(c.chunk_idx for c in chunks) == list(range(len(chunks)))


def test_register_views_enables_raw_sql(spark):
    from dataworks_audit_data_ingest_spark.tables import register_views

    views = register_views(spark, "/root/testdata/sf0.001")
    assert "lineitem" in views and "events" in views
    out = spark.sql(
        """
        SELECT l_returnflag, COUNT(*) AS n
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag ORDER BY l_returnflag
        """
    ).collect()
    assert len(out) == 3 and all(r.n > 0 for r in out)
    # events view exposes the rebuilt microsecond timestamp, not raw nanos
    assert dict(spark.table("events").dtypes)["ts"] == "timestamp"


def test_cluster_submit_conf_is_complete(spark):
    from dataworks_audit_data_ingest_spark.session import CLUSTER_SUBMIT_CONF

    required = {
        "spark.sql.shuffle.partitions",
        "spark.sql.files.maxPartitionBytes",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.io.encryption.enabled",
    }
    assert required <= set(CLUSTER_SUBMIT_CONF)
    assert all(isinstance(v, str) for v in CLUSTER_SUBMIT_CONF.values())


def test_orc_round_trip_with_partition_pruning(spark, tmp_path):
    from pyspark.sql import functions as F

    from dataworks_audit_data_ingest_spark.sinks.writers import (
        write_partitioned_orc,
    )
    from dataworks_audit_data_ingest_spark.sources.readers import read_orc
    from dataworks_audit_data_ingest_spark.tables import table

    out = str(tmp_path / "orc")
    ev = table(spark, "/root/testdata/sf0.001", "events").withColumn(
        "day", F.to_date("ts")
    )
    write_partitioned_orc(ev, out, partition_by=("day",))
    back = read_orc(spark, out)
    assert back.count() == ev.count()
    one_day = ev.select(F.min("day")).first()[0]
    pruned = back.filter(F.col("day") == F.lit(one_day))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "day" in plan
    assert pruned.count() == ev.filter(F.col("day") == F.lit(one_day)).count()


def test_zorder_layout_concentrates_matches(spark, tmp_path):
    """Z-ordering on (user_id, value) must concentrate a selective
    user-range filter's matches into fewer files than an unclustered
    layout — the locality that min/max statistics turn into file skipping."""
    from pyspark.sql import functions as F

    from dataworks_audit_data_ingest_spark.sinks.layout import (
        files_touched,
        zorder_write,
    )
    from dataworks_audit_data_ingest_spark.tables import table

    ev = table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "value"
    )
    plain = str(tmp_path / "plain")
    zord = str(tmp_path / "zorder")
    # unclustered baseline: round-robin into the same file count
    ev.repartition(8).write.parquet(plain)
    zorder_write(ev, zord, cols=("user_id", "value"), n_files=8)

    assert spark.read.parquet(zord).count() == ev.count()

    pred = (F.col("user_id") >= 10) & (F.col("user_id") < 20)
    n_plain = files_touched(spark.read.parquet(plain).filter(pred))
    n_z = files_touched(spark.read.parquet(zord).filter(pred))
    assert n_z < n_plain, (n_z, n_plain)
    # and the second interleaved column also gets locality
    pred_v = F.col("value") < 5.0
    n_plain_v = files_touched(spark.read.parquet(plain).filter(pred_v))
    n_z_v = files_touched(spark.read.parquet(zord).filter(pred_v))
    assert n_z_v <= n_plain_v


def test_zorder_bloom_filters_exist_and_roundtrip(spark, tmp_path):
    """`zorder_write(bloom_cols=...)` must physically write the bloom
    filters: same deterministic data, same layout, the ONLY difference
    the bloom option — the bloomed output must carry extra filter bytes
    (pyarrow does not expose bloom offsets, so byte delta on identical
    content is the existence proof) and read back identically. Sized
    via the explicit ndv knob; a bad bloom_col name raises."""
    import pathlib

    import pytest
    from pyspark.sql import functions as F

    from dataworks_audit_data_ingest_spark.sinks.layout import zorder_write
    from dataworks_audit_data_ingest_spark.tables import table

    ev = table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "value"
    )
    plain = str(tmp_path / "plain")
    bloomed = str(tmp_path / "bloomed")
    zorder_write(ev, plain, cols=("user_id", "value"), n_files=4)
    zorder_write(
        ev,
        bloomed,
        cols=("user_id", "value"),
        n_files=4,
        bloom_cols=("event_id",),
        bloom_ndv=2000,
    )

    def dir_bytes(p):
        return sum(
            f.stat().st_size
            for f in pathlib.Path(p).rglob("*.parquet")
        )

    assert dir_bytes(bloomed) > dir_bytes(plain)
    got = spark.read.parquet(bloomed)
    assert got.count() == ev.count()
    assert (
        got.exceptAll(ev.select(*got.columns)).count() == 0
        and ev.select(*got.columns).exceptAll(got).count() == 0
    )
    # a point probe on the scattered id still answers correctly
    some_id = ev.select("event_id").limit(1).collect()[0][0]
    assert (
        got.filter(F.col("event_id") == F.lit(some_id)).count()
        == ev.filter(F.col("event_id") == F.lit(some_id)).count()
    )
    with pytest.raises(ValueError, match="bloom_cols not in the frame"):
        zorder_write(
            ev,
            str(tmp_path / "bad"),
            cols=("user_id",),
            bloom_cols=("nope",),
        )
