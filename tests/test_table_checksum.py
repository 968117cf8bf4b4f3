"""Drills for the anti-entropy table checksum (q261): the fingerprint
must move under any content divergence a replica audit exists to catch —
a mutated value, a missing row, a DUPLICATED row (the SUM-vs-XOR
rationale) — and must not move under reordering or repartitioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.queries.relational import (
    q261_table_checksum,
)
from dataworks_audit_data_ingest_spark.tables import table

SF = "/root/testdata/sf0.001"


def _rows(df):
    return {r.month: (r.n_rows, r.checksum) for r in df.collect()}


def _checksum_of(spark, orders_df, tmp_path, name):
    path = str(tmp_path / name)
    orders_df.write.mode("overwrite").parquet(path)
    # q261 reads <dir>/orders.parquet via tables.table
    return _rows(q261_table_checksum(spark, str(tmp_path)))


def test_detects_mutation_duplicate_and_loss(spark, tmp_path):
    orders = table(spark, SF, "orders")
    base = _checksum_of(spark, orders, tmp_path, "orders.parquet")

    victim = orders.orderBy("o_orderkey").limit(1).collect()[0]
    # fixture ships o_orderdate as a timestamp; q261 keys months as DATE
    month = victim.o_orderdate.date().replace(day=1)

    mutated = orders.withColumn(
        "o_orderpriority",
        F.when(
            F.col("o_orderkey") == victim.o_orderkey, F.lit("9-TAMPERED")
        ).otherwise(F.col("o_orderpriority")),
    )
    got = _checksum_of(spark, mutated, tmp_path, "orders.parquet")
    assert got[month][0] == base[month][0]  # same row count...
    assert got[month][1] != base[month][1]  # ...different checksum
    assert {m: v for m, v in got.items() if m != month} == {
        m: v for m, v in base.items() if m != month
    }  # divergence LOCALIZED to the victim's month

    dup_row = orders.filter(F.col("o_orderkey") == victim.o_orderkey)
    duplicated = orders.unionByName(dup_row)
    got = _checksum_of(spark, duplicated, tmp_path, "orders.parquet")
    assert got[month][0] == base[month][0] + 1
    assert got[month][1] != base[month][1]  # XOR would have self-cancelled

    lost = orders.filter(F.col("o_orderkey") != victim.o_orderkey)
    got = _checksum_of(spark, lost, tmp_path, "orders.parquet")
    assert got[month][0] == base[month][0] - 1
    assert got[month][1] != base[month][1]


def test_order_and_partitioning_invariant(spark, tmp_path):
    orders = table(spark, SF, "orders")
    base = _checksum_of(spark, orders, tmp_path, "orders.parquet")
    shuffled = orders.repartition(13).sortWithinPartitions("o_custkey")
    got = _checksum_of(spark, shuffled, tmp_path, "orders.parquet")
    assert got == base


def test_delimiter_injection_shifts_fingerprint(spark):
    """Field values containing the ``|`` joiner (or the ␛ escape char, or
    a literal ␀) must NOT collide across field boundaries — the r10
    ADVICE delimiter-injection finding. ('a|b','c') vs ('a','b|c') used
    to fingerprint identically; the ␛-escaped serialization keeps them
    apart, and a literal ␀ stays distinct from NULL."""
    from dataworks_audit_data_ingest_spark.functions.checksum import (
        table_fingerprint,
    )

    def fp(rows):
        df = spark.createDataFrame(rows, "g int, x string, y string")
        out = table_fingerprint(df, ["g"], ["x", "y"]).collect()
        return {r.g: (r.n_rows, r.checksum) for r in out}

    a = fp([(1, "a|b", "c")])
    b = fp([(1, "a", "b|c")])
    assert a != b

    # escape-char injection: ('a␛', '|b') vs ('a', '␛|b') — the naive
    # "escape | only" scheme collides these; escaping ␛ first keeps
    # the encoding prefix-free
    assert fp([(1, "a␛", "|b")]) != fp([(1, "a", "␛|b")])

    # literal NULL sentinel in data vs an actual NULL
    assert fp([(1, "␀", "c")]) != fp([(1, None, "c")])


def test_checksum_accumulates_in_decimal(spark):
    """The fingerprint sum must be DECIMAL(38,0), not BIGINT — a BIGINT
    accumulator wraps silently past ~2^31 rows per group (r10 ADVICE)."""
    from dataworks_audit_data_ingest_spark.functions.checksum import (
        table_fingerprint,
    )

    df = spark.createDataFrame([(1, "a")], "g int, x string")
    out = table_fingerprint(df, ["g"], ["x"])
    assert dict(out.dtypes)["checksum"] == "decimal(38,0)"


def test_q261_partition_invariant(spark):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        rows = {}
        for n in ("7", before):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            rows[n] = [
                tuple(r) for r in q261_table_checksum(spark, SF).collect()
            ]
        assert rows["7"] == rows[before]
        assert rows[before]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
