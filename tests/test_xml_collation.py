"""Drills for q255 (native XML round-trip) and q256 (UTF8_LCASE
collation): partition invariance, the collation actually merging case
variants, and the XML leg preserving row counts and types."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.queries.advanced import (
    q256_collated_distinct,
)
from dataworks_audit_data_ingest_spark.queries.ingest_shaped import (
    q255_xml_roundtrip_census,
)
from dataworks_audit_data_ingest_spark.sources.readers import (
    read_xml,
    write_xml,
)
from dataworks_audit_data_ingest_spark.tables import table

SF = "/root/testdata/sf0.001"


def test_q255_q256_partition_invariant(spark):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        rows = {}
        for n in ("7", before):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            rows[n] = {
                "q255": [tuple(r) for r in q255_xml_roundtrip_census(spark, SF).collect()],
                "q256": [tuple(r) for r in q256_collated_distinct(spark, SF).collect()],
            }
        assert rows["7"] == rows[before]
        assert all(rows[before][k] for k in rows[before])
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)


def test_q256_collation_merges_what_raw_distinct_keeps_apart(spark):
    out = q256_collated_distinct(spark, SF).collect()
    assert out
    # the mangle creates case variants: somewhere raw > ci, and the
    # case-insensitive count can never exceed the raw count
    assert any(r.distinct_raw > r.distinct_ci for r in out)
    assert all(r.distinct_ci <= r.distinct_raw for r in out)
    # ci distinct == the nation's true segment count (collation undoes
    # exactly the case mangling, nothing else)
    truth = {
        r.nation: r.n
        for r in table(spark, SF, "customer")
        .join(
            table(spark, SF, "nation"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.countDistinct("c_mktsegment").alias("n"))
        .collect()
    }
    assert {r.nation: r.distinct_ci for r in out} == truth


def test_xml_roundtrip_preserves_rows_and_types(spark, tmp_path):
    meta = table(spark, SF, "documents").select("doc_id", "lang", "n_chars")
    write_xml(meta, str(tmp_path / "docs"), row_tag="doc")
    back = read_xml(
        spark,
        str(tmp_path / "docs"),
        row_tag="doc",
        schema="doc_id bigint, lang string, n_chars bigint",
    )
    assert back.count() == meta.count()
    got = sorted(tuple(r) for r in back.collect())
    want = sorted(
        (int(r.doc_id), r.lang, int(r.n_chars)) for r in meta.collect()
    )
    assert got == want


def test_xml_roundtrip_escapes_special_characters(spark, tmp_path):
    """XML's classic loss channel is markup characters in values —
    <, >, &, quotes, newlines must survive the writer/reader pair
    verbatim (q255 deliberately keeps free text off XML; this pins that
    the escaping itself is sound for string METADATA that may contain
    them, e.g. source URLs with &query params)."""
    rows = [
        (1, "a < b & c > d"),
        (2, 'quote " and \' apostrophe'),
        (3, "line\nbreak and\ttab"),
        (4, "https://host/path?x=1&y=<z>"),
        (5, "]]> cdata-ish and <!-- comment-ish -->"),
    ]
    df = spark.createDataFrame(rows, "id int, s string")
    write_xml(df, str(tmp_path / "esc"), row_tag="r")
    back = read_xml(
        spark, str(tmp_path / "esc"), row_tag="r", schema="id int, s string"
    )
    assert sorted(tuple(r) for r in back.collect()) == sorted(rows)
