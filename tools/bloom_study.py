"""Measured study, round-10 follow-up: parquet BLOOM FILTERS at
production row-group sizes — the honest-negative from the fixture-scale
probe (STATUS.md round 10: 64 KB row groups, bloom bytes exceeded the
bytes they skipped) re-run at the scale where blooms are designed to
operate.

    python tools/bloom_study.py [n_rows] [n_files]

Generates ``n_rows`` (default 6M) of synthetic events whose ``event_id``
is an md5 hex string — high-cardinality and SCATTERED, so neither
row-group min/max (zone maps) nor page-level column indexes can prune a
point predicate; exactly the workload blooms exist for. Writes the same
data twice (bloom on event_id vs none; default 128 MB row groups, one
per file), then measures point lookups for
(a) a PRESENT id — bloom should confine the decode to ~one file's row
group — and (b) an ABSENT id — bloom should skip every group. Also
reports the on-disk overhead the blooms cost.

Measurement is WALL-CLOCK over warmed repetitions (min of 3, page cache
hot): the status-API inputBytes metric that zonemap_study uses does not
capture this build's vectorized parquet reads on local files (calibrated:
a full scan of ~80 MB reports 0.04 MB), so bytes would flatter whichever
side you believed in advance. Bloom pruning is row-group-level DECODE
avoidance; with a hot cache, wall-clock is exactly that.

Rows are a pure function of the row index (the q237 synthetic-source
idiom), so the study is deterministic and needs no fixture larger than
the testdata ships.
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def _dir_bytes(path: str) -> int:
    return sum(p.stat().st_size for p in Path(path).rglob("*") if p.is_file())


def _gen(spark, n_rows: int, n_files: int):
    return (
        spark.range(n_rows)
        .select(
            F.md5(F.col("id").cast("string")).alias("event_id"),
            (F.xxhash64(F.col("id").cast("string")) % 1000).alias("v1"),
            (F.col("id") % 86400).alias("ts_s"),
            F.sha1(F.concat(F.lit("p"), F.col("id").cast("string"))).alias(
                "payload"
            ),
        )
        .repartition(n_files)  # one ~spark-default row group per file
    )


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--sink"]
    use_sink = "--sink" in sys.argv[1:]
    n_rows = int(args[0]) if len(args) > 0 else 6_000_000
    n_files = int(args[1]) if len(args) > 1 else 8
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.showConsoleProgress", "false")
        # the --sink path sorts each ~128 MB row group in-task before
        # the parquet write; the default 1g heap OOMs at 6M rows
        .config("spark.driver.memory", "12g")
        .appName("bloom-study")
        .getOrCreate()
    )
    base = tempfile.mkdtemp(prefix="bloom_study_")
    plain, bloomed = f"{base}/plain", f"{base}/bloom"
    df = _gen(spark, n_rows, n_files)
    if use_sink:
        # the engine's OWN sorted sink (round-11 follow-up): Z-order
        # clusters (v1, ts_s); event_id stays scattered — exactly the
        # column the new bloom_cols knob exists for
        from dataworks_audit_data_ingest_spark.sinks.layout import (
            zorder_write,
        )

        print(f"writer: zorder_write(cols=(v1, ts_s), n_files={n_files})")
        zorder_write(df, plain, cols=("v1", "ts_s"), n_files=n_files)
        zorder_write(
            df,
            bloomed,
            cols=("v1", "ts_s"),
            n_files=n_files,
            bloom_cols=("event_id",),
            bloom_ndv=max(1, n_rows // n_files),
        )
    else:
        df.write.mode("overwrite").parquet(plain)
        (
            df.write.mode("overwrite")
            .option("parquet.bloom.filter.enabled#event_id", "true")
            .option(
                "parquet.bloom.filter.expected.ndv#event_id",
                str(max(1, n_rows // n_files)),
            )
            .parquet(bloomed)
        )
    present = F.md5(F.lit(str(n_rows // 2)))
    # MID-domain absent value: an edge value like "000...0" would sit
    # below every page's min and be pruned by plain min/max stats,
    # crediting zone maps with the bloom's job
    absent = F.lit("8" * 32)
    probes = [("present", present), ("absent", absent)]
    print(
        f"rows: {n_rows}  files: {n_files}  "
        f"plain: {_dir_bytes(plain) / 1e6:.1f} MB  "
        f"bloom: {_dir_bytes(bloomed) / 1e6:.1f} MB "
        f"(+{(_dir_bytes(bloomed) - _dir_bytes(plain)) / 1e6:.1f} MB blooms)"
    )
    print("| layout | probe | rows hit | wall min s | wall mean s |")
    print("|---|---|---|---|---|")
    for name, path in (("plain", plain), ("bloom", bloomed)):
        # warm the page cache with a PROBE-SHAPED query (a v1-only scan
        # would column-prune and leave the event_id chunks cold for the
        # first timed repetition, biasing the mean toward whichever
        # layout ran second)
        spark.read.parquet(path).filter(
            F.col("event_id") == F.lit("7" * 32)
        ).count()
        for probe_name, probe in probes:
            walls, hits = [], 0
            for _ in range(3):
                t0 = time.monotonic()
                hits = (
                    spark.read.parquet(path)
                    .filter(F.col("event_id") == probe)
                    .count()
                )
                walls.append(time.monotonic() - t0)
            print(
                f"| {name} | {probe_name} | {hits} "
                f"| {min(walls):.2f} | {sum(walls) / len(walls):.2f} |"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
