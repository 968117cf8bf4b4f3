"""Streaming pipeline demo: file-source events (Kafka stand-in) →
dedup-within-watermark → session windows → parquet sink, drained twice with
the same checkpoint to show incremental resume.

Run:  python examples/streaming_pipeline.py
"""

from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.session import get_spark
from dataworks_audit_data_ingest_spark.streaming import (
    dedup_events_within_watermark,
    stream_events_json,
)
from dataworks_audit_data_ingest_spark.tables import table


def _write_events(spark, path: Path, name: str, lo_day: int, hi_day: int) -> int:
    rows = (
        table(spark, "/root/testdata/sf0.001", "events")
        .filter(F.dayofmonth("ts").between(lo_day, hi_day))
        .collect()
    )
    with open(path / name, "w") as f:
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
    return len(rows)


def main() -> None:
    spark = get_spark("streaming-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    work = Path(tempfile.mkdtemp())
    src = work / "arrivals"
    src.mkdir()
    out, ckpt = str(work / "sessions"), str(work / "ckpt")

    def drain():
        # dedup sets the watermark; the downstream session agg reuses it
        # (chained stateful operators must not redefine the watermark)
        stream = dedup_events_within_watermark(stream_events_json(spark, str(src)))
        sessions = (
            stream.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                "user_id",
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "n_events",
            )
        )
        q = (
            sessions
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return q

    n1 = _write_events(spark, src, "day01-05.json", 1, 5)
    q = drain()
    print(f"[tick 1] drained {n1} events in "
          f"{len(q.recentProgress)} micro-batch(es)")

    n2 = _write_events(spark, src, "day06-10.json", 6, 10)
    q = drain()
    sessions = spark.read.parquet(out)
    print(f"[tick 2] drained {n2} more events; "
          f"{sessions.count()} finalized sessions for "
          f"{sessions.select('user_id').distinct().count()} users")
    stats = sessions.agg(
        F.max("n_events").alias("max_len"),
        F.expr("CAST(AVG(n_events) AS DECIMAL(10,2))").alias("avg_len"),
    ).first()
    print(f"[done ] longest session {stats.max_len} events, mean {stats.avg_len}")
    assert sessions.count() > 0


if __name__ == "__main__":
    main()
