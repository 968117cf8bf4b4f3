"""Streaming maintenance of the CDC join view
(`incremental/joinview_cdc.py`) over a MULTIPLEXED change stream — one
channel carrying BOTH sides and BOTH op kinds, each row tagged with
``side`` ("left"/"right") and ``op`` ("upsert"/"delete"): exactly the
shape a Debezium-style changefeed fans into one topic, now including
the delete/update records the insert-only rung
(`streaming/joinview_job.py`) cannot express.

foreachBatch for the same three reasons as the insert-only rung (the
view must be a standing parquet table, survive the query, and match an
unbounded-history join exactly), plus one CDC-specific mapping: the
micro-batch id is ZERO-PADDED into the store's batch id ("10" sorts
before "9" as a bare string, and the CDC store orders op history
lexicographically — `update_join_view_cdc` would rightly reject bare
ints at batch 10). Replay discipline is the family's: restart from the
SAME checkpoint; compaction between runs must exclude
`~..incremental.store.checkpoint_replayable_ids` (padded the same way).

ORDERING PRECONDITION (CDC-specific): the channel must deliver changes
in commit order — a single Kafka partition, or file sources with
strictly increasing modification times (Spark's file source orders by
mtime in MILLISECONDS; a fast writer that ties several files leaves the
tie-break undefined). The insert-only rung tolerates reordering because
appends commute; CDC ops do not — a delete observed before its row's
re-insert is a no-op tombstone and the stale version survives. The
drill pins one order via explicit mtimes.
"""

from __future__ import annotations

import logging
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..incremental.joinview import JoinViewSpec
from ..incremental.joinview_cdc import (
    compact_join_view_cdc,
    update_join_view_cdc,
)

logger = logging.getLogger(__name__)

_PAD = 12


def pad_batch_id(batch_id: int) -> str:
    """Micro-batch int → lexicographically monotone store batch id."""
    return f"{int(batch_id):0{_PAD}d}"


def start_cdc_join_view_stream(
    changes_stream: DataFrame,
    root: str,
    checkpoint_dir: str,
    spec: JoinViewSpec,
    *,
    side_col: str = "side",
    op_col: str = "op",
    left_cols: Sequence[str],
    right_cols: Sequence[str],
    compact_every: int | None = None,
    available_now: bool = True,
):
    """Maintain the CDC view from a (side, op)-tagged change stream;
    returns the started query.

    Upsert rows carry the side's full columns; delete rows need only
    the ``(key, id)`` pair populated (the old row image every real CDC
    feed ships — extra columns are ignored). Unknown or NULL tags in
    EITHER column fail the batch loudly: a typo'd op silently dropped
    would silently freeze its row forever. ``compact_every=N`` folds
    the stores semantically every N micro-batches, current batch
    excluded."""
    left_cols = list(left_cols)
    right_cols = list(right_cols)

    def one_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.localCheckpoint(eager=True)
        # ONE driver round-trip answers both questions — is every tag in
        # the domain, and which of the four legs are non-empty — instead
        # of a stray-probe collect plus a limit(1) probe per leg (five
        # fixed jobs per micro-batch, dominating small-batch wall time).
        # NULL tags surface as None keys here and fail the domain check.
        tags = {
            (r[0], r[1]): r[2]
            for r in batch_df.groupBy(side_col, op_col).count().collect()
        }
        bad = [
            t
            for t in tags
            if t[0] not in ("left", "right")
            or t[1] not in ("upsert", "delete")
        ]
        if bad:
            raise ValueError(
                f"change row with unknown tags {side_col}={bad[0][0]!r} / "
                f"{op_col}={bad[0][1]!r}; expected side in (left, right), "
                "op in (upsert, delete)"
            )

        def leg(side: str, op: str, cols: list[str]) -> DataFrame | None:
            if not tags.get((side, op)):
                return None
            rows = batch_df.filter(
                (F.col(side_col) == side) & (F.col(op_col) == op)
            )
            if op == "delete":
                id_col = spec.left_id if side == "left" else spec.right_id
                sel = [spec.key] if spec.key == id_col else [spec.key, id_col]
                return rows.select(*sel)
            return rows.select(*cols)

        bid = pad_batch_id(batch_id)
        counts = update_join_view_cdc(
            spark,
            root,
            bid,
            spec,
            left_upserts=leg("left", "upsert", left_cols),
            left_deletes=leg("left", "delete", left_cols),
            right_upserts=leg("right", "upsert", right_cols),
            right_deletes=leg("right", "delete", right_cols),
        )
        logger.info("cdc join view: batch %s %s", bid, counts)
        if compact_every and (batch_id + 1) % compact_every == 0:
            folded = compact_join_view_cdc(
                spark, root, spec, exclude=(bid,)
            )
            logger.info(
                "cdc join view: folded %s after batch %s", folded, bid
            )

    writer = (
        changes_stream.writeStream.foreachBatch(one_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
