"""Crash-safe single-directory state via write-staged-then-swap.

Small persisted state (a skew report, a sampling reservoir, trained
centroids) needs overwrite-in-place semantics with two guarantees: a
reader never sees a half-written directory, and a crash at any point
leaves the state recoverable. Parquet gives the first (a directory is
complete only once `_SUCCESS` lands); this module gives the second with
two renames and a deterministic repair:

    write df -> <path>.staged        (complete parquet, _SUCCESS marker)
    rename   <path>   -> <path>.old  (aside the previous state)
    rename   <path>.staged -> <path> (the swap)
    delete   <path>.old

A crash between the renames leaves ``path`` missing — ``recover_swapped``
repairs it forward (complete stage present) or back (aside present),
and is a no-op when ``path`` stands. All filesystem operations go
through the Hadoop FS API so state can live on local disk, HDFS, or S3A
exactly like the batch stores (`incremental/store.py`'s discipline).

This is deliberately NOT a multi-writer protocol: one owner per path
(the incremental/streaming job that maintains the state), readers repair
then read. The batch-partitioned store remains the right shape for
append-style state; swap is for state that is REPLACED each cadence.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession

logger = logging.getLogger(__name__)


def _hadoop(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), jvm, p


def swapped_exists(spark: SparkSession, path: str) -> bool:
    """True when a state directory stands at ``path``."""
    fs, _, p = _hadoop(spark, path)
    return fs.exists(p)


def _delete(spark: SparkSession, path: str) -> None:
    fs, _, p = _hadoop(spark, path)
    if fs.exists(p):
        fs.delete(p, True)


def _rename(spark: SparkSession, src: str, dst: str) -> None:
    fs, jvm, p_src = _hadoop(spark, src)
    if not fs.rename(p_src, jvm.org.apache.hadoop.fs.Path(dst)):
        # the Hadoop FS rename contract returns False instead of raising
        raise OSError(f"rename failed: {src} -> {dst}")


def _staged(path: str) -> str:
    return path.rstrip("/") + ".staged"


def _aside(path: str) -> str:
    return path.rstrip("/") + ".old"


def recover_swapped(spark: SparkSession, path: str) -> bool:
    """Repair ``path`` after a crash inside :func:`staged_overwrite`'s swap
    window; returns True when state stands at ``path`` afterwards.

    Deterministic from what survived: a COMPLETE staged directory
    (``_SUCCESS`` present) finishes the swap forward; otherwise an intact
    aside rolls back to the previous state — one cadence staler, still
    valid. With neither there is nothing to recover (fresh deployment)
    and the caller's bootstrap handles it."""
    if swapped_exists(spark, path):
        return True
    staged, aside = _staged(path), _aside(path)
    if swapped_exists(spark, f"{staged}/_SUCCESS"):
        logger.warning("swap state %s: completing interrupted swap", path)
        _rename(spark, staged, path)
        _delete(spark, aside)
        return True
    if swapped_exists(spark, aside):
        logger.warning("swap state %s: rolling back to previous state", path)
        _rename(spark, aside, path)
        _delete(spark, staged)
        return True
    return False


def staged_overwrite(df: DataFrame, path: str) -> None:
    """Replace the state at ``path`` with ``df`` (written as one parquet
    file — swap state is small by contract).

    The swap is two renames, not one atomic operation: a reader racing
    the exact window can see a missing path, and a crash inside it
    leaves no state standing — both repaired by :func:`recover_swapped`,
    which owners run before every read. What staging DOES guarantee is
    that the directory under ``path`` is always completely written."""
    spark = df.sparkSession
    staged, aside = _staged(path), _aside(path)
    _delete(spark, staged)
    df.coalesce(1).write.mode("overwrite").parquet(staged)
    _delete(spark, aside)
    if swapped_exists(spark, path):
        _rename(spark, path, aside)
    _rename(spark, staged, path)
    _delete(spark, aside)
