"""Multimodal (image/audio/video) column plumbing.

Model: media is an opaque ``binary`` column plus a typed metadata struct —
exactly the file-as-record shape of the reference (a blob the pipeline never
parses, `audit_data_ingest.py:118-120`) lifted into a DataFrame column.

Decode / feature-extraction runs as Arrow-batched ``mapInPandas`` so the
per-record Python cost is amortized over whole record batches, and each task
holds one decoder instance. The real decoders (PIL/ffmpeg/torchaudio) are not
in this container, so ``decode_media_batches`` ships with:

- ``mode="fake"`` (default): a deterministic stand-in that derives metadata
  from the bytes themselves — keeps the Spark-side plumbing (schema,
  partitioning, UDF signature, batch shape) fully real and testable;
- ``mode="real"``: the wiring point that raises ``NotImplementedError`` with
  the dependency it needs.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, "
    "width int, height int, n_frames int, checksum string"
)


def with_media_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach a binary payload column (UTF-8 bytes of the text stand in for
    the media blob) plus source metadata."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def fake_decode_record(payload: bytes) -> dict:
    """Deterministic fake decode: metadata derived arithmetically from the
    payload bytes (first/second byte → dimensions, length → frame count).
    Matches the SQL oracle in queries/multimodal_shaped.py expression for
    expression."""
    n = len(payload)
    return {
        "n_bytes": n,
        "width": (payload[0] if n > 0 else 0) + 1,
        "height": (payload[1] if n > 1 else 0) + 1,
        "n_frames": n % 7,
    }


def real_decode_record(payload: bytes) -> dict:
    """PIL-backed image decode: true dimensions, format, frame count
    (animated formats expose n_frames; stills are 1 frame)."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(payload)) as img:
        return {
            "media_type": (img.format or "image").lower(),
            "n_bytes": len(payload),
            "width": img.width,
            "height": img.height,
            "n_frames": int(getattr(img, "n_frames", 1)),
        }


def _require_pillow_for(mode: str) -> None:
    """Fail fast on the driver; executors re-import inside the kernel."""
    if mode != "real":
        return
    try:
        import PIL  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "real media decode needs Pillow (images; audio/video would "
            "add ffmpeg/torchaudio), not present in this environment — "
            "install Pillow or use mode='fake'"
        ) from exc


def _decode_payloads(payloads: list, mode: str) -> tuple[list, list]:
    """The ONE decode kernel (types, metas) both Arrow boundaries call —
    a change here (checksum, audio decode, frame fallback) reaches the
    mapInPandas, mapInArrow, and grouped-reassembly paths identically."""
    if mode == "real":
        metas = [real_decode_record(bytes(p)) for p in payloads]
        types = [m["media_type"] for m in metas]
    else:
        metas = [fake_decode_record(bytes(p)) for p in payloads]
        types = ["image"] * len(payloads)
    return types, metas


def decode_media_batches(
    df: DataFrame, mode: str = "fake", passthrough: tuple[str, ...] = ()
) -> DataFrame:
    """Decode/feature-extract media payloads via Arrow-batched mapInPandas.

    At 100 TB: one decoder per task, batches sized by
    ``spark.sql.execution.arrow.maxRecordsPerBatch``; CPU-heavy decode scales
    with executors and never funnels through the driver.

    ``passthrough`` names metadata columns of ``df`` to carry through the
    kernel unchanged (guide §4: the alternative — re-joining the decode
    output back to the source on doc_id — pays a second scan plus a join
    exchange just to re-attach columns the batch already had in hand).
    Only list cheap metadata columns: everything named here crosses the
    Arrow boundary with the payload.
    """
    _require_pillow_for(mode)
    by_name = {f.name: f for f in df.schema.fields}
    missing = [c for c in passthrough if c not in by_name]
    if missing:
        raise ValueError(f"passthrough columns not in the frame: {missing}")
    schema = MEDIA_SCHEMA + "".join(
        f", {c} {by_name[c].dataType.simpleString()}" for c in passthrough
    )

    def decode(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            types, metas = _decode_payloads(list(pdf["payload"]), mode)
            cols = {
                "doc_id": pdf["doc_id"],
                "media_type": types,
                "n_bytes": [m["n_bytes"] for m in metas],
                "width": [m["width"] for m in metas],
                "height": [m["height"] for m in metas],
                "n_frames": [m["n_frames"] for m in metas],
                "checksum": [
                    hashlib.md5(bytes(p)).hexdigest() for p in pdf["payload"]
                ],
            }
            for c in passthrough:
                cols[c] = pdf[c]
            yield pd.DataFrame(cols)

    return df.select("doc_id", "payload", *passthrough).mapInPandas(
        decode, schema=schema
    )


def decode_media_batches_arrow(df: DataFrame, mode: str = "fake") -> DataFrame:
    """`decode_media_batches` on the cheapest Python boundary Spark has:
    ``mapInArrow`` hands the UDF raw ``pyarrow.RecordBatch``es, skipping
    the Arrow→pandas block conversion ``mapInPandas`` pays in BOTH
    directions per batch. For decode-style kernels the per-record work is
    Python either way — what the arrow path saves is the conversion of
    the (large, opaque) binary payload column into pandas objects and the
    re-assembly of the result frame. Output is row-identical to the
    pandas path (drill-pinned) and shares q70's oracle expressions.

    At 100 TB the guidance is tiered: built-in functions ≫ mapInArrow ≫
    mapInPandas ≫ row-at-a-time UDFs; decode must leave the JVM, so it
    takes the cheapest boundary that fits."""
    _require_pillow_for(mode)

    def decode(batches: Iterator) -> Iterator:
        import hashlib

        import pyarrow as pa

        for rb in batches:
            doc_ids = rb.column(rb.schema.get_field_index("doc_id"))
            payloads = rb.column(
                rb.schema.get_field_index("payload")
            ).to_pylist()
            types, metas = _decode_payloads(payloads, mode)
            yield pa.RecordBatch.from_arrays(
                [
                    doc_ids,
                    pa.array(types, pa.string()),
                    pa.array([m["n_bytes"] for m in metas], pa.int64()),
                    pa.array([m["width"] for m in metas], pa.int32()),
                    pa.array([m["height"] for m in metas], pa.int32()),
                    pa.array([m["n_frames"] for m in metas], pa.int32()),
                    pa.array(
                        [hashlib.md5(p).hexdigest() for p in payloads],
                        pa.string(),
                    ),
                ],
                names=[
                    "doc_id",
                    "media_type",
                    "n_bytes",
                    "width",
                    "height",
                    "n_frames",
                    "checksum",
                ],
            )

    return df.select("doc_id", "payload").mapInArrow(
        decode, schema=MEDIA_SCHEMA
    )


def sample_frames(media: DataFrame, every_k: int = 2) -> DataFrame:
    """Frame sampling for video-shaped media: explode each record's frame
    indices, keeping every k-th frame — pure built-ins (SEQUENCE + FILTER),
    so sampling adds no Python cost on top of decode. One output row per
    sampled frame, ready for a per-frame feature extractor."""
    return media.filter(F.col("n_frames") > 0).select(
        "doc_id",
        "n_frames",
        F.explode(
            F.filter(
                F.sequence(F.lit(0), F.col("n_frames") - 1),
                lambda i: i % every_k == 0,
            )
        ).alias("frame_idx"),
    )


def resize_media(df: DataFrame, max_width: int = 224, max_height: int = 224) -> DataFrame:
    """Resize planning: computes clamped target dimensions per record (the
    arithmetic half of a resize — the pixel transform belongs in the real
    decoder, see decode_media_batches(mode="real"))."""
    scale = F.least(
        F.lit(1.0),
        F.least(
            F.lit(max_width) / F.col("width"), F.lit(max_height) / F.col("height")
        ),
    )
    return df.withColumn("target_width", F.floor(F.col("width") * scale).cast("int")) \
             .withColumn("target_height", F.floor(F.col("height") * scale).cast("int"))


def extract_pixels(
    df: DataFrame, n_pixels: int = 64, id_col: str = "doc_id"
) -> DataFrame:
    """(id, pixels: array<int>) — the fake decoder's luminance plane: the
    payload byte stream nearest-neighbor-resampled to ``n_pixels`` values
    (pixel j = byte at ``(j·n) div n_pixels``). Arrow-batched mapInPandas
    like `decode_media_batches`; a real build swaps the byte resample for
    PIL's ``convert("L").resize(...)`` — same shape, same schema, so the
    downstream perceptual-hash algebra is decode-backend-agnostic."""
    import pandas as pd

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            ids, px = [], []
            for i, p in zip(pdf[id_col], pdf["payload"]):
                b = bytes(p)
                n = len(b)
                px.append(
                    [b[(j * n) // n_pixels] if n else 0 for j in range(n_pixels)]
                )
                ids.append(i)
            yield pd.DataFrame({id_col: ids, "pixels": px})

    return df.select(id_col, "payload").mapInPandas(
        gen, schema=f"{id_col} long, pixels array<int>"
    )


def average_hash_bands(
    pixels: DataFrame, n_pixels: int = 64, n_bands: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """(id, band, bval) — the aHash signature split into LSH bands, all
    JVM expressions over the pixel array.

    aHash (the classic perceptual average hash): bit j = pixel j above
    the image mean. The threshold comparison is kept integer-exact —
    ``n_pixels·p_j >= Σp`` instead of ``p_j >= mean`` — so the signature
    is bit-identical on any engine. Bits pack little-endian into
    ``n_bands`` equal slices; a pair of re-encodes agreeing on ≥1 band
    becomes a candidate (the simhash/minhash banding discipline from
    queries/dedup.py applied to media)."""
    bits_per = n_pixels // n_bands
    sum_p = (
        "AGGREGATE(pixels, CAST(0 AS BIGINT), (acc, v) -> acc + CAST(v AS BIGINT))"
    )
    band_val = (
        f"TRANSFORM(SEQUENCE(0, {n_bands - 1}), b -> "
        + "("
        + " + ".join(
            f"CASE WHEN CAST({n_pixels} AS BIGINT) * pixels[b * {bits_per} + {r}] "
            f">= _sump THEN CAST({1 << r} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
            for r in range(bits_per)
        )
        + "))"
    )
    return (
        pixels.withColumn("_sump", F.expr(sum_p))
        .withColumn("_bands", F.expr(band_val))
        .select(id_col, F.posexplode("_bands").alias("band", "bval"))
    )


def phash_near_duplicates(
    pixels: DataFrame,
    max_hamming: int = 6,
    n_pixels: int = 64,
    n_bands: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_a, id_b, hamming) — perceptual near-duplicate pairs: candidates
    share ≥1 aHash band (pigeonhole: any pair within
    ``n_bands - 1`` banded bit-flips collides somewhere), verified by the
    exact Hamming distance summed band-wise (``bit_count(a XOR b)`` per
    band — no 64-bit sign games). The verify join carries only
    (id, band, bval) triples; pixel arrays never cross the wire twice."""
    bands = average_hash_bands(pixels, n_pixels, n_bands, id_col)
    a = bands.select(
        F.col(id_col).alias("id_a"), "band", F.col("bval").alias("bval_a")
    )
    b = bands.select(
        F.col(id_col).alias("id_b"), "band", F.col("bval").alias("bval_b")
    )
    cand = (
        a.join(b, (a.band == b.band) & (a.bval_a == b.bval_b))
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sig_a = bands.groupBy(id_col).agg(
        F.array_sort(F.collect_list(F.struct("band", "bval"))).alias("_sig")
    )
    ham = (
        "AGGREGATE(ZIP_WITH(_siga, _sigb, (x, y) -> "
        "BIT_COUNT(CAST(x.bval AS BIGINT) ^ CAST(y.bval AS BIGINT))), "
        "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )
    return (
        cand.join(
            sig_a.select(F.col(id_col).alias("id_a"), F.col("_sig").alias("_siga")),
            "id_a",
        )
        .join(
            sig_a.select(F.col(id_col).alias("id_b"), F.col("_sig").alias("_sigb")),
            "id_b",
        )
        .withColumn("hamming", F.expr(ham))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", F.col("hamming").cast("bigint").alias("hamming"))
    )


def reassemble_chunked_media(
    df: DataFrame,
    id_col: str = "doc_id",
    idx_col: str = "part_idx",
    payload_col: str = "part",
) -> DataFrame:
    """Reassemble media blobs stored as CHUNK ROWS (the only way a
    multi-GB object fits a row-based table: one row per part, ordered by
    ``part_idx``) and decode each rebuilt payload — Spark 4
    ``applyInArrow``: the group's raw RecordBatches arrive as one
    pyarrow Table, bytes are concatenated in part order, and one
    metadata row per object comes back. Grouped-by-key is the right
    boundary here because the kernel NEEDS the whole group (unlike the
    row-local decode, which takes mapInArrow).

    Scale shape: one hash shuffle on the object id — inherent to
    reassembly (the parts must meet somewhere); group width is bounded
    by parts-per-object, so no group outgrows an executor. Output equals
    `decode_media_batches` over the un-chunked payloads (drill-pinned).
    """

    def rebuild(table):
        import hashlib

        import pyarrow as pa

        idx = table.column(idx_col).to_pylist()
        parts = table.column(payload_col).to_pylist()
        doc = table.column(id_col)[0].as_py()
        payload = b"".join(p for _, p in sorted(zip(idx, parts)))
        m = fake_decode_record(payload)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array([doc], pa.int64()),
                "media_type": pa.array(["image"], pa.string()),
                "n_bytes": pa.array([m["n_bytes"]], pa.int64()),
                "width": pa.array([m["width"]], pa.int32()),
                "height": pa.array([m["height"]], pa.int32()),
                "n_frames": pa.array([m["n_frames"]], pa.int32()),
                "checksum": pa.array(
                    [hashlib.md5(payload).hexdigest()], pa.string()
                ),
            }
        )

    return (
        df.select(
            F.col(id_col).cast("long").alias(id_col), idx_col, payload_col
        )
        .groupBy(id_col)
        .applyInArrow(rebuild, schema=MEDIA_SCHEMA)
    )
