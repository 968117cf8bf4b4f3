"""Python UDTF surface (Spark 3.5+): table-valued functions for shapes where
one input row yields many typed output rows and built-in generators
(explode/posexplode/stack) can't express the row logic.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, chunk string, n_tokens int")
class ChunkDocument:
    """Split a document into ≤``max_tokens``-token chunks — the chunking
    stage of an embedding/RAG pipeline as a UDTF: one doc row in, one row
    per chunk out, with per-chunk metadata."""

    def eval(self, text: str, max_tokens: int = 32):
        if text is None:
            return
        words = text.split(" ")
        for i in range(0, len(words), max_tokens):
            chunk = words[i : i + max_tokens]
            yield i // max_tokens, " ".join(chunk), len(chunk)
