"""Similarity-search API."""

from .ivfpq import encode_ivfpq, ivfpq_knn, train_ivfpq  # noqa: F401
from .knn import cosine_expr, knn_join, mutual_knn  # noqa: F401
from .mmr import knn_mmr, mmr_rerank  # noqa: F401
from .opq import encode_opq, opq_knn, train_opq  # noqa: F401
from .pq import encode_pq, pq_knn, train_pq  # noqa: F401
from .quantize import dequantize, quantize_int8, quantized_knn  # noqa: F401
