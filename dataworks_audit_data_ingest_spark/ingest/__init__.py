"""Reference-parity ingest pipeline: binaryFile scan → date-watermark filter →
zlib compress → AES-128-EAX envelope encrypt → S3 sink with per-object
metadata (rebuild of `/root/reference/audit_data_ingest.py`, Spark-first).
"""

from .crypto import EnvelopeEncryptor, eax_decrypt, eax_encrypt  # noqa: F401
from .pipeline import IngestConfig, run_ingest  # noqa: F401
from .rotate import rotate_envelope_keys  # noqa: F401
from .watermark import find_start_date, update_progress_file  # noqa: F401
