from .incremental import merge_stream
from .ingest import stream_jsonl_ingest

__all__ = ["merge_stream", "stream_jsonl_ingest"]
