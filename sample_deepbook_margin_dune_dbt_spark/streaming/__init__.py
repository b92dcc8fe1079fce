from .funnel import streaming_funnel
from .incremental import merge_stream
from .dedup import stream_decontaminate, stream_dedup_ingest
from .export import stream_shard_export
from .ingest import stream_jsonl_ingest
from .media import stream_media_dedup
from .windows import stream_tumbling_agg

__all__ = ["merge_stream", "stream_jsonl_ingest", "stream_dedup_ingest", "stream_decontaminate", "stream_shard_export", "stream_media_dedup", "stream_tumbling_agg"]
