from .incremental import merge_stream

__all__ = ["merge_stream"]
