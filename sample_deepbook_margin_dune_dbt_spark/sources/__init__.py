from .catalog import SourceCatalog, testdata_sources
from .files import (
    quarantine,
    quarantine_scope,
    read_csv,
    read_jsonl,
    write_jsonl,
    write_training_shards,
)

__all__ = [
    "SourceCatalog",
    "testdata_sources",
    "quarantine",
    "quarantine_scope",
    "read_csv",
    "read_jsonl",
    "write_jsonl",
    "write_training_shards",
]
