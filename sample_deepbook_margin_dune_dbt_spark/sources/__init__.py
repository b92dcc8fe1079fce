from .catalog import SourceCatalog, testdata_sources

__all__ = ["SourceCatalog", "testdata_sources"]
