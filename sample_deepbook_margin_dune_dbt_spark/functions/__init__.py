from .json import json_extract_scalar, json_extract, try_cast_scalar
from . import text

__all__ = ["json_extract_scalar", "json_extract", "try_cast_scalar", "text"]
