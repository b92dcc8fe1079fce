from .session import get_spark
from .model import model, ModelConfig, ModelContext, get_model, all_models, clear_registry
from .materialize import TableStore
from .runner import Runner

__all__ = [
    "get_spark",
    "model",
    "ModelConfig",
    "ModelContext",
    "get_model",
    "all_models",
    "clear_registry",
    "TableStore",
    "Runner",
]
