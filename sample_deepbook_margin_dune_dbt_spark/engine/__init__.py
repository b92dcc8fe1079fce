from .session import get_spark
from .model import model, snapshot, ModelConfig, ModelContext, get_model, all_models, clear_registry, enforce_contract
from .materialize import TableStore
from .runner import Runner
from .snapshots import snapshot_scd2

__all__ = [
    "snapshot_scd2",
    "snapshot",
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
