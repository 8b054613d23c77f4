from .frontier import (
    FrontierConfig,
    FrontierScheduler,
    materialize_canonical_pages,
)
from .iceberg import IcebergStateStore, IcebergUnavailable, iceberg_available
from .oracle import OracleCrawler
from .state import FlatStateStore, StateStore

__all__ = [
    "FlatStateStore",
    "FrontierConfig",
    "FrontierScheduler",
    "IcebergStateStore",
    "IcebergUnavailable",
    "OracleCrawler",
    "StateStore",
    "iceberg_available",
    "materialize_canonical_pages",
]
