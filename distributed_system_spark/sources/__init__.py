from distributed_system_spark.sources.tables import (
    TABLES,
    load_table,
    register_views,
    table_path,
)
from distributed_system_spark.sources.store import DatasetStore

__all__ = [
    "TABLES",
    "load_table",
    "register_views",
    "table_path",
    "DatasetStore",
]
