from blockchain_etl_spark.cdc.schema import (
    EVENT_SCHEMA,
    TARGET_SCHEMA,
    METRICS_SCHEMA,
)

__all__ = ["EVENT_SCHEMA", "TARGET_SCHEMA", "METRICS_SCHEMA"]
