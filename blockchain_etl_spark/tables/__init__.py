from blockchain_etl_spark.tables.snapshot import SnapshotTable

__all__ = ["SnapshotTable"]
