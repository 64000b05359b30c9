from blockchain_etl_spark.sources.changelog_source import fetch_lsn_range

__all__ = ["fetch_lsn_range"]
