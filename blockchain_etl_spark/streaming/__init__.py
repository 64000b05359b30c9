from blockchain_etl_spark.streaming.epoch_store import EpochStore
from blockchain_etl_spark.streaming.tail import ChangeLogTailer

__all__ = ["EpochStore", "ChangeLogTailer"]
