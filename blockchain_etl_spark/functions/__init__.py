from blockchain_etl_spark.functions import ids, text, vectors  # noqa: F401
