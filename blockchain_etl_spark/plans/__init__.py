from blockchain_etl_spark.plans.inspect import (
    physical_plan,
    has_broadcast_join,
    pushed_filters,
    wholestage_codegen_spans,
)

__all__ = [
    "physical_plan",
    "has_broadcast_join",
    "pushed_filters",
    "wholestage_codegen_spans",
]
