"""Rule-driven side outputs — the alert/track surface (≙
blockchainetl/alert/rule_set.py:53-72 applying rules per batch and
fanning matches to receivers; track_exporter.py's filtered streams).

A rule set compiles ONCE to Catalyst predicates; a batch fans out into
one filtered DataFrame per rule (lazy — Catalyst shares the scan via
common subexpression reuse when materialized together)."""

from __future__ import annotations

from pyspark.sql import DataFrame

from blockchain_etl_spark.functions.rules import rule_filter


class RuleSet:
    def __init__(self, rules: dict[str, str]):
        self.rules = rules
        self.compiled = {name: rule_filter(text) for name, text in rules.items()}

    def side_outputs(self, df: DataFrame) -> dict[str, DataFrame]:
        """rule name → matching rows (≙ alert receivers)."""
        return {name: df.filter(pred) for name, pred in self.compiled.items()}

    def tag(self, df: DataFrame) -> DataFrame:
        """Single-pass variant: one boolean column per rule — preferred at
        scale (one scan, all rules evaluated in the same codegen stage)."""
        out = df
        for name, pred in self.compiled.items():
            out = out.withColumn(f"rule_{name}", pred)
        return out


def with_labels(
    df: DataFrame,
    labels: DataFrame,
    cols: list[str],
    key: str = "address",
    label: str = "label",
) -> DataFrame:
    """Attach ``<col>_label`` for each address column via a BROADCAST left
    join against the labels dim (≙ LabelService per-row DB lookups,
    rule_udf.py:7-18 and alert_exporter.py:149-150 from_label/to_label —
    one dim scan instead of 10^10 point queries). Rules then use
    ``label_of(col)`` which compiles to ``coalesce(col_label, '')``."""
    from pyspark.sql import functions as F

    out = df
    for c in cols:
        dim = F.broadcast(
            labels.select(
                F.col(key).alias(f"__k_{c}"), F.col(label).alias(f"{c}_label")
            )
        )
        out = out.join(dim, out[c] == dim[f"__k_{c}"], "left").drop(f"__k_{c}")
    return out


def track_frontier(
    events: DataFrame, seeds: DataFrame, hops: int, key: str = "user_id"
) -> DataFrame:
    """Iterative frontier expansion (≙ track_exporter.py:131-165: items
    joining the tracked-address table, hop+1 per round). Each hop is a
    semi-join of the event stream against the current frontier; at scale
    the frontier is broadcast while small and shuffles once it grows."""
    from pyspark.sql import functions as F

    frontier = seeds.select(F.col(key).alias("k")).distinct().withColumn("hop", F.lit(0))
    all_hits = None
    for hop in range(1, hops + 1):
        hits = events.join(
            frontier.select("k"), events[key] == F.col("k"), "left_semi"
        ).withColumn("hop", F.lit(hop))
        # next frontier: counterparties touched this hop (value flows out)
        nxt = (
            hits.select(F.col("user_id").alias("k")).distinct().withColumn("hop", F.lit(hop))
        )
        frontier = frontier.unionByName(nxt).select("k", "hop").dropDuplicates(["k"])
        all_hits = hits if all_hits is None else all_hits.unionByName(hits)
    return all_hits
