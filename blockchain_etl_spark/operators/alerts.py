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
    events: DataFrame,
    seeds: DataFrame,
    hops: int,
    key: str = "user_id",
    dst_col: str | None = None,
    stop=None,
) -> DataFrame:
    """Iterative frontier expansion over the value-flow graph
    (≙ track_exporter.py:110-165: items whose ``from_address`` is
    tracked become tracked items; their ``to_address`` joins the
    tracked set at hop+1; the stop oracle's addresses are recorded but
    never expanded — shold_stop).

    ``events`` is the edge stream (``key`` = source, ``dst_col`` =
    counterparty; defaults to ``key`` for degenerate self-graphs).
    ``stop`` is an optional Column predicate over the address marking
    stop-oracle hits. Returns the reached set — (address, hop, stopped)
    with BFS-minimal hop, deterministic.

    Scale: each hop is one hash semi/anti join of the edge stream
    against the frontier — the frontier starts broadcast-small and the
    optimizer switches join strategy as it grows; only NEW addresses
    expand (the anti join against the seen set), so a hop's work is
    O(edges touching the new frontier), never O(all walks) the way a
    naive path-enumerating recursion is. For deep traversals persist or
    checkpoint the frontier per hop to truncate lineage; the tracked
    use case is hops ≤ 5."""
    from pyspark.sql import functions as F

    dst_col = dst_col or key

    def stopped(col: str):
        return stop(F.col(col)) if stop is not None else F.lit(False)

    seen = (
        seeds.select(F.col(key).alias("address"))
        .distinct()
        .select("address", F.lit(0).alias("hop"), stopped("address").alias("stopped"))
    )
    frontier = seen
    # localCheckpoint: every hop semi-joins this edge list, and hops are
    # SEQUENTIAL (hop k+1 depends on hop k), so without materialization
    # the upstream edge derivation (scan + counterparty extraction)
    # re-executes once per hop with no concurrency to hide it. The
    # checkpointed frame is two long columns — tiny next to the plan
    # that produces it.
    edges = (
        events.filter(F.col(key) != F.col(dst_col))
        .select(F.col(key).alias("__src"), F.col(dst_col).alias("__dst"))
        .localCheckpoint(eager=True)
    )
    for hop in range(1, hops + 1):
        reached = (
            edges.join(
                frontier.filter(~F.col("stopped")).select(
                    F.col("address").alias("__src")
                ),
                "__src",
                "left_semi",
            )
            .select(F.col("__dst").alias("address"))
            .distinct()
        )
        # checkpoint the (tiny) per-hop frontier: it feeds the next
        # hop's semi join, the anti-join seen set AND the result union —
        # left lazy, each reference re-executes every prior hop's joins
        # (the re-execution count compounds with depth)
        frontier = (
            reached.join(seen.select("address"), "address", "left_anti")
            .select(
                "address", F.lit(hop).alias("hop"),
                stopped("address").alias("stopped"),
            )
            .localCheckpoint(eager=True)
        )
        seen = seen.unionByName(frontier)
    return seen
