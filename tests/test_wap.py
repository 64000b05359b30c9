"""Write-audit-publish: commits staged on a hardlink clone become
visible in the source table only through one atomic publish — readers
never see unaudited data, a concurrent advance fails the publish, and
the staged epoch ledger keeps exactly-once across the adoption."""

import pytest

from blockchain_etl_spark.cdc.apply import CdcEngine, read_state
from blockchain_etl_spark.cdc.generator import events_to_df, generate_changelog
from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
from blockchain_etl_spark.tables.snapshot import (
    CommitConflictError,
    SnapshotTable,
)


def _mk(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=4)
    eng = CdcEngine(spark, t, mode="mor", collect_metrics=False)
    epochs = generate_changelog(seed=13, n_epochs=3, p_reorg_epoch=0.0)
    eng.apply_epoch(events_to_df(spark, epochs[0]), 0)
    return t, eng, epochs


def test_publish_adopts_staged_commits_atomically(spark, tmp_path):
    t, eng, epochs = _mk(spark, tmp_path)
    before = {r["doc_id"] for r in read_state(t).collect()}
    base_v = t.current_version()

    stage = t.clone_at(str(tmp_path / "stage"))
    s_eng = CdcEngine(spark, stage, mode="mor", collect_metrics=False)
    s_eng.apply_epoch(events_to_df(spark, epochs[1]), 1)
    s_eng.apply_epoch(events_to_df(spark, epochs[2]), 2)
    stage.compact()
    staged = {r["doc_id"] for r in read_state(stage).collect()}

    # unaudited commits invisible in the source
    assert {r["doc_id"] for r in read_state(t).collect()} == before

    v = t.publish_from(stage)
    assert v == base_v + 1  # one squashed commit
    assert {r["doc_id"] for r in read_state(t).collect()} == staged
    # ledger rode along: redelivering a staged epoch is a no-op
    assert eng.apply_epoch(events_to_df(spark, epochs[1]), 1) is None
    # re-publishing the same stage head is a no-op at the same version
    assert t.publish_from(stage) == v
    # CDF across the publish is the net staged diff
    kinds = {
        r["_change_type"] for r in t.read_changes(base_v, v).collect()
    }
    assert kinds <= {"insert", "update_preimage", "update_postimage", "delete"}


def test_publish_refuses_after_source_advanced(spark, tmp_path):
    t, eng, epochs = _mk(spark, tmp_path)
    stage = t.clone_at(str(tmp_path / "stage"))
    s_eng = CdcEngine(spark, stage, mode="mor", collect_metrics=False)
    s_eng.apply_epoch(events_to_df(spark, epochs[1]), 1)
    # the source moves on while the audit runs → the audit is stale
    eng.apply_epoch(events_to_df(spark, epochs[2]), 2)
    with pytest.raises(CommitConflictError, match="advanced"):
        t.publish_from(stage)


def test_publish_rejects_foreign_stage_and_empty_stage(spark, tmp_path):
    t, _eng, _epochs = _mk(spark, tmp_path)
    other = SnapshotTable.create(
        spark, str(tmp_path / "other"), TARGET_SCHEMA, n_buckets=4
    )
    with pytest.raises(ValueError, match="not cloned from"):
        t.publish_from(other)
    # a stage with nothing committed publishes as a no-op
    stage = t.clone_at(str(tmp_path / "stage"))
    assert t.publish_from(stage) == t.current_version()


def test_publish_race_one_winner(spark, tmp_path):
    """Two stages forked from the same base racing to publish: exactly
    one wins; the loser gets CommitConflictError (its audit no longer
    covers current state) and the table holds exactly the winner's
    rows."""
    import threading

    t, _eng, epochs = _mk(spark, tmp_path)
    base_v = t.current_version()
    stages = []
    for i, ep in enumerate((epochs[1], epochs[2])):
        s = t.clone_at(str(tmp_path / f"stage{i}"))
        CdcEngine(spark, s, mode="mor", collect_metrics=False).apply_epoch(
            events_to_df(spark, ep), 10 + i
        )
        stages.append(s)

    results: dict[int, object] = {}
    barrier = threading.Barrier(2)

    def worker(i):
        barrier.wait()
        try:
            results[i] = t.publish_from(stages[i])
        except (CommitConflictError, ValueError) as e:  # noqa: PERF203
            results[i] = e

    threads = [threading.Thread(target=worker, args=(i,)) for i in (0, 1)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()

    winners = [i for i, r in results.items() if isinstance(r, int)]
    losers = [i for i, r in results.items() if isinstance(r, CommitConflictError)]
    assert len(winners) == 1 and len(losers) == 1
    assert t.current_version() == base_v + 1
    win_state = {r["doc_id"] for r in read_state(stages[winners[0]]).collect()}
    assert {r["doc_id"] for r in read_state(t).collect()} == win_state
