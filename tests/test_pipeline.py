"""Multi-entity dependency-DAG pipeline: pruning, convergence with the
oracle across reorgs, column pruning inside a hop, and incremental
group recompute."""

import pytest

from blockchain_etl_spark.cdc.apply import CdcEngine
from blockchain_etl_spark.cdc.generator import events_to_df, generate_changelog
from blockchain_etl_spark.cdc.oracle import oracle_replay
from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
from blockchain_etl_spark.streaming.pipeline import (
    LONG_DOC_MIN_TOK,
    REGISTRY,
    EntityDef,
    EntityPipeline,
    required_entities,
    source_stats_events,
)
from blockchain_etl_spark.tables.snapshot import SnapshotTable


def test_required_entities_prunes_unrequested_branches():
    # the reference's _should_export rule: requested + transitive deps only
    assert required_entities(["source_stats"]) == ["doc_stats", "source_stats"]
    assert required_entities(["long_docs"]) == ["long_docs"]
    assert required_entities(["long_docs", "source_stats"]) == [
        "long_docs", "doc_stats", "source_stats",
    ]
    with pytest.raises(ValueError, match="unknown entity"):
        required_entities(["nope"])


def test_unrequested_entity_is_never_computed(spark, tmp_path):
    """DAG pruning is Python-level: an entity outside the requested
    closure gets no table, no tailer, and its transform never runs."""
    calls = []

    def booby_trap(changes, src, v0, v1):
        calls.append((v0, v1))
        raise AssertionError("pruned branch was computed")

    registry = dict(REGISTRY)
    registry["trap"] = EntityDef(
        "trap", "docs", booby_trap, REGISTRY["doc_stats"].schema
    )
    root = SnapshotTable.create(
        spark, str(tmp_path / "docs"), TARGET_SCHEMA, n_buckets=4
    )
    eng = CdcEngine(spark, root, collect_metrics=False)
    epochs = generate_changelog(seed=5, n_epochs=2, p_reorg_epoch=0.0)
    for i, ep in enumerate(epochs):
        eng.apply_epoch(events_to_df(spark, ep), epoch_id=i)

    pipe = EntityPipeline(
        spark, root, str(tmp_path), ["source_stats"], registry=registry
    )
    pipe.run_once()
    assert calls == []
    assert "trap" not in pipe.tables
    assert not (tmp_path / "trap").exists()


def _oracle_state(epochs):
    return oracle_replay([e for ep in epochs for e in ep])


def test_pipeline_converges_with_oracle_across_reorgs(spark, tmp_path):
    epochs = generate_changelog(seed=17, n_epochs=4, p_reorg_epoch=0.5)
    root = SnapshotTable.create(
        spark, str(tmp_path / "docs"), TARGET_SCHEMA, n_buckets=8
    )
    eng = CdcEngine(spark, root, collect_metrics=False)
    pipe = EntityPipeline(
        spark, root, str(tmp_path), ["source_stats", "long_docs"]
    )
    for i, ep in enumerate(epochs):
        eng.apply_epoch(events_to_df(spark, ep), epoch_id=i)
        pipe.run_once()  # hop after EVERY commit: the incremental path

    want = _oracle_state(epochs)

    got_stats = {
        r["doc_id"]: (r["n_tok"], r["source"])
        for r in pipe.state("doc_stats").collect()
    }
    assert got_stats == {
        k: (v["n_tok"], v["source"]) for k, v in want.items()
    }

    got_long = {
        r["doc_id"]: (list(r["tokens"]), r["n_tok"])
        for r in pipe.state("long_docs").collect()
    }
    assert got_long == {
        k: (v["tokens"], v["n_tok"])
        for k, v in want.items()
        if v["n_tok"] >= LONG_DOC_MIN_TOK
    }

    got_src = {
        r["doc_id"]: (r["n_docs"], r["total_tokens"])
        for r in pipe.state("source_stats").collect()
    }
    want_src: dict[str, list[int]] = {}
    for v in want.values():
        agg = want_src.setdefault(v["source"], [0, 0])
        agg[0] += 1
        agg[1] += v["n_tok"]
    assert got_src == {k: tuple(v) for k, v in want_src.items()}

    # idempotent: a hop with nothing new is a no-op at every level
    assert all(m is None for m in pipe.run_once().values())


def test_source_stats_hop_prunes_columns_and_groups(spark, tmp_path):
    """Inside the aggregate hop, Catalyst prunes what the derivation
    doesn't reference: the doc_stats scan must not read tok_fp. And the
    recompute is group-incremental: a commit touching one source yields
    events for that source only."""
    root = SnapshotTable.create(
        spark, str(tmp_path / "docs"), TARGET_SCHEMA, n_buckets=4
    )
    eng = CdcEngine(spark, root, collect_metrics=False)
    ev = [
        dict(stream_pos=i, lsn=i, seq=0, op="I", doc_id=f"d{i}", tokens=[i] * 3,
             n_tok=3, source=f"s{i % 3}", rollback_to_lsn=None, epoch_hash="e0")
        for i in range(1, 10)
    ]
    eng.apply_epoch(events_to_df(spark, ev), epoch_id=0)
    pipe = EntityPipeline(spark, root, str(tmp_path), ["source_stats"])
    pipe.run_once()

    # second commit touches ONE source
    eng.apply_epoch(
        events_to_df(spark, [
            dict(stream_pos=100, lsn=100, seq=0, op="U", doc_id="d1",
                 tokens=[7] * 5, n_tok=5, source="s1",
                 rollback_to_lsn=None, epoch_hash="e1"),
        ]),
        epoch_id=1,
    )
    ds = pipe.tables["doc_stats"]
    v0 = ds.current_version()
    pipe.tailers["doc_stats"].run_once()
    v1 = ds.current_version()

    hop_events = source_stats_events(ds.read_changes(v0, v1), ds, v0, v1)
    rows = hop_events.collect()
    assert {r["doc_id"] for r in rows} == {"s1"}  # only the touched group
    # the snapshot-side scan reads WITHOUT tok_fp: the projection below
    # the MOR resolver (read_state columns=...) restores column pruning
    # that max(struct(...)) otherwise blocks. (The change-DIFF branch by
    # contrast must read every column — change detection compares all.)
    import re

    from blockchain_etl_spark.cdc.apply import read_state

    plan = (
        read_state(ds, columns=["n_tok", "source"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    schemas = re.findall(r"ReadSchema: (\S+)", plan)
    assert schemas, plan
    assert all("tok_fp" not in s for s in schemas), schemas

    pipe.tailers["source_stats"].run_once()
    got = {
        r["doc_id"]: (r["n_docs"], r["total_tokens"])
        for r in pipe.state("source_stats").collect()
    }
    assert got == {"s0": (3, 9), "s1": (3, 11), "s2": (3, 9)}
