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


def test_doc_chunks_one_to_many_with_shrink(spark, tmp_path):
    """The 1:N derived entity reconciles fan-out changes: an update that
    SHRINKS a document must delete its surplus chunks downstream."""
    from blockchain_etl_spark.streaming.pipeline import CHUNK_WIDTH

    root = SnapshotTable.create(
        spark, str(tmp_path / "docs"), TARGET_SCHEMA, n_buckets=4
    )
    eng = CdcEngine(spark, root, collect_metrics=False)
    pipe = EntityPipeline(spark, root, str(tmp_path), ["doc_chunks"])

    long_toks = list(range(3 * CHUNK_WIDTH + 2))  # 4 chunks
    eng.apply_epoch(events_to_df(spark, [
        dict(stream_pos=1, lsn=1, seq=0, op="I", doc_id="x", tokens=long_toks,
             n_tok=len(long_toks), source="s", rollback_to_lsn=None,
             epoch_hash="e1"),
        dict(stream_pos=2, lsn=1, seq=1, op="I", doc_id="y", tokens=[1, 2],
             n_tok=2, source="s", rollback_to_lsn=None, epoch_hash="e2"),
    ]), epoch_id=0)
    pipe.run_once()

    def chunks():
        return {
            r["doc_id"]: (r["parent_id"], r["chunk_id"],
                          list(r["chunk_tokens"]), r["n_chunk_tok"])
            for r in pipe.state("doc_chunks").collect()
        }

    got = chunks()
    assert len(got) == 5  # 4 for x + 1 for y
    assert got["x#0003"] == ("x", 3, long_toks[3 * CHUNK_WIDTH:], 2)
    assert got["y#0000"] == ("y", 0, [1, 2], 2)

    # shrink x to ONE chunk; y untouched
    eng.apply_epoch(events_to_df(spark, [
        dict(stream_pos=10, lsn=5, seq=0, op="U", doc_id="x", tokens=[7, 8, 9],
             n_tok=3, source="s", rollback_to_lsn=None, epoch_hash="e3"),
    ]), epoch_id=1)
    pipe.run_once()
    got = chunks()
    assert set(got) == {"x#0000", "y#0000"}
    assert got["x#0000"] == ("x", 0, [7, 8, 9], 3)

    # delete x entirely → only y's chunk remains; idempotent rerun
    eng.apply_epoch(events_to_df(spark, [
        dict(stream_pos=20, lsn=9, seq=0, op="D", doc_id="x", tokens=None,
             n_tok=None, source=None, rollback_to_lsn=None, epoch_hash="e4"),
    ]), epoch_id=2)
    pipe.run_once()
    assert set(chunks()) == {"y#0000"}
    assert all(m is None for m in pipe.run_once().values())


def test_doc_chunks_converges_across_reorgs(spark, tmp_path):
    from blockchain_etl_spark.streaming.pipeline import CHUNK_WIDTH

    from blockchain_etl_spark.streaming.epoch_store import EpochStore

    epochs = generate_changelog(seed=23, n_epochs=3, p_reorg_epoch=0.5)
    root = SnapshotTable.create(
        spark, str(tmp_path / "docs"), TARGET_SCHEMA, n_buckets=8
    )
    store = EpochStore(spark, str(tmp_path / "store"))
    eng = CdcEngine(spark, root, epoch_store=store, collect_metrics=False)
    pipe = EntityPipeline(spark, root, str(tmp_path), ["doc_chunks"])
    for i, ep in enumerate(epochs):
        store.write_epoch(i, events_to_df(spark, ep))
        eng.apply_epoch(store.read_epoch(i), i)
        pipe.run_once()

    want = {}
    for doc_id, row in _oracle_state(epochs).items():
        toks = row["tokens"]
        for ci in range(0, (len(toks) + CHUNK_WIDTH - 1) // CHUNK_WIDTH):
            want[f"{doc_id}#{ci:04d}"] = toks[ci * CHUNK_WIDTH:(ci + 1) * CHUNK_WIDTH]
    got = {r["doc_id"]: list(r["chunk_tokens"])
           for r in pipe.state("doc_chunks").collect()}
    assert got == want


def test_doc_history_is_append_only_across_reorgs(spark, tmp_path):
    """The audit entity only ever grows: every hop's net changes land as
    immutable rows keyed (entity, observed version); an upstream reorg
    appends corrective rows under new versions instead of rewriting."""
    from blockchain_etl_spark.streaming.epoch_store import EpochStore

    epochs = generate_changelog(seed=31, n_epochs=3, p_reorg_epoch=0.5)
    root = SnapshotTable.create(
        spark, str(tmp_path / "docs"), TARGET_SCHEMA, n_buckets=8
    )
    store = EpochStore(spark, str(tmp_path / "store"))
    eng = CdcEngine(spark, root, epoch_store=store, collect_metrics=False)
    pipe = EntityPipeline(spark, root, str(tmp_path), ["doc_history"])

    sizes = []
    for i, ep in enumerate(epochs):
        store.write_epoch(i, events_to_df(spark, ep))
        eng.apply_epoch(store.read_epoch(i), i)
        pipe.run_once()
        sizes.append(pipe.state("doc_history").count())
    assert sizes == sorted(sizes)  # monotone growth, never a rewrite

    hist = pipe.state("doc_history").collect()
    # unique immutable keys; latest observed row per entity mirrors the
    # oracle's final state (delete rows close entities that ended dead)
    assert len({r["doc_id"] for r in hist}) == len(hist)
    latest = {}
    for r in sorted(hist, key=lambda r: (r["entity_id"], r["observed_version"])):
        latest[r["entity_id"]] = r
    want = _oracle_state(epochs)
    live = {k: r for k, r in latest.items() if r["change_type"] != "delete"}
    assert {k: r["n_tok"] for k, r in live.items()} == {
        k: v["n_tok"] for k, v in want.items()
    }
    # idempotent when caught up
    assert all(m is None for m in pipe.run_once().values())


def test_band_index_tracks_updates_and_deletes(spark, tmp_path):
    """The incremental LSH band index stays equal to a batch recompute
    of the live corpus: updates re-derive only that doc's band rows
    (bucket values change in place), deletes drop them."""
    from blockchain_etl_spark.streaming.pipeline import MH_BANDS, _band_rows

    root = SnapshotTable.create(
        spark, str(tmp_path / "docs"), TARGET_SCHEMA, n_buckets=4
    )
    eng = CdcEngine(spark, root, collect_metrics=False)
    pipe = EntityPipeline(spark, root, str(tmp_path), ["band_index"])

    eng.apply_epoch(events_to_df(spark, [
        dict(stream_pos=1, lsn=1, seq=0, op="I", doc_id="x",
             tokens=[5, 9, 9, 130], n_tok=4, source="s",
             rollback_to_lsn=None, epoch_hash="e1"),
        dict(stream_pos=2, lsn=1, seq=1, op="I", doc_id="y", tokens=[1, 2],
             n_tok=2, source="s", rollback_to_lsn=None, epoch_hash="e2"),
    ]), epoch_id=0)
    pipe.run_once()

    def bands():
        return {
            r["doc_id"]: (r["parent_id"], r["band"], r["bucket"])
            for r in pipe.state("band_index").collect()
        }

    got = bands()
    assert set(got) == {f"{d}#b{b}" for d in "xy" for b in range(MH_BANDS)}

    def batch(doc_tokens):
        df = spark.createDataFrame(
            list(doc_tokens.items()), "doc_id string, tokens array<int>"
        )
        return {
            r["key"]: (r["parent_id"], r["band"], r["bucket"])
            for r in _band_rows(df).collect()
        }

    assert got == batch({"x": [5, 9, 9, 130], "y": [1, 2]})

    # update x's tokens → its 4 band rows re-derive; y's are untouched
    eng.apply_epoch(events_to_df(spark, [
        dict(stream_pos=10, lsn=5, seq=0, op="U", doc_id="x", tokens=[7, 8],
             n_tok=2, source="s", rollback_to_lsn=None, epoch_hash="e3"),
    ]), epoch_id=1)
    pipe.run_once()
    got = bands()
    assert got == batch({"x": [7, 8], "y": [1, 2]})

    # the index answers the probe join: x and a new identical doc share
    # all bands through a plain (band, bucket) equi-join
    eng.apply_epoch(events_to_df(spark, [
        dict(stream_pos=20, lsn=9, seq=0, op="D", doc_id="y", tokens=None,
             n_tok=None, source=None, rollback_to_lsn=None, epoch_hash="e4"),
    ]), epoch_id=2)
    pipe.run_once()
    assert set(bands()) == {f"x#b{b}" for b in range(MH_BANDS)}
    assert all(m is None for m in pipe.run_once().values())


def test_consistent_snapshot_pins_whole_dag(spark, tmp_path):
    """Cross-entity consistent read: barriers exist exactly at the
    source versions where every hop in the closure committed; pinned
    states reproduce what state() showed AT that moment, immune to
    later commits; interior versions of a batched hop are not
    barriers."""
    from blockchain_etl_spark.streaming.pipeline import ROOT

    root = SnapshotTable.create(
        spark, str(tmp_path / "docs"), TARGET_SCHEMA, n_buckets=4
    )
    eng = CdcEngine(spark, root, collect_metrics=False)
    epochs = generate_changelog(seed=11, n_epochs=3, p_reorg_epoch=0.0)
    pipe = EntityPipeline(
        spark, root, str(tmp_path), ["source_stats", "long_docs"]
    )

    # epoch 0 → hop; epochs 1+2 → ONE batched hop (interior version
    # of the root is then un-pinnable, by design)
    eng.apply_epoch(events_to_df(spark, epochs[0]), epoch_id=0)
    pipe.run_once()
    v_first = root.current_version()
    mid_stats = {
        (r["doc_id"], r["n_docs"], r["total_tokens"])
        for r in pipe.state("source_stats").collect()
    }
    eng.apply_epoch(events_to_df(spark, epochs[1]), epoch_id=1)
    v_interior = root.current_version()
    eng.apply_epoch(events_to_df(spark, epochs[2]), epoch_id=2)
    pipe.run_once()
    v_last = root.current_version()

    barriers = pipe.consistent_barriers()
    assert set(barriers) == {v_first, v_last}
    assert v_interior not in barriers

    # pin at the first barrier: every entity reads as of THAT moment
    pins = pipe.snapshot(at_src_version=v_first)
    assert pins[ROOT] == v_first
    pinned_stats = {
        (r["doc_id"], r["n_docs"], r["total_tokens"])
        for r in pipe.state_at("source_stats", pins).collect()
    }
    assert pinned_stats == mid_stats
    # the pinned source state matches an engine re-read at that version
    assert (
        pipe.state_at(ROOT, pins).count()
        == root.read(version=v_first).filter("NOT deleted").select("doc_id")
        .distinct().count()
    )
    # and the DEFAULT snapshot is the newest barrier
    assert pipe.snapshot()[ROOT] == v_last
    # interior version → floors down to the previous barrier
    assert pipe.snapshot(at_src_version=v_interior)[ROOT] == v_first
    with pytest.raises(LookupError):
        pipe.snapshot(at_src_version=v_first - 1)
