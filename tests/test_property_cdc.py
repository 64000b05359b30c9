"""Property-based: random interleavings of I/U/D + reorg markers +
duplicate redelivery + random epoch boundaries — engine must equal the
oracle (FIXTURES.md scenarios as one generator)."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from blockchain_etl_spark.cdc.apply import CdcEngine, read_state
from blockchain_etl_spark.cdc.generator import events_to_df
from blockchain_etl_spark.cdc.oracle import oracle_replay
from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
from blockchain_etl_spark.streaming.epoch_store import EpochStore
from blockchain_etl_spark.tables.snapshot import SnapshotTable


@st.composite
def change_streams(draw):
    n_lsn = draw(st.integers(min_value=3, max_value=12))
    docs = [f"d{i}" for i in range(draw(st.integers(min_value=2, max_value=6)))]
    events = []
    pos = 0
    lsn = 0
    while lsn < n_lsn:
        # maybe a reorg marker (only after some progress)
        if lsn > 1 and draw(st.booleans()) and draw(st.integers(0, 4)) == 0:
            rb = draw(st.integers(min_value=0, max_value=lsn - 1))
            events.append(
                dict(stream_pos=pos, lsn=lsn, seq=0, op="R", doc_id=None,
                     tokens=None, n_tok=None, source=None,
                     rollback_to_lsn=rb, epoch_hash="r"))
            pos += 1
            lsn = rb + 1  # re-emit from the rollback point
        for seq in range(draw(st.integers(min_value=1, max_value=3))):
            op = draw(st.sampled_from(["I", "U", "D"]))
            if op == "D":
                toks, n = None, None
            else:
                toks = draw(st.lists(st.integers(0, 99), min_size=1, max_size=4))
                n = len(toks) + (1 if draw(st.integers(0, 9)) == 0 else 0)
            events.append(
                dict(stream_pos=pos, lsn=lsn, seq=seq, op=op,
                     doc_id=draw(st.sampled_from(docs)), tokens=toks, n_tok=n,
                     source="s", rollback_to_lsn=None, epoch_hash="h"))
            pos += 1
        lsn += 1
    # random epoch boundaries
    n_ep = draw(st.integers(min_value=1, max_value=4))
    cuts = sorted(draw(st.lists(st.integers(1, max(1, len(events) - 1)),
                                min_size=n_ep - 1, max_size=n_ep - 1)))
    epochs, prev = [], 0
    for c in cuts + [len(events)]:
        if c > prev:
            epochs.append(events[prev:c])
            prev = c
    return [e for e in epochs if e]


@pytest.mark.slow
@given(epochs=change_streams(), redeliver=st.booleans())
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_random_streams_match_oracle(spark, tmp_path_factory, epochs, redeliver):
    tmp = tmp_path_factory.mktemp("prop")
    table = SnapshotTable.create(spark, str(tmp / "t"), TARGET_SCHEMA, n_buckets=4)
    store = EpochStore(spark, str(tmp / "s"))
    eng = CdcEngine(spark, table, epoch_store=store, collect_metrics=False)
    for i, ep in enumerate(epochs):
        store.write_epoch(i, events_to_df(spark, ep))
        eng.apply_epoch(store.read_epoch(i), i)
        if redeliver:
            assert eng.apply_epoch(store.read_epoch(i), i) is None
    got = {
        r["doc_id"]: (list(r["tokens"] or []), r["n_tok"], r["lsn"], r["seq"])
        for r in read_state(table).collect()
    }
    exp = {
        k: (v["tokens"], v["n_tok"], v["lsn"], v["seq"])
        for k, v in oracle_replay([e for ep in epochs for e in ep]).items()
    }
    assert got == exp


@pytest.mark.slow
@given(epochs=change_streams(), hop_every=st.integers(min_value=1, max_value=3),
       dst_mode=st.sampled_from(["mor", "cow"]))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_cascade_replica_matches_oracle(spark, tmp_path_factory, epochs,
                                        hop_every, dst_mode):
    """Replication property: however the upstream stream interleaves
    I/U/D/reorgs/invalid payloads and WHEREVER the hop boundaries fall,
    the cascaded replica's live state equals the oracle's."""
    from blockchain_etl_spark.streaming.cascade import CascadeTailer

    tmp = tmp_path_factory.mktemp("casc")
    a = SnapshotTable.create(spark, str(tmp / "a"), TARGET_SCHEMA, n_buckets=4)
    b = SnapshotTable.create(spark, str(tmp / "b"), TARGET_SCHEMA, n_buckets=4)
    store = EpochStore(spark, str(tmp / "s"))
    ea = CdcEngine(spark, a, epoch_store=store, collect_metrics=False)
    eb = CdcEngine(spark, b, collect_metrics=False, mode=dst_mode)
    tailer = CascadeTailer(a, eb, str(tmp / "cur.json"))
    for i, ep in enumerate(epochs):
        store.write_epoch(i, events_to_df(spark, ep))
        ea.apply_epoch(store.read_epoch(i), i)
        if (i + 1) % hop_every == 0:
            tailer.run_once()
    tailer.run_once()  # final catch-up
    got = {
        r["doc_id"]: (list(r["tokens"] or []), r["n_tok"])
        for r in read_state(b).collect()
    }
    exp = {
        k: (v["tokens"], v["n_tok"])
        for k, v in oracle_replay([e for ep in epochs for e in ep]).items()
    }
    assert got == exp
