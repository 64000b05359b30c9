"""End-to-end through the spark-submit entry point (main.py) — the
production invocation path, exercised in-process."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import main as climod
from blockchain_etl_spark.cdc.generator import events_to_df, generate_changelog
from blockchain_etl_spark.cdc.oracle import oracle_replay


def test_cli_tail_compact_show(spark, tmp_path, capsys, monkeypatch):
    # route the CLI onto the test session instead of building a new one
    monkeypatch.setattr(climod, "_spark", lambda args: spark)
    epochs = generate_changelog(seed=71, n_epochs=3)
    landing = tmp_path / "landing"
    landing.mkdir()
    for i, ep in enumerate(epochs):
        events_to_df(spark, ep).coalesce(1).write.mode("overwrite").parquet(
            str(landing / f"epoch-{i:08d}.parquet")
        )
    table = str(tmp_path / "t")
    store = str(tmp_path / "s")

    assert climod.main(["init", "--table", table, "--buckets", "8"]) == 0
    assert climod.main(["tail", "--landing", str(landing), "--table", table,
                        "--store", store]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    applied = json.loads(out[-1])["applied_epochs"]
    assert applied == [0, 1, 2]

    assert climod.main(["compact", "--table", table]) == 0
    assert climod.main(["show", "--table", table, "--what", "manifest"]) == 0
    man = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert man["applied_epochs"] == [0, 1, 2]

    # final state equals the oracle
    from blockchain_etl_spark.cdc.apply import read_state
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    got = {
        r["doc_id"]: list(r["tokens"])
        for r in read_state(SnapshotTable(spark, table)).collect()
    }
    exp = {k: v["tokens"] for k, v in
           oracle_replay([e for ep in epochs for e in ep]).items()}
    assert got == exp

    # `changes` tails the table itself as a source: the diff from the
    # version after epoch 0 to HEAD must match the oracle state diff
    s0 = oracle_replay(epochs[0])
    ins = sorted(k for k in exp if k not in s0)
    dels = sorted(k for k in s0 if k not in exp)
    outdir = str(tmp_path / "ch")
    assert climod.main(["changes", "--table", table, "--from-version", "1",
                        "--out", outdir]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["counts"].get("insert", 0) == len(ins)
    assert res["counts"].get("delete", 0) == len(dels)
    ch = spark.read.parquet(outdir)
    got_ins = sorted(
        r["doc_id"] for r in ch.filter("_change_type = 'insert'").collect()
    )
    assert got_ins == ins


def test_make_pyfiles(tmp_path):
    from tools.make_pyfiles import main as mk

    out = mk()
    assert os.path.exists(out)
    import zipfile

    names = zipfile.ZipFile(out).namelist()
    assert "blockchain_etl_spark/cdc/apply.py" in names
    assert "blockchain_etl_spark/tables/snapshot.py" in names


def test_cli_cascade(spark, tmp_path, capsys, monkeypatch):
    monkeypatch.setattr(climod, "_spark", lambda args: spark)
    epochs = generate_changelog(seed=72, n_epochs=2)
    landing = tmp_path / "landing"
    landing.mkdir()
    for i, ep in enumerate(epochs):
        events_to_df(spark, ep).coalesce(1).write.mode("overwrite").parquet(
            str(landing / f"epoch-{i:08d}.parquet")
        )
    table = str(tmp_path / "t")
    assert climod.main(["init", "--table", table, "--buckets", "8"]) == 0
    assert climod.main(["tail", "--landing", str(landing), "--table", table,
                        "--store", str(tmp_path / "s")]) == 0
    capsys.readouterr()

    replica = str(tmp_path / "r")
    cursor = str(tmp_path / "cur.json")
    assert climod.main(["cascade", "--src-table", table, "--dst-table", replica,
                        "--cursor", cursor, "--buckets", "8"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["metrics"] is not None
    # replica live state == source live state
    from blockchain_etl_spark.cdc.apply import read_state
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    src = {r["doc_id"]: list(r["tokens"])
           for r in read_state(SnapshotTable(spark, table)).collect()}
    dst = {r["doc_id"]: list(r["tokens"])
           for r in read_state(SnapshotTable(spark, replica)).collect()}
    assert src == dst
    # caught up → no-op
    assert climod.main(["cascade", "--src-table", table, "--dst-table", replica,
                        "--cursor", cursor]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["metrics"] is None


def test_cli_round5_verbs(spark, tmp_path, capsys, monkeypatch):
    """The continuation-wave verbs end to end through main():
    backfill (watermark pinned, redelivery no-op), clone → publish
    (WAP), gc, and show --at-lsn time travel."""
    from blockchain_etl_spark.cdc.schema import EVENT_SCHEMA

    monkeypatch.setattr(climod, "_spark", lambda args: spark)
    epochs = generate_changelog(seed=77, n_epochs=2, p_reorg_epoch=0.0)
    landing = tmp_path / "landing"
    landing.mkdir()
    for i, ep in enumerate(epochs):
        shifted = [
            {**e, "lsn": e["lsn"] + 100, "stream_pos": e["stream_pos"] + 100}
            for e in ep
        ]
        events_to_df(spark, shifted).coalesce(1).write.mode("overwrite").parquet(
            str(landing / f"epoch-{i:08d}.parquet")
        )
    table = str(tmp_path / "t")

    def _out():
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    assert climod.main(["init", "--table", table, "--buckets", "4"]) == 0
    assert climod.main(["tail", "--landing", str(landing), "--table", table,
                        "--store", str(tmp_path / "s")]) == 0
    capsys.readouterr()

    # --- backfill: low-lsn history, watermark pinned, redelivery no-op
    old = spark.createDataFrame(
        [(0, 5, 0, "I", "bf-key", [1, 2], 2, "srcH", None, "h1")], EVENT_SCHEMA
    )
    old.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "old.parquet"))
    assert climod.main(["backfill", "--events", str(tmp_path / "old.parquet"),
                        "--table", table, "--epoch-id", "9001"]) == 0
    first = _out()
    assert first["backfilled"] is True
    wm = first["watermark"]
    assert climod.main(["backfill", "--events", str(tmp_path / "old.parquet"),
                        "--table", table, "--epoch-id", "9001"]) == 0
    again = _out()
    assert again["backfilled"] is False and again["watermark"] == wm

    # --- WAP: clone, stage a merge, publish
    stage = str(tmp_path / "stage")
    assert climod.main(["clone", "--table", table, "--dst", stage]) == 0
    capsys.readouterr()
    src = spark.createDataFrame(
        [("wap-key", [3], 1, "staged")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    src.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "src.parquet"))
    assert climod.main(["merge", "--table", stage,
                        "--source", str(tmp_path / "src.parquet")]) == 0
    capsys.readouterr()
    assert climod.main(["publish", "--table", table, "--stage", stage]) == 0
    pub = _out()
    assert pub["published"] is True

    from blockchain_etl_spark.cdc.apply import read_state
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    keys = {r["doc_id"] for r in read_state(SnapshotTable(spark, table)).collect()}
    assert {"bf-key", "wap-key"} <= keys

    # --- time travel: a bound below the live stream excludes it
    assert climod.main(["show", "--table", table, "--what", "manifest",
                        "--at-lsn", "99"]) == 0
    man = _out()
    assert man["watermark"]["lsn"] <= 99

    # --- gc keeps the head working
    assert climod.main(["gc", "--table", table,
                        "--keep-last-versions", "2"]) == 0
    out = _out()
    assert out["manifests_removed"] >= 1
    assert {r["doc_id"] for r in
            read_state(SnapshotTable(spark, table)).collect()} == keys


def test_cli_easy_etl(spark, tmp_path, capsys, monkeypatch):
    """The convenience wrapper: one command from landing dir to exported
    files, equal to the oracle replay; csv flattens arrays."""
    monkeypatch.setattr(climod, "_spark", lambda args: spark)
    epochs = generate_changelog(seed=73, n_epochs=3)
    landing = tmp_path / "landing"
    landing.mkdir()
    for i, ep in enumerate(epochs):
        events_to_df(spark, ep).coalesce(1).write.mode("overwrite").parquet(
            str(landing / f"epoch-{i:08d}.parquet")
        )
    table = str(tmp_path / "docs")
    out = str(tmp_path / "dump")

    assert climod.main([
        "easy-etl", "--landing", str(landing), "--table", table,
        "--store", str(tmp_path / "s"), "--out", out, "--buckets", "8",
    ]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["created"] is True
    assert res["applied_epochs"] == [0, 1, 2]

    exp = {k: v["tokens"] for k, v in
           oracle_replay([e for ep in epochs for e in ep]).items()}
    got = {
        r["doc_id"]: list(r["tokens"])
        for r in spark.read.parquet(res["out"]).collect()
    }
    assert got == exp and res["rows"] == len(exp)

    # re-run is idempotent (ledger skips applied epochs) + csv leg
    out2 = str(tmp_path / "dump2")
    assert climod.main([
        "easy-etl", "--landing", str(landing), "--table", table,
        "--store", str(tmp_path / "s"), "--out", out2, "--format", "csv",
        "--entity", "documents",
    ]) == 0
    res2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res2["created"] is False and res2["applied_epochs"] == []
    assert res2["rows"] == len(exp)
    csv = spark.read.option("header", True).csv(res2["out"])
    assert res2["out"].endswith("entity=documents")
    got_csv = {r["doc_id"]: r["tokens"] for r in csv.collect()}
    exp_csv = {k: (",".join(str(t) for t in v) if v else None)
               for k, v in exp.items()}
    assert got_csv == exp_csv
