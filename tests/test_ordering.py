"""Two-phase global ordering: the distributed rank must equal the
single-partition ground truth, and the plan must not contain an
unpartitioned window over the DATA (only over the per-range offsets
frame, which has one row per range)."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from blockchain_etl_spark.operators.ordering import (
    curriculum_order,
    global_order_rank,
    global_shuffle,
)


@pytest.fixture()
def docs(spark):
    return spark.range(0, 997).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7 * 100).alias("n_chars"),
    )


def test_global_rank_matches_ground_truth(docs):
    got = global_order_rank(docs, ["doc_id"], n_parts=5).select("doc_id", "pos")
    rows = {r.doc_id: r.pos for r in got.collect()}
    assert rows == {i: i for i in range(997)}


def test_global_shuffle_is_permutation_and_deterministic(docs):
    a = global_shuffle(docs, n_parts=4).select("doc_id", "pos")
    pa = {r.doc_id: r.pos for r in a.collect()}
    assert sorted(pa.values()) == list(range(997))
    # rerun-stable
    pb = {r.doc_id: r.pos for r in global_shuffle(docs, n_parts=7).select("doc_id", "pos").collect()}
    assert pa == pb
    # matches the naive single-task window
    w = Window.orderBy(F.md5(F.concat(F.lit("gshuf"), F.col("doc_id").cast("string"))), "doc_id")
    truth = {
        r.doc_id: r.pos
        for r in docs.select("doc_id", (F.row_number().over(w) - 1).alias("pos")).collect()
    }
    assert pa == truth
    # a different salt is a different permutation
    pc = {r.doc_id: r.pos for r in global_shuffle(docs, salt="other", n_parts=4).collect()}
    assert pc != pa and sorted(pc.values()) == list(range(997))


def test_curriculum_stages_are_contiguous(docs):
    stage = F.when(F.col("n_chars") < 200, 0).when(F.col("n_chars") < 400, 1).otherwise(2)
    out = curriculum_order(docs, stage, n_parts=4).select("doc_id", "stage", "pos")
    rows = sorted(((r.pos, r.stage) for r in out.collect()))
    assert [p for p, _ in rows] == list(range(997))
    stages = [s for _, s in rows]
    assert stages == sorted(stages)  # stage blocks are contiguous in pos


def test_no_single_task_window_over_data(docs):
    plan = global_shuffle(docs, n_parts=4)._jdf.queryExecution().executedPlan().toString()
    # every Window node must be keyed; the only acceptable global sort
    # is the range partitioner's sampling exchange
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "_rid" in line, line
