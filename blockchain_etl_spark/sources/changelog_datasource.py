"""`changelog` — a native Python DataSource (Spark 4 DataSource API) for
the ordered change-event stream.

This is the proper Structured Streaming citizen the reference's tail
loop approximates (streamer.py:113-158: poll current height → clamp by
batch size → export range → checkpoint last_synced): offsets ARE LSNs,
`latestOffset` is the chain-height probe (clamped by `max_lsns_per_batch`
— the block_batch_size pacing), `partitions` fans the LSN range out to
executor-side readers, and Spark's own checkpoint persists progress (the
last_synced file). Batch reads are supported too (`spark.read`).

The upstream fetch is pluggable at the partition reader: here it
synthesizes the deterministic event stream (`_synth_events_for_lsn`, the
same rows `fetch_lsn_range` produces) because the image has no RPC node;
a production deployment replaces ONE function with the JSON-RPC/binlog
call — partitioning, offsets, recovery and exactly-once semantics are
all already handled by this source + the engine's ledger.

Usage::

    spark.dataSource.register(ChangelogDataSource)
    df = (spark.readStream.format("changelog")
          .option("max_lsns_per_batch", 16)
          .option("tip_lsn", 128)          # chain height probe stand-in
          .load())
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from blockchain_etl_spark.cdc.schema import EVENT_SCHEMA


@dataclass
class LsnRange(InputPartition):
    start: int
    end: int
    seed: int
    events_per_lsn: int


def _rows_for_range(part: LsnRange):
    # import inside the worker: this module ships to executors via the
    # Python DataSource pickling path
    from blockchain_etl_spark.sources.changelog_source import _synth_events_for_lsn

    fields = [f.name for f in EVENT_SCHEMA.fields]
    for lsn in range(part.start, part.end):
        for ev in _synth_events_for_lsn(lsn, part.seed, part.events_per_lsn):
            yield tuple(ev[c] for c in fields)


class _Opts:
    def __init__(self, options: dict):
        self.seed = int(options.get("seed", 42))
        self.events_per_lsn = int(options.get("events_per_lsn", 8))
        # 0 = unpaced (read to the tip every batch). Pacing clamps each
        # micro-batch relative to the last planned end — use it with
        # continuous triggers; availableNow snapshots latestOffset ONCE,
        # so a paced availableNow run advances one batch per invocation.
        self.max_lsns_per_batch = int(options.get("max_lsns_per_batch", 0))
        self.tip_lsn = int(options.get("tip_lsn", 64))
        self.start_lsn = int(options.get("start_lsn", 0))
        self.n_partitions = int(options.get("n_partitions", 4))

    def split(self, lo: int, hi: int) -> list[LsnRange]:
        if hi <= lo:  # empty batch (restart probe / caught-up stream)
            return [LsnRange(lo, lo, self.seed, self.events_per_lsn)]
        n = max(1, min(self.n_partitions, hi - lo))
        per = (hi - lo + n - 1) // n
        return [
            LsnRange(s, min(s + per, hi), self.seed, self.events_per_lsn)
            for s in range(lo, hi, per)
        ]


class ChangelogStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.o = _Opts(options)

    def initialOffset(self) -> dict:
        return {"lsn": self.o.start_lsn}

    def latestOffset(self) -> dict:
        # ≙ get_current_block_number(), optionally clamped by
        # block_batch_size (streamer.py:153): never advance more than one
        # batch past the last planned/committed end, never past the tip.
        # _last is seeded from the checkpoint before this is ever called on
        # a fresh reader: traced restart sequence is partitions(committed,
        # committed) replay-probe → latestOffset → commit(end). The
        # monotone max in partitions()/commit() guarantees we never offer
        # an offset BEHIND the checkpointed frontier (which Spark would
        # plan as a regressive batch → re-reads at the next trigger).
        if self.o.max_lsns_per_batch <= 0:
            return {"lsn": self.o.tip_lsn}
        cursor = getattr(self, "_last", self.o.start_lsn)
        return {"lsn": max(cursor, min(self.o.tip_lsn, cursor + self.o.max_lsns_per_batch))}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        # on restart Spark replans the last checkpointed batch (committed →
        # an empty (end, end) probe; uncommitted → the real range) BEFORE
        # ever calling latestOffset — track the max end so pacing resumes
        # from the true frontier, monotonically
        self._last = max(getattr(self, "_last", self.o.start_lsn), end["lsn"])
        return self.o.split(start["lsn"], end["lsn"])

    def read(self, partition: LsnRange):
        return _rows_for_range(partition)

    def commit(self, end: dict) -> None:
        # Spark's checkpoint holds the offset log; mirror the committed
        # frontier into the in-memory cursor so a reader constructed after
        # restart (commit is replayed for the last batch) is never behind
        self._last = max(getattr(self, "_last", self.o.start_lsn), end["lsn"])


class ChangelogBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.o = _Opts(options)

    def partitions(self) -> list[InputPartition]:
        return self.o.split(self.o.start_lsn, self.o.tip_lsn)

    def read(self, partition: LsnRange):
        return _rows_for_range(partition)


class ChangelogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "changelog"

    def schema(self):
        return EVENT_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return ChangelogBatchReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return ChangelogStreamReader(self.options)
