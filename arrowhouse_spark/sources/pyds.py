"""Custom Python DataSource (Spark 4.x DataSource V2 Python API) — the
Spark-native analog of the reference's custom block input streams
(OneBlockInputStream / BlocksListBlockInputStream and the SSA program's
applyFilters late materialization, /root/reference DataStreams/ +
SsaProgram.cpp:615-678): a source that PLANS its own partitions and
consumes predicate pushdown at the source boundary, registered by name
so `spark.read.format("synth_events")` works like any built-in.

The source generates a deterministic synthetic event log (the battery
generator's shape) as a pure function of event_id via splitmix64 — every
partition, every retry, every engine replica produces bit-identical rows,
so results are oracle-checkable and task retries are safe by construction.

Scale notes: `partitions()` splits the id range into fixed-size shards
(one InputPartition per shard — Spark schedules them like parquet splits);
`pushFilters` consumes >=/</==/IsNotNull predicates on ``event_id`` by
SHRINKING the planned id range, so a filtered scan generates only the
surviving shards instead of filtering post-hoc (the applyFilters
contract). Everything else is declared unsupported and stays a Spark-side
Filter — exactly how parquet residual filters behave.

A SimpleDataSourceStreamReader exposes the same rows as an unbounded
micro-batch stream (offset = next unread event_id), making the source
usable under readStream for the streaming operators' tests.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

_SCHEMA = (
    "event_id long, user_id long, event_type string, value double"
)
_TYPES = ("view", "click", "purchase", "signup", "error")
_MASK = (1 << 64) - 1


def _splitmix64(x: int) -> int:
    # public-domain splitmix64 (Steele/Lea/Flood) — deterministic,
    # engine-independent integer mix
    x = (x + 0x9E3779B97F4A7C15) & _MASK
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _MASK
    return x ^ (x >> 31)


def _row(i: int, n_users: int):
    h = _splitmix64(i)
    return (
        i,
        h % n_users,
        _TYPES[(h >> 17) % 5],
        ((h >> 23) % 100000) / 100.0,
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int, n_users: int):
        self.start, self.end, self.n_users = start, end, n_users


class _SynthEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_users = max(1, int(options.get("n_users", 100)))
        self.shard_rows = max(1, int(options.get("shard_rows", 250)))
        self.lo, self.hi = 0, self.n_rows  # [lo, hi) after pushdown

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        # consume range/equality predicates on event_id by shrinking the
        # planned id range; everything else stays a Spark-side residual
        for f in filters:
            attr = getattr(f, "attribute", ())
            col = attr[0] if len(attr) == 1 else None
            if col != "event_id":
                yield f
            elif isinstance(f, GreaterThanOrEqual):
                self.lo = max(self.lo, int(f.value))
            elif isinstance(f, GreaterThan):
                self.lo = max(self.lo, int(f.value) + 1)
            elif isinstance(f, LessThan):
                self.hi = min(self.hi, int(f.value))
            elif isinstance(f, LessThanOrEqual):
                self.hi = min(self.hi, int(f.value) + 1)
            elif isinstance(f, EqualTo):
                v = int(f.value)
                self.lo, self.hi = max(self.lo, v), min(self.hi, v + 1)
            elif isinstance(f, IsNotNull):
                pass  # generated ids are never null — consumed for free
            else:
                yield f

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        return [
            _RangePartition(s, min(s + self.shard_rows, hi), self.n_users)
            for s in range(lo, hi, self.shard_rows)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield _row(i, partition.n_users)


class _SynthEventsStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_users = max(1, int(options.get("n_users", 100)))
        self.batch_rows = max(1, int(options.get("batch_rows", 100)))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = int(start["next"])
        hi = min(lo + self.batch_rows, self.n_rows)
        rows = iter([_row(i, self.n_users) for i in range(lo, hi)])
        return rows, {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            _row(i, self.n_users)
            for i in range(int(start["next"]), int(end["next"]))
        )


class SynthEventsDataSource(DataSource):
    """``spark.read.format("synth_events")`` after `register_synth_events`.

    Options: n_rows (default 1000), n_users (100), shard_rows (250 —
    batch partition size), batch_rows (100 — streaming micro-batch size).
    """

    @classmethod
    def name(cls) -> str:
        return "synth_events"

    def schema(self) -> str | StructType:
        return _SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _SynthEventsReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _SynthEventsStreamReader(self.options)


def register_synth_events(spark) -> None:
    """Idempotent registration of the synth_events format on a session."""
    spark.dataSource.register(SynthEventsDataSource)
