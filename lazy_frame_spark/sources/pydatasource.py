"""Python Data Source (Spark 4 `pyspark.sql.datasource` API): a
deterministic synthetic-corpus generator, `lfs_docgen`.

This exercises the NEWEST extension surface Spark offers — a data
source implemented entirely in Python that still participates in
planning: it reports partitions (so scans parallelize across
executors) and implements `pushFilters` (so `doc_id` range predicates
narrow the generated range BEFORE any row exists, the Python-source
analogue of parquet row-group pruning).

Generation is closed-form per doc_id — word i of document d is
``VOCAB[(7·d + i) % 8]`` and the token count is ``d % 20 + 5`` — so a
SQL oracle can rebuild every column (including the full text) without
running this code: the parity check is value-for-value, not rows-only.

A real connector (REST API, message queue, proprietary format) slots
into exactly this shape: schema() + partitions() + read(partition) +
pushFilters(); the generator stands in where this container has no
external system to call.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.datasource import DataSourceWriter

#: fixed 8-word vocabulary; word lengths deliberately differ so n_chars
#: is a nontrivial closed form
VOCAB = ["alpha", "bridge", "copper", "delta", "ember", "forge", "granite", "harbor"]
LANGS = ["en", "de", "fr"]

DOCGEN_SCHEMA = "doc_id bigint, lang string, n_tokens int, text string"


def _gen_rows(start: int, end: int):
    """THE closed-form generator — the single source of truth shared by
    the batch reader, the stream reader, and (as SQL) the parity
    oracle: word i of doc d is VOCAB[(7d+i) % 8], token count d%20+5,
    lang d%3."""
    for d in range(start, end):
        n = d % 20 + 5
        words = [VOCAB[(7 * d + i) % 8] for i in range(n)]
        yield (d, LANGS[d % 3], n, " ".join(words))


@dataclass
class _Range(InputPartition):
    start: int
    end: int


class DocGenReader(DataSourceReader):
    def __init__(self, options: dict):
        self.lo = 0
        self.hi = int(options.get("n_docs", 1000))
        self.n_parts = int(options.get("partitions", 8))

    def pushFilters(self, filters):
        """Absorb doc_id range/point predicates into [lo, hi); everything
        else flows back to Spark. Fully-pushed filters are still safe to
        re-apply, so absorbed ones are NOT yielded — the scan simply
        never generates the excluded ids."""
        for f in filters:
            attr = getattr(f, "attribute", None)
            if attr == ("doc_id",) and isinstance(
                f, (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
            ):
                v = int(f.value)
                if isinstance(f, EqualTo):
                    self.lo, self.hi = max(self.lo, v), min(self.hi, v + 1)
                elif isinstance(f, GreaterThan):
                    self.lo = max(self.lo, v + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, v)
                elif isinstance(f, LessThan):
                    self.hi = min(self.hi, v)
                else:  # LessThanOrEqual
                    self.hi = min(self.hi, v + 1)
            else:
                yield f

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        n = max(1, min(self.n_parts, hi - lo)) if hi > lo else 1
        step, rem = divmod(hi - lo, n)
        parts, start = [], lo
        for i in range(n):
            end = start + step + (1 if i < rem else 0)
            parts.append(_Range(start, end))
            start = end
        return parts

    def read(self, partition: _Range):
        return _gen_rows(partition.start, partition.end)


class DocGenDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "lfs_docgen"

    def schema(self) -> str:
        return DOCGEN_SCHEMA

    def reader(self, schema) -> DocGenReader:
        return DocGenReader(self.options)

    def simpleStreamReader(self, schema) -> "DocGenStreamReader":
        return DocGenStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> "JsonlWriter":
        return JsonlWriter(self.options, overwrite)


def register_docgen(spark) -> None:
    """Idempotent registration of the lfs_docgen format. Python-source
    filter pushdown ships behind a flag in Spark 4.1 — enable it so
    pushFilters participates in planning (without it the reader's mere
    presence of pushFilters raises at plan time)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(DocGenDataSource)


class DocGenStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch docgen stream: offsets are document positions, each
    read() emits the next ``batch_size`` docs and advances the offset —
    the Python-source shape of a Kafka-like cursor (initialOffset /
    read / readBetweenOffsets for replay / commit for cleanup). Bounded
    by ``n_docs`` so availableNow triggers terminate."""

    def __init__(self, options: dict):
        self.n_docs = int(options.get("n_docs", 100))
        self.batch_size = int(options.get("batch_size", 25))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        lo = int(start["pos"])
        hi = min(lo + self.batch_size, self.n_docs)
        # a LIST, not a generator: the engine's prefetch cache
        # copy.copy()s the returned iterator for replay
        return iter(list(_gen_rows(lo, hi))), {"pos": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(list(_gen_rows(int(start["pos"]), int(end["pos"]))))

    def commit(self, end: dict) -> None:
        pass


@dataclass
class _PartFile(WriterCommitMessage):
    path: str
    rows: int


class JsonlWriter(DataSourceWriter):
    """Two-phase-commit JSONL writer: each task streams its rows to a
    UNIQUELY-NAMED temp file and returns a commit message; only the
    driver's commit() renames the complete set into place (and abort()
    removes strays), so partial/failed task output is never visible —
    the same staging discipline every production sink (parquet included)
    follows, demonstrated at the Python-connector layer."""

    def __init__(self, options: dict, overwrite: bool):
        self.path = options["path"]
        self.overwrite = overwrite

    def write(self, iterator) -> _PartFile:
        import json
        import os
        import uuid

        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        os.makedirs(os.path.join(self.path, "_temporary"), exist_ok=True)
        tmp = os.path.join(self.path, "_temporary", f"part-{pid:05d}-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _PartFile(path=tmp, rows=n)

    def commit(self, messages) -> None:
        import os
        import shutil

        if self.overwrite:
            for name in os.listdir(self.path):
                if name.endswith(".jsonl"):
                    os.remove(os.path.join(self.path, name))
        for m in messages:
            if m is not None:
                os.replace(m.path, os.path.join(self.path, os.path.basename(m.path)))
        shutil.rmtree(os.path.join(self.path, "_temporary"), ignore_errors=True)

    def abort(self, messages) -> None:
        import shutil

        shutil.rmtree(os.path.join(self.path, "_temporary"), ignore_errors=True)
