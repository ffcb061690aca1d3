"""IndexWriter exchange point — the pluggable sink that terminates the
indexing lifecycle.

Reference: indexer/IndexWriters.java (the coordinator fans every
document/delete out to EVERY registered writer: open → write/update/
delete per doc → commit → close) and the shipped
indexer-dummy plugin (DummyIndexWriter.java: a text file of
``add\\t<id>`` / ``delete\\t<key>`` lines, deletes only when the
indexer runs with deletions enabled; ``commit`` appends a literal
``commit`` line).

Spark-first shape: the unit of exchange is the **actions DataFrame**
(`operators/index.py index_actions` — one row per add/delete with the
document columns), not a per-row callback. A writer consumes the whole
DataFrame; the coordinator materializes the action stream ONCE and
fans it out, so N writers cost one computation + N sinks — the same
economy IndexWriters.java gets from calling each writer inside one
reduce pass. Real backends (solr/elastic) are out of scope in this
sandbox; the two shipped writers are the reference's dummy (line
format byte-compatible) and a columnar parquet writer, which is what a
100-TB deployment would point a downstream indexer at.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .index import ACTION_ADD, ACTION_DELETE


class IndexWriter:
    """Extension point (indexer/IndexWriter.java). Implementations
    consume the actions DataFrame; `commit` finalizes the sink."""

    def write_actions(self, actions: DataFrame) -> None:
        raise NotImplementedError

    def commit(self) -> None:  # optional
        pass

    def close(self) -> None:  # optional
        pass


@dataclass
class DummyIndexWriter(IndexWriter):
    """indexer-dummy (DummyIndexWriter.java): a deterministic text
    dump, one ``<action>\\t<key>`` line per document. ``delete`` lines
    appear only when deletions are enabled (open() reads
    INDEXER_DELETE, :43-47); ``commit()`` appends ``commit``
    (:66-68). Lines are sorted by (action, key) for determinism —
    the reference's order is reduce-arrival order, which Spark does
    not guarantee."""

    path: str
    delete: bool = False
    _lines: list = field(default_factory=list)

    def write_actions(self, actions: DataFrame) -> None:
        acts = actions.select("url", "action")
        if not self.delete:
            acts = acts.filter(F.col("action") != ACTION_DELETE)
        word = (
            F.when(F.col("action") == ACTION_ADD, F.lit("add"))
            .when(F.col("action") == ACTION_DELETE, F.lit("delete"))
            .otherwise(F.lit("update"))
        )
        rows = (
            acts.select(
                word.alias("w"), "url"
            )
            .orderBy("w", "url")
            .collect()
        )
        self._lines.extend(f"{r['w']}\t{r['url']}" for r in rows)

    def commit(self) -> None:
        self._lines.append("commit")

    def close(self) -> None:
        with open(self.path, "w") as f:
            for ln in self._lines:
                f.write(ln + "\n")


@dataclass
class ParquetIndexWriter(IndexWriter):
    """Columnar sink: the full document columns for adds, keys for
    deletes, appended per segment — the shape a downstream search
    indexer bulk-loads from at scale (partition-parallel write, no
    driver materialization)."""

    path: str

    def write_actions(self, actions: DataFrame) -> None:
        actions.write.mode("append").parquet(self.path)


class IndexWriters:
    """IndexWriters.java: fan one action stream out to every writer.

    The stream is localCheckpoint'ed once so N writers share a single
    computation of the (join-heavy) indexing plan."""

    def __init__(self, writers: list):
        self.writers = list(writers)

    def write(self, actions: DataFrame) -> None:
        if len(self.writers) > 1:
            actions = actions.localCheckpoint()
        for w in self.writers:
            w.write_actions(actions)

    def commit(self) -> None:
        for w in self.writers:
            w.commit()

    def close(self) -> None:
        for w in self.writers:
            w.close()


def write_index(
    actions: DataFrame, writers: list, commit: bool = True
) -> None:
    """One indexing round: write → commit → close (the coordinator's
    full lifecycle, IndexWriters.java:55-105)."""
    ws = IndexWriters(writers)
    ws.write(actions)
    if commit:
        ws.commit()
    ws.close()
