"""Streaming micro-batch ingest: the reference's consumer main loop
(src/kafka/mod.rs:159-253) re-expressed over a source of changeset
micro-batches.

The reference pulls messages one at a time into an ordered buffer and
flushes when ``len >= max_buffer_size`` or ``elapsed >= max_wait_secs``
(src/kafka/mod.rs:182-190), committing source offsets only AFTER the
table commit (the exactly-once anchor, src/kafka/mod.rs:187-231). Here
the unit is a micro-batch (a pyarrow Table or Dataset of
CHANGESET_SCHEMA rows) and the flush is a MERGE:

- buffer micro-batches until the row/time trigger fires;
- flush = ``merge(table, buffered, app_id)`` — dedup, validation,
  deletion vectors, watermark advance all happen inside the merge;
- the txn-ledger watermark IS the committed offset: a crash between
  source-ack and table-commit replays micro-batches, and the replay
  filter absorbs them (idempotence test below), so the source needs
  only at-least-once delivery.

Unlike the reference, dedup state is durable (the ledger), not scoped
to one flush window (src/pipeline/mod.rs:82-89 drains it) — replays
are no-ops across restarts, not just within a window.
"""

from __future__ import annotations

import time
from collections.abc import Iterable

import pyarrow as pa

from ..state.lineage import RunContext
from ..tablefmt.catalog import Table

DEFAULT_MAX_BUFFER_ROWS = 10_000  # reference default (src/kafka/mod.rs:142)
DEFAULT_MAX_WAIT_SECS = 360.0     # reference default (src/kafka/mod.rs:141)
# backpressure: the reference bounds in-flight work by rows AND by
# being single-threaded (src/kafka/mod.rs:182-190); with arbitrary
# payload columns a row bound alone lets a few huge media rows pin the
# driver heap, so buffered BYTES also trigger a flush
DEFAULT_MAX_BUFFER_BYTES = 256 << 20


def interleave_sources(*sources: Iterable) -> Iterable:
    """Round-robin merge of N micro-batch sources into one stream —
    the reference's multi-topic subscription (one consumer subscribed
    to N topics, src/kafka/mod.rs:113-157) re-expressed for iterables.
    Per-partition watermarks already isolate the sources' seq domains,
    so correctness needs only that each source uses its own
    partition_id space."""
    its = [iter(s) for s in sources]
    while its:
        alive = []
        for it in its:
            try:
                yield next(it)
            except StopIteration:
                continue
            alive.append(it)
        its = alive


def stream_ingest(table: Table, source: Iterable,
                  app_id: str,
                  max_buffer_rows: int = DEFAULT_MAX_BUFFER_ROWS,
                  max_wait_secs: float = DEFAULT_MAX_WAIT_SECS,
                  max_buffer_bytes: int = DEFAULT_MAX_BUFFER_BYTES,
                  run_id: str | None = None,
                  merge_kwargs: dict | None = None,
                  sources: list | None = None) -> dict:
    """Consume an iterable of changeset micro-batches (pyarrow Tables)
    and merge them under the size/time/bytes flush policy. Returns
    counters (micro_batches, flushes, rows_in, committed_versions,
    max_backlog_rows).

    Backpressure: flushes are SYNCHRONOUS (a merge must commit before
    the next micro-batch is buffered — the reference's single-threaded
    consumer loop), and the buffer is bounded three ways (rows, wall
    time, bytes), so pending work can never outrun commit drain. Each
    flush logs a ``backlog`` gauge event (rows staged at flush) — the
    offset-lag instrument's stream-side observation.

    ``sources``: a list of micro-batch iterables to consume instead of
    ``source`` (multi-topic parity) — interleaved round-robin; each
    source must own its partition_id space."""
    import ray.data as rd

    from .merge import merge

    if sources is not None:
        source = interleave_sources(*sources)
    ctx = RunContext(table.root, run_id, job="stream")
    buf: list[pa.Table] = []
    buffered = 0
    buffered_bytes = 0
    last_flush = time.time()
    stats = {"micro_batches": 0, "flushes": 0, "rows_in": 0,
             "committed_versions": [], "max_backlog_rows": 0}

    def flush():
        nonlocal buf, buffered, buffered_bytes, last_flush
        if buffered:
            stats["max_backlog_rows"] = max(stats["max_backlog_rows"],
                                            buffered)
            ctx.log_metric("backlog", rows=buffered, bytes=buffered_bytes)
            ds = rd.from_arrow(pa.concat_tables(buf))
            m = merge(table, ds, app_id=app_id, run_id=ctx.run_id,
                      **(merge_kwargs or {}))
            stats["flushes"] += 1
            if m is not None:
                stats["committed_versions"].append(m.version)
        buf, buffered, buffered_bytes = [], 0, 0
        last_flush = time.time()

    for batch in source:
        if not isinstance(batch, pa.Table):
            batch = pa.Table.from_batches(batch.to_batches()) \
                if hasattr(batch, "to_batches") else pa.table(batch)
        buf.append(batch)
        buffered += batch.num_rows
        buffered_bytes += batch.nbytes
        stats["micro_batches"] += 1
        stats["rows_in"] += batch.num_rows
        if (buffered >= max_buffer_rows
                or buffered_bytes >= max_buffer_bytes
                or time.time() - last_flush >= max_wait_secs):
            flush()
    flush()  # final flush at stream end (src/kafka/mod.rs:243-250)
    ctx.log_metric("stream_done", **{k: (len(v) if isinstance(v, list)
                                         else v) for k, v in stats.items()})
    return stats
