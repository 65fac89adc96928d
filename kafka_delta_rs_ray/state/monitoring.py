"""Aggregate monitoring view over a table's run metrics.

The reference publishes 7 live OTLP instruments — messages read,
message bytes, source commits, offset-lag gauge, dead letters, rows
written, flush-seconds histogram (src/monitoring/mod.rs:18-26,
150-202) — behind a config-gated ``MonitoringConfig`` section
(src/config/mod.rs:81-94). This sandbox has no network, so the analog
is pull- not push-based: every pipeline appends metric events to
``<table>/_runs/<run_id>/metrics.jsonl`` (state/lineage.py) and this
module folds those event streams into the same 7-instrument view on
demand ("what's my merge throughput and dead-letter rate over the last
N runs"). On a real deployment the fold runs wherever the OTLP
exporter would — the event records carry everything the reference's
counters do.

Driver-side by design: the input is O(runs) small JSON lines, never
data rows.
"""

from __future__ import annotations

import glob
import json
import os

# flush-duration histogram bucket upper bounds (seconds); the
# reference's f64_histogram uses the exporter's defaults, these mirror
# the OTLP default boundaries that matter at maintenance timescales
HIST_BOUNDS = (0.1, 0.5, 1.0, 5.0, 10.0, 30.0, 60.0, 300.0)

# events that represent one completed flush/maintenance transaction
_DONE_EVENTS = ("merge_done", "append_done", "compact_done",
                "cluster_done", "delete_done", "expire_done",
                "merge_noop", "merge_all_quarantined", "delete_noop")


def _iter_run_events(table_root: str):
    """Yield (run_id, earliest_ts, [events]) per run directory."""
    for p in glob.glob(os.path.join(table_root, "_runs", "*",
                                    "metrics.jsonl")):
        run_id = os.path.basename(os.path.dirname(p))
        events = []
        with open(p) as f:
            for ln in f:
                ln = ln.strip()
                if ln:
                    events.append(json.loads(ln))
        if events:
            yield run_id, min(e.get("ts", 0.0) for e in events), events


def _histogram(values: list) -> dict:
    buckets = [0] * (len(HIST_BOUNDS) + 1)
    for v in values:
        i = 0
        while i < len(HIST_BOUNDS) and v > HIST_BOUNDS[i]:
            i += 1
        buckets[i] += 1
    s = sorted(values)
    pct = (lambda q: s[min(len(s) - 1, int(q * len(s)))]) if s else None
    return {
        "count": len(values),
        "sum": round(sum(values), 3),
        "min": round(min(values), 3) if values else None,
        "max": round(max(values), 3) if values else None,
        "p50": round(pct(0.50), 3) if values else None,
        "p95": round(pct(0.95), 3) if values else None,
        "bounds": list(HIST_BOUNDS),
        "bucket_counts": buckets,
    }


def follow_events(table_root: str, poll_interval: float = 0.1,
                  stop=None, from_start: bool = True,
                  idle_timeout: float | None = None):
    """Tail the table's live metric stream (``<table>/_events.jsonl``)
    as a generator of parsed events — the "watch it run" half of the
    monitoring story: a second process (collector, dashboard, the
    ``metrics --follow`` CLI) consumes flush/commit events WHILE
    maintenance jobs emit them, without touching the per-run files.

    ``stop``: optional zero-arg callable checked between polls (return
    True to end). ``from_start=False`` skips history and yields only
    events appended after the call. ``idle_timeout``: end after this
    many seconds without a new event (None = follow forever). Partial
    trailing lines (a writer mid-append) are left in the buffer until
    their newline arrives — a reader never sees half an event.

    The starting position is captured EAGERLY (at call time, not at
    the first next()), so "follower created before the job started"
    means exactly that even though generators are lazy."""
    path = os.path.join(table_root, "_events.jsonl")
    pos = 0
    if not from_start and os.path.exists(path):
        pos = os.path.getsize(path)
    return _follow_from(path, pos, poll_interval, stop, idle_timeout)


def _follow_from(path: str, pos: int, poll_interval: float, stop,
                 idle_timeout: float | None):
    import time as _time

    buf = ""
    last_event = _time.monotonic()
    while True:
        progressed = False
        if os.path.exists(path):
            size = os.path.getsize(path)
            if size > pos:
                with open(path) as f:
                    f.seek(pos)
                    buf += f.read()
                    pos = f.tell()
                progressed = True
                last_event = _time.monotonic()
                while "\n" in buf:
                    ln, buf = buf.split("\n", 1)
                    if ln.strip():
                        yield json.loads(ln)
        if stop is not None and stop():
            return
        # idle is judged ONLY by a poll that found nothing new — time
        # spent suspended at a yield (the consumer working between
        # next() calls) must not count, or a slow consumer would miss
        # events a producer appended while it was busy
        if (not progressed and idle_timeout is not None
                and _time.monotonic() - last_event > idle_timeout):
            return
        _time.sleep(poll_interval)


class MetricExporter:
    """Pluggable exporter seam — the reference wires an OTLP
    ``MetricExporter`` into a ``PeriodicReader``
    (src/monitoring/mod.rs:49-75); this is that interface with the
    transport left to the implementation (no network in this sandbox,
    so the shipped implementations are in-memory and jsonl-file).
    ``export`` receives one aggregated 7-instrument snapshot
    (the ``aggregate_metrics`` dict plus a ``ts`` field)."""

    def export(self, snapshot: dict) -> None:
        raise NotImplementedError

    def shutdown(self) -> None:
        """Flush/close transport state. Called once by the reader."""


class InMemoryExporter(MetricExporter):
    """Test double / embedding hook: snapshots collect on a list."""

    def __init__(self):
        self.snapshots: list[dict] = []
        self.shut_down = False

    def export(self, snapshot: dict) -> None:
        self.snapshots.append(snapshot)

    def shutdown(self) -> None:
        self.shut_down = True


class JsonlExporter(MetricExporter):
    """Offline OTLP stand-in: one JSON line per periodic snapshot,
    appended (crash-tolerant — a partial final line is ignored by any
    jsonl reader) so an external collector can tail it."""

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "a")

    def export(self, snapshot: dict) -> None:
        self._f.write(json.dumps(snapshot) + "\n")
        self._f.flush()

    def shutdown(self) -> None:
        self._f.close()


class PeriodicMetricsReader:
    """The reference ``PeriodicReader`` analog
    (src/monitoring/mod.rs:63-75): a daemon thread folds the table's
    run events into the 7-instrument view every ``interval`` seconds
    and delivers the snapshot to every registered exporter; shutdown
    performs one final export (the OTLP flush-on-shutdown contract)
    then closes the exporters. Driver-side by design, like
    aggregate_metrics: input is O(runs) JSON lines, never data rows."""

    def __init__(self, table_root: str, exporters: list[MetricExporter],
                 interval: float = 60.0, last_n_runs: int | None = None,
                 service_name: str = "kafka-delta-rs-ray"):
        import threading

        self.table_root = table_root
        self.exporters = list(exporters)
        self.interval = float(interval)
        self.last_n_runs = last_n_runs
        self.service_name = service_name
        self._stop = threading.Event()
        self._thread: "threading.Thread | None" = None

    def _snapshot(self) -> dict:
        import time as _time

        snap = aggregate_metrics(self.table_root,
                                 last_n_runs=self.last_n_runs,
                                 service_name=self.service_name)
        snap["ts"] = _time.time()
        return snap

    def _deliver(self) -> None:
        snap = self._snapshot()
        for ex in self.exporters:
            ex.export(snap)

    def _run(self) -> None:
        # Event.wait gives interruptible sleep: shutdown() never waits
        # out a full interval
        while not self._stop.wait(self.interval):
            self._deliver()

    def start(self) -> "PeriodicMetricsReader":
        import threading

        if self._thread is not None:
            raise RuntimeError("reader already started")
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="kdr-metrics-reader")
        self._thread.start()
        return self

    def shutdown(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        self._deliver()  # final flush, even if never started
        for ex in self.exporters:
            ex.shutdown()


def reader_from_config(table_root: str, monitoring: dict,
                       extra_exporters: list[MetricExporter] | None = None):
    """MaintenanceConfig.monitoring section → started reader, or None
    when disabled (the reference's NO_OP-monitor fallback,
    src/config/mod.rs:81-94 + mod.rs:131). ``export_path`` adds a
    JsonlExporter; ``extra_exporters`` lets an embedding register its
    own transport."""
    if not monitoring.get("enabled"):
        return None
    exporters = list(extra_exporters or [])
    if monitoring.get("export_path"):
        exporters.append(JsonlExporter(monitoring["export_path"]))
    if not exporters:
        return None
    return PeriodicMetricsReader(
        table_root, exporters,
        interval=float(monitoring.get("export_interval_seconds", 60.0)),
        last_n_runs=monitoring.get("last_n_runs"),
        service_name=monitoring.get("service_name",
                                    "kafka-delta-rs-ray")).start()


def aggregate_metrics(table_root: str, last_n_runs: int | None = None,
                      service_name: str = "kafka-delta-rs-ray") -> dict:
    """Fold ``_runs/*/metrics.jsonl`` into the reference's
    7-instrument monitoring view.

    ``last_n_runs``: restrict to the N most-recent runs (by each run's
    earliest event timestamp); None = all runs.
    """
    runs = sorted(_iter_run_events(table_root), key=lambda r: r[1])
    if last_n_runs is not None:
        runs = runs[-last_n_runs:]

    rows_read = 0          # 1. messages_read: rows entering merge/append
    bytes_written = 0      # 2. messages_size: bytes landed in fragments
    commits = 0            # 3. commits: manifest versions committed
    commit_attempts = 0    #    (CAS retries included, where recorded)
    dead_letters = 0       # 5. dead_letters: quarantined rows
    rows_written = 0       # 6. messages_written: rows landed
    flush_seconds: list = []  # 7. flush-time histogram
    backlog = None         # 4. offset-lag gauge: latest observation
    backlog_ts = -1.0
    per_job: dict[str, int] = {}

    for _run_id, _ts, events in runs:
        for e in events:
            name = e.get("metric", "")
            if name in _DONE_EVENTS:
                per_job[name] = per_job.get(name, 0) + 1
                if "seconds" in e:
                    flush_seconds.append(float(e["seconds"]))
                if e.get("committed_version") is not None:
                    commits += 1
                commit_attempts += int(e.get("commit_attempts", 0))
            if name == "merge_done":
                rows_read += int(e.get("rows_effective", 0)) \
                    + int(e.get("quarantined", 0))
                rows_written += int(e.get("rows_effective", 0))
                dead_letters += int(e.get("quarantined", 0))
                bytes_written += int(e.get("bytes_written", 0))
            elif name == "merge_all_quarantined":
                rows_read += int(e.get("rows_fresh", 0))
                dead_letters += int(e.get("rows_fresh", 0))
            elif name == "append_done":
                rows_read += int(e.get("rows", 0))
                rows_written += int(e.get("rows", 0))
                bytes_written += int(e.get("bytes_written", 0))
            elif name == "backlog" and e.get("ts", 0.0) > backlog_ts:
                backlog, backlog_ts = int(e.get("rows", 0)), e["ts"]

    window = sum(flush_seconds) or None
    return {
        "service_name": service_name,
        "runs": len(runs),
        "instruments": {
            "messages_read": rows_read,
            "messages_size_bytes": bytes_written,
            "commits": commits,
            "commit_attempts": commit_attempts,
            "offset_lag": backlog,            # latest gauge observation
            "dead_letters": dead_letters,
            "messages_written": rows_written,
            "flush_time_seconds": _histogram(flush_seconds),
        },
        "derived": {
            # the day-one operator questions, precomputed
            "merge_rows_per_sec": (round(rows_written / window, 1)
                                   if window else None),
            "dead_letter_rate": (round(dead_letters / rows_read, 6)
                                 if rows_read else 0.0),
            "events_per_job": per_job,
        },
    }
