"""Per-run lineage records, done-markers, and metrics.

The reference's checkpoint is the Kafka committed offset plus its
OTLP counters (src/kafka/mod.rs:187-231, src/monitoring/mod.rs:18-26).
A maintenance run's analog lives under ``<table>/_runs/<run_id>/``:

- ``plan.json``            — the frozen work plan (written once);
- ``markers/<kind>/<key>.json`` — atomic done-markers, one per unit of
  work (e.g. a compaction bin); resume = skip marked units and reuse
  their recorded outputs. Markers are written tmp+rename so a crash
  mid-write never yields a half-marker;
- ``metrics.jsonl``        — append-only metric events (rows in/out,
  bytes, fragments rewritten, commit attempts, stage seconds) — the
  7-instrument monitoring surface (A1) as lineage records.

Data files are run-scoped (frag-{run_id}-...), so re-executed work
after a crash writes NEW files and the old ones stay orphans until
snapshot-expire sweeps them; the final manifest CAS is all-or-nothing.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
import uuid


def new_run_id() -> str:
    return uuid.uuid4().hex[:12]


class RunContext:
    def __init__(self, table_root: str, run_id: str | None = None,
                 job: str = "job", on_metric=None):
        self.run_id = run_id or new_run_id()
        self.job = job
        self.table_root = table_root
        self.on_metric = on_metric
        self.dir = os.path.join(table_root, "_runs", self.run_id)
        os.makedirs(os.path.join(self.dir, "markers"), exist_ok=True)

    # -- plan --------------------------------------------------------------
    def write_plan(self, plan: dict) -> None:
        p = os.path.join(self.dir, "plan.json")
        if not os.path.exists(p):  # plans are immutable; resume reuses them
            self._atomic_write(p, json.dumps(plan, indent=1))

    def read_plan(self) -> dict | None:
        p = os.path.join(self.dir, "plan.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    # -- markers -----------------------------------------------------------
    def marker_path(self, kind: str, key: str) -> str:
        d = os.path.join(self.dir, "markers", kind)
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, f"{key}.json")

    def write_marker(self, kind: str, key: str, payload: dict) -> None:
        self._atomic_write(self.marker_path(kind, key),
                           json.dumps({"ts": time.time(), **payload}))

    def read_marker(self, kind: str, key: str) -> dict | None:
        p = self.marker_path(kind, key)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    # -- metrics -----------------------------------------------------------
    def log_metric(self, name: str, **fields) -> None:
        """Record one metric event in THREE places: the per-run
        ``metrics.jsonl`` (what ``aggregate_metrics`` folds), the
        table-level live stream ``<table>/_events.jsonl`` (what an
        external collector tails WHILE jobs run — the in-run analog of
        the reference's push-to-OTLP-endpoint exporter,
        src/monitoring/mod.rs:31-129), and the optional ``on_metric``
        in-process callback. The live append is one O_APPEND write of a
        single small line — atomic across concurrent writer processes —
        and grows O(commits), never O(rows); expire's GC may truncate
        it like any other run artifact."""
        event = {"ts": time.time(), "run_id": self.run_id,
                 "job": self.job, "metric": name, **fields}
        line = json.dumps(event)
        with open(os.path.join(self.dir, "metrics.jsonl"), "a") as f:
            f.write(line + "\n")
        try:
            with open(os.path.join(self.table_root, "_events.jsonl"),
                      "a") as f:
                f.write(line + "\n")
        except OSError:  # live stream is best-effort; the run record is
            pass         # the durable source of truth
        if self.on_metric is not None:
            self.on_metric(event)

    def log_dataset_stats(self, name: str, ds) -> None:
        """Capture Ray Data's per-operator execution stats for an
        EXECUTED dataset into ``stats/<name>.txt`` — wall time, rows,
        block sizes per stage, so "where did this pipeline spend its
        time" survives the run (the feedback loop behind every perf
        change in this repo). No-op if the dataset has no stats yet."""
        try:
            text = ds.stats()
        except Exception:  # noqa: BLE001 — stats are best-effort
            return
        if not text:
            return
        d = os.path.join(self.dir, "stats")
        os.makedirs(d, exist_ok=True)
        self._atomic_write(os.path.join(d, f"{name}.txt"), text)

    def read_metrics(self) -> list[dict]:
        p = os.path.join(self.dir, "metrics.jsonl")
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return [json.loads(ln) for ln in f if ln.strip()]

    @staticmethod
    def _atomic_write(path: str, text: str) -> None:
        d = os.path.dirname(path)
        fd, tmp = tempfile.mkstemp(dir=d, prefix=".tmp-")
        with os.fdopen(fd, "w") as f:
            f.write(text)
        os.replace(tmp, path)
