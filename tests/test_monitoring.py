"""Monitoring surface (reference A1/A2: src/monitoring/mod.rs:18-26
7-instrument view + config section src/config/mod.rs:81-94): pipelines
emit metric events, aggregate_metrics folds them, the `metrics` CLI
job exposes the fold."""

import json
import os

import pyarrow as pa
import pytest

import ray.data as rd

from kafka_delta_rs_ray.pipelines.ingest import append
from kafka_delta_rs_ray.pipelines.merge import merge
from kafka_delta_rs_ray.pipelines.synth import image_dataset
from kafka_delta_rs_ray.state.monitoring import aggregate_metrics
from kafka_delta_rs_ray.tablefmt import IMAGE_SCHEMA, Table

from test_parity import _chrow


@pytest.fixture
def table(tmp_path, ray_session):
    t = Table.create(str(tmp_path / "t"), IMAGE_SCHEMA)
    append(t, image_dataset(40, batch_size=20), target_fragment_rows=20)
    return t


def _write_events(root, run_id, events):
    d = os.path.join(root, "_runs", run_id)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "metrics.jsonl"), "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")


def test_aggregate_synthetic_events(tmp_path):
    root = str(tmp_path)
    _write_events(root, "r1", [
        {"ts": 1.0, "metric": "append_done", "rows": 100,
         "bytes_written": 5000, "seconds": 0.3, "committed_version": 1},
        {"ts": 2.0, "metric": "merge_done", "rows_effective": 40,
         "quarantined": 2, "bytes_written": 2000, "seconds": 1.2,
         "committed_version": 2},
    ])
    _write_events(root, "r2", [
        {"ts": 3.0, "metric": "backlog", "rows": 17, "bytes": 900},
        {"ts": 4.0, "metric": "merge_noop", "seconds": 0.05},
        {"ts": 5.0, "metric": "compact_done", "seconds": 8.0,
         "commit_attempts": 3, "committed_version": 3},
    ])
    agg = aggregate_metrics(root)
    inst = agg["instruments"]
    assert agg["runs"] == 2
    assert inst["messages_read"] == 142        # 100 + 40 + 2
    assert inst["messages_written"] == 140     # 100 + 40
    assert inst["messages_size_bytes"] == 7000
    assert inst["dead_letters"] == 2
    assert inst["commits"] == 3                # 3 committed versions
    assert inst["commit_attempts"] == 3
    assert inst["offset_lag"] == 17            # latest gauge observation
    h = inst["flush_time_seconds"]
    assert h["count"] == 4 and h["max"] == 8.0
    assert sum(h["bucket_counts"]) == 4
    assert agg["derived"]["dead_letter_rate"] == round(2 / 142, 6)

    # windowing: only the most recent run
    agg1 = aggregate_metrics(root, last_n_runs=1)
    assert agg1["runs"] == 1
    assert agg1["instruments"]["messages_read"] == 0
    assert agg1["instruments"]["offset_lag"] == 17


def test_metrics_job_end_to_end(table, tmp_path):
    ch = rd.from_arrow(pa.Table.from_pylist(
        [_chrow("m1", 1, "a"), _chrow("m2", 2, "b")]))
    merge(table, ch, app_id="mon")

    from kafka_delta_rs_ray.config import MaintenanceConfig
    from kafka_delta_rs_ray.run import run

    cfgp = tmp_path / "job.yaml"
    cfgp.write_text(f"table_root: {table.root}\njob: metrics\n"
                    "monitoring:\n  service_name: t\n")
    out = run(MaintenanceConfig.load(str(cfgp)))
    inst = out["instruments"]
    assert out["enabled"] and out["service_name"] == "t"
    # append(40 rows) + merge(2 rows) both counted
    assert inst["messages_read"] == 42
    assert inst["messages_written"] == 42
    assert inst["messages_size_bytes"] > 0
    assert inst["dead_letters"] == 0
    assert inst["commits"] >= 2
    assert inst["flush_time_seconds"]["count"] >= 2
    assert out["derived"]["merge_rows_per_sec"] > 0

    # disabled section → reference's no-op handle
    cfgp.write_text(f"table_root: {table.root}\njob: metrics\n"
                    "monitoring:\n  enabled: false\n")
    assert run(MaintenanceConfig.load(str(cfgp))) == {
        "job": "metrics", "enabled": False}

    # export mode: one flushed snapshot lands on export_path
    exp = tmp_path / "exp.jsonl"
    cfgp.write_text(f"table_root: {table.root}\njob: metrics\n"
                    "monitoring:\n  service_name: t\n"
                    f"  export_path: {exp}\n"
                    "  export_interval_seconds: 3600\n")
    out = run(MaintenanceConfig.load(str(cfgp)))
    assert out["exported_to"] == str(exp)
    lines = [json.loads(x) for x in open(exp) if x.strip()]
    assert len(lines) == 1
    assert lines[0]["instruments"]["messages_read"] == 42


def test_monitoring_config_validation(tmp_path):
    from kafka_delta_rs_ray.config import MaintenanceConfig
    from kafka_delta_rs_ray.errors import ConfigError

    p = tmp_path / "bad.yaml"
    p.write_text("table_root: /x\njob: metrics\n"
                 "monitoring:\n  endpoint: http://otlp\n")
    with pytest.raises(ConfigError, match="unknown monitoring keys"):
        MaintenanceConfig.load(str(p))
    p.write_text("table_root: /x\njob: metrics\n"
                 "monitoring:\n  last_n_runs: 0\n")
    with pytest.raises(ConfigError, match="last_n_runs"):
        MaintenanceConfig.load(str(p))


def test_periodic_exporter_delivers_snapshots(tmp_path):
    """PeriodicMetricsReader (the reference PeriodicReader analog,
    src/monitoring/mod.rs:63-75): snapshots arrive on the interval,
    reflect events appended mid-flight, and shutdown performs one
    final flush then closes exporters."""
    import time

    from kafka_delta_rs_ray.state.monitoring import (InMemoryExporter,
                                                     PeriodicMetricsReader)

    root = str(tmp_path)
    _write_events(root, "r1", [
        {"ts": 1.0, "metric": "append_done", "rows": 100,
         "bytes_written": 5000, "seconds": 0.3, "committed_version": 1}])
    ex = InMemoryExporter()
    reader = PeriodicMetricsReader(root, [ex], interval=0.05).start()
    deadline = time.monotonic() + 5
    while len(ex.snapshots) < 2 and time.monotonic() < deadline:
        time.sleep(0.02)
    assert len(ex.snapshots) >= 2
    assert ex.snapshots[0]["instruments"]["messages_read"] == 100
    assert ex.snapshots[0]["ts"] > 0

    # events appended while the reader runs show up in later snapshots
    _write_events(root, "r2", [
        {"ts": 2.0, "metric": "append_done", "rows": 50,
         "bytes_written": 900, "seconds": 0.1, "committed_version": 2}])
    n = len(ex.snapshots)
    deadline = time.monotonic() + 5
    while time.monotonic() < deadline:
        fresh = ex.snapshots[n:]
        if any(s["instruments"]["messages_read"] == 150 for s in fresh):
            break
        time.sleep(0.02)
    assert any(s["instruments"]["messages_read"] == 150
               for s in ex.snapshots[n:])

    reader.shutdown()
    assert ex.shut_down
    assert ex.snapshots[-1]["instruments"]["messages_read"] == 150
    n_final = len(ex.snapshots)
    time.sleep(0.12)  # thread is gone: no snapshots after shutdown
    assert len(ex.snapshots) == n_final


def test_reader_from_config_jsonl_exporter(tmp_path):
    """Config-gated construction (reference MonitoringConfig,
    src/config/mod.rs:81-94): disabled → None; enabled with an
    export_path → a started reader writing one JSON line per
    snapshot; shutdown-before-first-interval still flushes once."""
    from kafka_delta_rs_ray.state.monitoring import reader_from_config

    root = str(tmp_path)
    _write_events(root, "r1", [
        {"ts": 1.0, "metric": "append_done", "rows": 7,
         "bytes_written": 10, "seconds": 0.1, "committed_version": 1}])
    assert reader_from_config(root, {}) is None
    assert reader_from_config(root, {"enabled": True}) is None  # no sink

    out = str(tmp_path / "metrics_export.jsonl")
    reader = reader_from_config(
        root, {"enabled": True, "export_path": out,
               "export_interval_seconds": 3600,
               "service_name": "svc-x"})
    assert reader is not None
    reader.shutdown()  # before the first interval → final flush only
    lines = [json.loads(x) for x in open(out) if x.strip()]
    assert len(lines) == 1
    assert lines[0]["service_name"] == "svc-x"
    assert lines[0]["instruments"]["messages_read"] == 7


def test_export_interval_config_validation(tmp_path):
    from kafka_delta_rs_ray.config import MaintenanceConfig
    from kafka_delta_rs_ray.errors import ConfigError

    p = tmp_path / "bad.yaml"
    p.write_text("table_root: /x\njob: metrics\n"
                 "monitoring:\n  export_interval_seconds: 0\n")
    with pytest.raises(ConfigError, match="export_interval_seconds"):
        MaintenanceConfig.load(str(p))


def test_live_events_tail_mid_run(table, tmp_path):
    """In-run metrics emission (reference exporter parity,
    src/monitoring/mod.rs:31-129): every log_metric ALSO lands in the
    table-level <table>/_events.jsonl, and follow_events delivers each
    event BEFORE the next flush exists — a second process can watch
    merge lag live instead of folding run files after the fact. Also
    pins the optional in-process on_metric callback and the CLI
    --follow collector mode."""
    from kafka_delta_rs_ray.state.monitoring import follow_events

    # follower starts BEFORE the flushes; from_start=False skips the
    # fixture-append history, so the first yield must come from flush 1
    gen = follow_events(table.root, from_start=False, poll_interval=0.0,
                        idle_timeout=0.5)
    merge(table, rd.from_arrow(pa.Table.from_pylist(
        [_chrow("lv1", 1, "a")])), app_id="live")
    first = next(gen)  # delivered while flush 2 hasn't happened yet
    assert first["metric"] == "merge_done" and first["job"] == "merge"
    merge(table, rd.from_arrow(pa.Table.from_pylist(
        [_chrow("lv2", 2, "b")])), app_id="live")
    rest = list(gen)   # drains flush 2 then ends on idle_timeout
    assert any(e["metric"] == "merge_done" for e in rest)

    # the live stream and the per-run fold see the same events
    agg = aggregate_metrics(table.root)
    assert agg["instruments"]["messages_written"] == 42  # 40 append + 2

    # in-process callback hook fires per event, in order
    from kafka_delta_rs_ray.state.lineage import RunContext

    got = []
    ctx = RunContext(table.root, job="cb", on_metric=got.append)
    ctx.log_metric("probe", rows=7)
    assert got and got[0]["metric"] == "probe" and got[0]["rows"] == 7

    # CLI collector mode: replays history then ends after quiet period
    from kafka_delta_rs_ray.config import MaintenanceConfig
    from kafka_delta_rs_ray.run import run

    cfgp = tmp_path / "follow.yaml"
    cfgp.write_text(f"table_root: {table.root}\njob: metrics\n"
                    "options:\n  follow: true\n  idle_timeout: 0.3\n")
    out = run(MaintenanceConfig.load(str(cfgp)))
    assert out["followed"] and out["events"] >= 3  # append + 2 merges + probe


def test_stream_bytes_cap_and_backlog_gauge(table):
    """The bytes cap is real backpressure: micro-batches under the row
    bound still flush when buffered BYTES cross the cap, and each flush
    records a backlog gauge observation."""
    from kafka_delta_rs_ray.pipelines.stream import stream_ingest

    def mb(lo, hi):
        return pa.Table.from_pylist(
            [_chrow(f"s{i}", i, "c" * 2000) for i in range(lo, hi)])

    batches = [mb(i, i + 5) for i in range(0, 40, 5)]
    one = batches[0].nbytes
    stats = stream_ingest(table, batches, app_id="bp",
                          max_buffer_rows=10_000, max_wait_secs=1e9,
                          max_buffer_bytes=int(one * 2.5),
                          run_id="bpstream")
    assert stats["flushes"] >= 3          # row/time triggers never fire
    assert 0 < stats["max_backlog_rows"] <= 15
    from kafka_delta_rs_ray.state.lineage import RunContext

    ev = RunContext(table.root, "bpstream", job="stream").read_metrics()
    gauges = [e for e in ev if e["metric"] == "backlog"]
    assert len(gauges) == stats["flushes"]
    assert all(e["rows"] > 0 and e["bytes"] > 0 for e in gauges)
    agg = aggregate_metrics(table.root)
    assert agg["instruments"]["offset_lag"] == gauges[-1]["rows"]
