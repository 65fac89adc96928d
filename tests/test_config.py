"""Config load + validation (reference config tests,
src/config/mod.rs:181-289: valid YAML loads; each empty required
field rejected with a specific message; missing file errors)."""

import pytest

from kafka_delta_rs_ray.config import MaintenanceConfig
from kafka_delta_rs_ray.errors import ConfigError


def _write(tmp_path, text):
    p = tmp_path / "cfg.yaml"
    p.write_text(text)
    return str(p)


def test_valid_config_loads(tmp_path):
    cfg = MaintenanceConfig.load(_write(tmp_path, """
table_root: /tmp/t
job: compact
app_id: my-app
target_fragment_bytes: 1000000
"""))
    assert cfg.table_root == "/tmp/t"
    assert cfg.job == "compact"
    assert cfg.target_fragment_bytes == 1_000_000


def test_missing_file_errors():
    with pytest.raises(ConfigError, match="not found"):
        MaintenanceConfig.load("/tmp/no-such-config-xyz.yaml")


@pytest.mark.parametrize("yaml_text,msg", [
    ("table_root: ''\njob: compact", "table_root must not be empty"),
    ("table_root: /tmp/t\njob: ''", "job must not be empty"),
    ("table_root: /tmp/t\njob: frobnicate", "unknown job"),
    ("table_root: /tmp/t\njob: compact\napp_id: ''", "app_id must not be empty"),
    ("table_root: /tmp/t\njob: merge", "merge requires changeset_path"),
    ("table_root: /tmp/t\njob: compact\nkeep_last: 0", "keep_last"),
    ("table_root: /tmp/t\njob: compact\ntarget_fragment_rows: -1", "positive"),
], ids=["empty-root", "empty-job", "bad-job", "empty-app", "merge-no-changes",
        "bad-keep-last", "bad-rows"])
def test_each_invalid_field_specific_message(tmp_path, yaml_text, msg):
    with pytest.raises(ConfigError, match=msg):
        MaintenanceConfig.load(_write(tmp_path, yaml_text))


def test_unknown_keys_rejected(tmp_path):
    with pytest.raises(ConfigError, match="unknown config keys"):
        MaintenanceConfig.load(_write(tmp_path,
                                      "table_root: /t\njob: compact\nbogus: 1"))


def test_invalid_yaml_errors(tmp_path):
    with pytest.raises(ConfigError, match="invalid YAML"):
        MaintenanceConfig.load(_write(tmp_path, "a: [unclosed"))


def test_config_rejects_bad_cluster_curve(tmp_path):
    import pytest
    import yaml

    from kafka_delta_rs_ray.config import MaintenanceConfig
    from kafka_delta_rs_ray.errors import ConfigError

    p = tmp_path / "job.yaml"
    p.write_text(yaml.safe_dump({"table_root": "/tmp/t", "job": "cluster",
                                 "cluster_curve": "peano"}))
    with pytest.raises(ConfigError, match="cluster_curve"):
        MaintenanceConfig.load(str(p))


def test_append_requires_input_path(tmp_path):
    import pytest
    import yaml

    from kafka_delta_rs_ray.config import MaintenanceConfig
    from kafka_delta_rs_ray.errors import ConfigError

    p = tmp_path / "job.yaml"
    p.write_text(yaml.safe_dump({"table_root": "/tmp/t", "job": "append"}))
    with pytest.raises(ConfigError, match="append requires changeset_path"):
        MaintenanceConfig.load(str(p))


def test_stream_job_cli_end_to_end(tmp_path, ray_session):
    """The reference's main runtime shape (src/main.rs:27-60: config →
    consumer loop) as a CLI job: parquet micro-batch files → size/time/
    byte flush policy → merges; replay of the same stream is a no-op."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kafka_delta_rs_ray.config import MaintenanceConfig
    from kafka_delta_rs_ray.pipelines.ingest import append
    from kafka_delta_rs_ray.pipelines.synth import image_dataset
    from kafka_delta_rs_ray.run import run
    from kafka_delta_rs_ray.tablefmt import IMAGE_SCHEMA, Table
    from kafka_delta_rs_ray.tablefmt.schema import CHANGESET_SCHEMA

    t = Table.create(str(tmp_path / "t"), IMAGE_SCHEMA)
    append(t, image_dataset(20, batch_size=20), target_fragment_rows=20)

    from test_parity import _chrow

    feed = tmp_path / "feed"
    feed.mkdir()
    for i in range(4):
        rows = [_chrow(f"st-{i}-{j}", i * 10 + j, f"c{i}{j}")
                for j in range(5)]
        pq.write_table(pa.Table.from_pylist(rows, schema=CHANGESET_SCHEMA),
                       str(feed / f"mb-{i:04d}.parquet"))

    cfgp = tmp_path / "stream.yaml"
    cfgp.write_text(f"table_root: {t.root}\njob: stream\napp_id: cli\n"
                    f"changeset_path: {feed}/*.parquet\n"
                    "max_buffer_rows: 8\n")
    out = run(MaintenanceConfig.load(str(cfgp)))
    assert out["files"] == 4 and out["rows_in"] == 20
    assert out["flushes"] >= 2 and out["committed_versions"] >= 2
    ids = set(t.snapshot().to_arrow()["image_id"].to_pylist())
    assert all(f"st-{i}-{j}" in ids for i in range(4) for j in range(5))

    # replay the whole stream: watermarks absorb it, no new versions
    v = t.snapshot().manifest.version
    out2 = run(MaintenanceConfig.load(str(cfgp)))
    assert out2["committed_versions"] == 0
    assert t.snapshot().manifest.version == v

    # validation: stream requires changeset_path
    bad = tmp_path / "bad.yaml"
    bad.write_text(f"table_root: {t.root}\njob: stream\n")
    import pytest as _pytest

    from kafka_delta_rs_ray.errors import ConfigError
    with _pytest.raises(ConfigError, match="changeset_path"):
        MaintenanceConfig.load(str(bad))


def test_changes_job_cli_end_to_end(tmp_path, ray_session):
    """CDC CLI: the (from, to] change feed lands as parquet with
    _change_type/_commit_version, and the reported row count matches
    the written files."""
    import pyarrow.parquet as pq
    import yaml

    from kafka_delta_rs_ray.config import MaintenanceConfig
    from kafka_delta_rs_ray.pipelines.ingest import append
    from kafka_delta_rs_ray.pipelines.merge import merge
    from kafka_delta_rs_ray.pipelines.synth import (changeset_dataset,
                                                    image_dataset)
    from kafka_delta_rs_ray.run import run
    from kafka_delta_rs_ray.tablefmt import IMAGE_SCHEMA, Table

    t = Table.create(str(tmp_path / "t"), IMAGE_SCHEMA)
    append(t, image_dataset(40, batch_size=20), target_fragment_rows=20)
    v0 = t.latest_version()
    merge(t, changeset_dataset(40, 12, seed=9).materialize(), app_id="cdc")

    outdir = tmp_path / "feed_out"
    cfgp = tmp_path / "changes.yaml"
    cfgp.write_text(yaml.safe_dump({
        "table_root": t.root, "job": "changes",
        "options": {"from_version": v0, "output_path": str(outdir)}}))
    out = run(MaintenanceConfig.load(str(cfgp)))
    assert out["rows"] > 0 and out["to_version"] == t.latest_version()
    written = pq.read_table(str(outdir))
    assert written.num_rows == out["rows"]
    assert set(written["_change_type"].to_pylist()) <= {"insert", "delete"}
    assert set(written.column_names) >= {"image_id", "_change_type",
                                         "_commit_version"}


def test_stream_job_json_feed(tmp_path, ray_session):
    """message_format: json — the reference's primary input format
    through the consumer loop: JSON-lines micro-batches parse
    schema-first, good rows merge, corrupt lines dead-letter to
    quarantine with their reasons, and the stream replays as a no-op."""
    import base64
    import json

    import yaml

    from kafka_delta_rs_ray.codecs import encode
    from kafka_delta_rs_ray.config import MaintenanceConfig
    from kafka_delta_rs_ray.errors import ConfigError
    from kafka_delta_rs_ray.pipelines.ingest import append
    from kafka_delta_rs_ray.pipelines.synth import image_dataset, make_row
    from kafka_delta_rs_ray.run import run
    from kafka_delta_rs_ray.stages.validate import quarantine_report
    from kafka_delta_rs_ray.tablefmt import IMAGE_SCHEMA, Table

    t = Table.create(str(tmp_path / "t"), IMAGE_SCHEMA)
    append(t, image_dataset(10, batch_size=10), target_fragment_rows=10)

    feed = tmp_path / "jfeed"
    feed.mkdir()
    for i in range(2):
        lines = []
        for j in range(3):
            r = make_row(1000 + i * 10 + j, 42)
            buf = encode(r["img"], "rawz")
            lines.append(json.dumps({
                "image_id": f"js-{i}-{j}",
                "bytes": base64.b64encode(buf).decode(),
                "w": r["w"], "h": r["h"], "fmt": "rawz",
                "caption": f"json row {i}/{j}",
                "phash": 12345 + j, "partition_id": 0,
                "seq": i * 10 + j, "op": "upsert"}))
        if i == 1:
            lines.append("corrupt {json")              # dead-letter
            lines.append("{}")                          # silent drop
        (feed / f"mb-{i:04d}.jsonl").write_text("\n".join(lines))

    cfgp = tmp_path / "jstream.yaml"
    cfgp.write_text(yaml.safe_dump({
        "table_root": t.root, "job": "stream", "app_id": "jcli",
        "changeset_path": f"{feed}/*.jsonl", "message_format": "json",
        "max_buffer_rows": 4, "run_id": "jsr1"}))
    out = run(MaintenanceConfig.load(str(cfgp)))
    assert out["files"] == 2 and out["rows_in"] == 6
    assert out["parse_errors"] == 1
    ids = set(t.snapshot().to_arrow()["image_id"].to_pylist())
    assert all(f"js-{i}-{j}" in ids for i in range(2) for j in range(3))
    rep = quarantine_report(t.root, run_id="jsr1")
    assert rep["rows"] == 1 and any("json" in e.lower() or "Expecting" in e
                                    for e in rep["errors"])

    # whole-stream replay: watermarks absorb every row
    v = t.snapshot().manifest.version
    out2 = run(MaintenanceConfig.load(str(cfgp)))
    assert out2["committed_versions"] == 0
    assert t.snapshot().manifest.version == v

    # bad format rejected at config load
    bad = tmp_path / "badfmt.yaml"
    bad.write_text(yaml.safe_dump({
        "table_root": t.root, "job": "stream", "changeset_path": "x",
        "message_format": "avro"}))
    with pytest.raises(ConfigError, match="message_format"):
        MaintenanceConfig.load(str(bad))


def test_branch_job_cli_end_to_end(tmp_path, ray_session):
    """Write-audit-publish through the CLI: create a branch, compact
    it via options.branch, fast-forward merge, delete."""
    from kafka_delta_rs_ray.config import MaintenanceConfig
    from kafka_delta_rs_ray.pipelines.ingest import append
    from kafka_delta_rs_ray.pipelines.synth import image_dataset
    from kafka_delta_rs_ray.run import run
    from kafka_delta_rs_ray.tablefmt import IMAGE_SCHEMA, Table

    t = Table.create(str(tmp_path / "t"), IMAGE_SCHEMA)
    append(t, image_dataset(24, batch_size=6), target_fragment_rows=6)
    pre = t.snapshot().dataset().to_pandas().sort_values(
        "image_id").reset_index(drop=True)

    def cfg(body: str, name: str) -> MaintenanceConfig:
        p = tmp_path / name
        p.write_text(f"table_root: {t.root}\n{body}")
        return MaintenanceConfig.load(str(p))

    out = run(cfg("job: branch\noptions:\n  action: create\n"
                  "  name: audit\n", "b1.yaml"))
    assert out["created"] == "audit"
    assert run(cfg("job: branch\n", "b2.yaml"))["branches"] == ["audit"]

    out = run(cfg("job: compact\noptions:\n  branch: audit\n", "b3.yaml"))
    # compaction committed on the branch only
    assert t.latest_version() == 1
    assert t.branch("audit").latest_version() == 2

    out = run(cfg("job: branch\noptions:\n  action: merge\n"
                  "  name: audit\n", "b4.yaml"))
    assert out["version"] == 2
    post = t.snapshot().dataset().to_pandas().sort_values(
        "image_id").reset_index(drop=True)
    assert pre.equals(post)  # scan identity across the WAP cycle

    run(cfg("job: branch\noptions:\n  action: delete\n  name: audit\n",
            "b5.yaml"))
    assert t.branches() == []


def test_cli_update_and_clone_jobs(tmp_path, ray_session):
    """CLI parity for the two round-5 verbs: `update` applies a
    predicate SET through the job runner, `clone` shallow-clones to a
    new root; config validation rejects each without its required
    options."""
    import pytest

    from kafka_delta_rs_ray.config import MaintenanceConfig
    from kafka_delta_rs_ray.errors import ConfigError
    from kafka_delta_rs_ray.pipelines.ingest import append
    from kafka_delta_rs_ray.pipelines.synth import image_dataset
    from kafka_delta_rs_ray.run import run
    from kafka_delta_rs_ray.tablefmt import IMAGE_SCHEMA, Table

    t = Table.create(str(tmp_path / "t"), IMAGE_SCHEMA)
    append(t, image_dataset(20, batch_size=20), target_fragment_rows=20)

    cfgp = tmp_path / "update.yaml"
    cfgp.write_text(
        f"table_root: {t.root}\njob: update\n"
        f"predicate:\n  w: [128, null]\n"
        f"options:\n  assignments:\n    caption: CLI-WIDE\n")
    run(MaintenanceConfig.load(str(cfgp)))
    caps = t.snapshot().to_arrow()
    wide = [c for c, w in zip(caps["caption"].to_pylist(),
                              caps["w"].to_pylist()) if w >= 128]
    assert wide and all(c == "CLI-WIDE" for c in wide)

    cfgp2 = tmp_path / "clone.yaml"
    cfgp2.write_text(
        f"table_root: {t.root}\njob: clone\n"
        f"options:\n  dest_root: {tmp_path / 'c'}\n")
    out = run(MaintenanceConfig.load(str(cfgp2)))
    assert out["rows"] == caps.num_rows
    assert Table(str(tmp_path / "c")).snapshot().to_arrow(
        ).num_rows == caps.num_rows

    with pytest.raises(ConfigError, match="assignments"):
        MaintenanceConfig(table_root=t.root, job="update",
                          predicate={"w": [0, None]}).validate()
    with pytest.raises(ConfigError, match="dest_root"):
        MaintenanceConfig(table_root=t.root, job="clone").validate()


def test_cli_alter_job(tmp_path, ray_session):
    """CLI `alter` job: add_constraint / drop_constraint / drop_column
    through the job runner, with config validation for each action."""
    import pytest

    from kafka_delta_rs_ray.config import MaintenanceConfig
    from kafka_delta_rs_ray.errors import ConfigError
    from kafka_delta_rs_ray.pipelines.ingest import append
    from kafka_delta_rs_ray.pipelines.synth import image_dataset
    from kafka_delta_rs_ray.run import run
    from kafka_delta_rs_ray.tablefmt import IMAGE_SCHEMA, Table

    t = Table.create(str(tmp_path / "t"), IMAGE_SCHEMA)
    append(t, image_dataset(10, batch_size=10), target_fragment_rows=10)

    cfgp = tmp_path / "a1.yaml"
    cfgp.write_text(
        f"table_root: {t.root}\njob: alter\n"
        f"options:\n  action: add_constraint\n"
        f"  constraint:\n    name: w_pos\n    col: w\n"
        f"    op: '>'\n    value: 0\n")
    out = run(MaintenanceConfig.load(str(cfgp)))
    assert out["added"] == "w_pos"
    assert [c["name"] for c in t.constraints()] == ["w_pos"]

    cfgp2 = tmp_path / "a2.yaml"
    cfgp2.write_text(
        f"table_root: {t.root}\njob: alter\n"
        f"options:\n  action: drop_constraint\n  name: w_pos\n")
    run(MaintenanceConfig.load(str(cfgp2)))
    assert t.constraints() == []

    cfgp3 = tmp_path / "a3.yaml"
    cfgp3.write_text(
        f"table_root: {t.root}\njob: alter\n"
        f"options:\n  action: drop_column\n  name: caption\n")
    out3 = run(MaintenanceConfig.load(str(cfgp3)))
    assert out3["dropped_column"] == "caption"
    assert "caption" not in t.schema().names

    with pytest.raises(ConfigError, match="alter requires"):
        MaintenanceConfig(table_root=t.root, job="alter").validate()
    with pytest.raises(ConfigError, match="requires options.name"):
        MaintenanceConfig(table_root=t.root, job="alter",
                          options={"action": "drop_column"}).validate()
