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
