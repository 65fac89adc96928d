"""Maintenance job configuration (the reference's C1 surface:
YAML load + validate-early with specific error messages,
src/config/mod.rs:96-177; defaults warned, not silently applied).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

from .errors import ConfigError

log = logging.getLogger(__name__)

JOBS = ("append", "merge", "compact", "cluster", "expire", "lifecycle",
        "delete", "update", "rollback", "history", "quarantine",
        "metrics", "stream", "changes", "stats", "autopilot", "branch",
        "export", "clone", "alter")

# monitoring section keys (reference MonitoringConfig,
# src/config/mod.rs:81-94: enabled / endpoint / service_name; here the
# "endpoint" analog is the table's own _runs event store, and
# last_n_runs bounds the aggregation window)
MONITORING_KEYS = {"enabled", "service_name", "last_n_runs",
                   "export_interval_seconds", "export_path"}

DEFAULT_TARGET_FRAGMENT_BYTES = 128 << 20
DEFAULT_TARGET_FRAGMENT_ROWS = 4096
DEFAULT_KEEP_LAST = 2


@dataclass
class MaintenanceConfig:
    table_root: str
    job: str
    app_id: str = "default-app"
    target_fragment_bytes: int = DEFAULT_TARGET_FRAGMENT_BYTES
    target_fragment_rows: int = DEFAULT_TARGET_FRAGMENT_ROWS
    keep_last: int = DEFAULT_KEEP_LAST
    min_age_seconds: float = 3600.0  # expire: pre-commit-file safety valve
    salt_buckets: int = 4096
    cluster_curve: str = "morton"  # or "hilbert"
    merge_buckets: int = 32
    changeset_path: str | None = None
    run_id: str | None = None
    transcode_fmt: str | None = None  # compact: rewrite-with-recompression
    predicate: dict | None = None     # delete: {col: [lo, hi]}
    restore_version: int | None = None  # rollback target
    # stream job: the reference's PipelineConfig flush policy
    # (max_buffer_size / max_wait_secs, src/config/mod.rs:82-86 +
    # defaults src/kafka/mod.rs:141-142) + the byte cap
    max_buffer_rows: int = 10_000
    max_wait_secs: float = 360.0
    max_buffer_bytes: int = 256 << 20
    # the reference's pluggable input-format seam (MessageFormat enum,
    # src/config/mod.rs:43-50): parquet micro-batches or JSON-lines
    # parsed schema-first (grpc = the reference's declared-only stub)
    message_format: str = "parquet"
    monitoring: dict = field(default_factory=dict)
    options: dict = field(default_factory=dict)

    @classmethod
    def load(cls, path: str) -> "MaintenanceConfig":
        import yaml

        try:
            with open(path) as f:
                raw = yaml.safe_load(f) or {}
        except FileNotFoundError:
            raise ConfigError(f"config file not found: {path}") from None
        except yaml.YAMLError as e:
            raise ConfigError(f"invalid YAML in {path}: {e}") from None
        known = {f_.name for f_ in cls.__dataclass_fields__.values()}
        unknown = set(raw) - known
        if unknown:
            raise ConfigError(f"unknown config keys: {sorted(unknown)}")
        try:
            cfg = cls(**raw)
        except TypeError as e:
            raise ConfigError(f"missing required config key: {e}") from None
        cfg.validate()
        return cfg

    def validate(self) -> None:
        # reference parity: each empty required field gets its own
        # message (src/config/mod.rs:120-139)
        if not self.table_root:
            raise ConfigError("table_root must not be empty")
        if not self.job:
            raise ConfigError("job must not be empty")
        if self.job not in JOBS:
            raise ConfigError(f"unknown job {self.job!r}; one of {JOBS}")
        if not self.app_id:
            raise ConfigError("app_id must not be empty")
        if self.job in ("merge", "append", "stream") \
                and not self.changeset_path:
            raise ConfigError(
                f"{self.job} requires changeset_path (the input parquet"
                f"{' glob' if self.job == 'stream' else ''})")
        if self.job == "stream":
            if self.max_buffer_rows < 1:
                raise ConfigError("max_buffer_rows must be >= 1")
            if self.max_wait_secs <= 0:
                raise ConfigError("max_wait_secs must be > 0")
            if self.max_buffer_bytes < 1:
                raise ConfigError("max_buffer_bytes must be >= 1")
            if self.message_format not in ("parquet", "json", "arrow-ipc"):
                raise ConfigError(
                    f"unknown message_format {self.message_format!r}; "
                    f"one of ('parquet', 'json', 'arrow-ipc')")
        if self.job == "delete" and not self.predicate:
            raise ConfigError("delete requires predicate ({col: [lo, hi]})")
        if self.job == "update":
            if not self.predicate:
                raise ConfigError(
                    "update requires predicate ({col: [lo, hi]})")
            if not self.options.get("assignments"):
                raise ConfigError(
                    "update requires options.assignments ({col: value})")
        if self.job == "clone" and not self.options.get("dest_root"):
            raise ConfigError("clone requires options.dest_root")
        if self.job == "alter":
            act = self.options.get("action")
            if act not in ("add_constraint", "drop_constraint",
                           "drop_column"):
                raise ConfigError(
                    "alter requires options.action in (add_constraint,"
                    " drop_constraint, drop_column)")
            if act == "add_constraint" and not self.options.get(
                    "constraint"):
                raise ConfigError(
                    "alter add_constraint requires options.constraint")
            if act in ("drop_constraint", "drop_column") \
                    and not self.options.get("name"):
                raise ConfigError(f"alter {act} requires options.name")
        if self.job == "rollback" and self.restore_version is None:
            raise ConfigError("rollback requires restore_version")
        if self.target_fragment_bytes <= 0 or self.target_fragment_rows <= 0:
            raise ConfigError("fragment targets must be positive")
        if self.target_fragment_bytes == DEFAULT_TARGET_FRAGMENT_BYTES:
            log.warning("target_fragment_bytes not set; using default %d",
                        DEFAULT_TARGET_FRAGMENT_BYTES)
        if self.keep_last < 1:
            raise ConfigError("keep_last must be >= 1")
        if self.min_age_seconds < 0:
            raise ConfigError("min_age_seconds must be >= 0")
        unknown_mon = set(self.monitoring) - MONITORING_KEYS
        if unknown_mon:
            raise ConfigError(
                f"unknown monitoring keys: {sorted(unknown_mon)}; "
                f"one of {sorted(MONITORING_KEYS)}")
        if self.monitoring.get("last_n_runs") is not None \
                and int(self.monitoring["last_n_runs"]) < 1:
            raise ConfigError("monitoring.last_n_runs must be >= 1")
        if self.monitoring.get("export_interval_seconds") is not None \
                and float(self.monitoring["export_interval_seconds"]) <= 0:
            raise ConfigError(
                "monitoring.export_interval_seconds must be > 0")
        if self.cluster_curve not in ("morton", "hilbert"):
            raise ConfigError(
                f"cluster_curve must be 'morton' or 'hilbert', "
                f"got {self.cluster_curve!r}")
