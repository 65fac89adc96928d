"""kafka_delta_rs_ray — a Ray-Data-native table-maintenance engine.

A from-scratch reimagining of ``brunolmarques/kafka-delta-rs`` (Rust,
Kafka→Delta streaming micro-batch loader) as a Ray Data engine for
Lance-style tables of image+caption pairs:

- a self-built versioned columnar table format (immutable Parquet
  fragments + JSON manifest versions + key-based deletion vectors),
- maintenance operators: bin-packing compaction, Z-order clustering
  (64-bit Morton of (phash, w, h)) with zone maps, snapshot expire,
  hash-partitioned MERGE INTO,
- the reference's guarantees ported, not its architecture:
  exactly-once commit loop → optimistic-concurrency manifest CAS
  (reference: src/kafka/mod.rs:187-231), offset dedup → idempotent
  writer identity via app_id+seq watermarks (src/pipeline/mod.rs:58-80),
  dead-letter routing → quarantine table (src/kafka/mod.rs:47-81).

Everything executes as ``ray.data.Dataset`` pipelines: ``map_batches``
over zero-copy Arrow, actor pools for codec state, ``sort`` for the
cluster shuffle. Nothing in this package calls ``ray.init()``.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy public API (keeps `import kafka_delta_rs_ray` light and
    # Ray-free until an operator is actually used)
    surface = {
        "Table": ("kafka_delta_rs_ray.tablefmt", "Table"),
        "IMAGE_SCHEMA": ("kafka_delta_rs_ray.tablefmt", "IMAGE_SCHEMA"),
        "append": ("kafka_delta_rs_ray.pipelines.ingest", "append"),
        "merge": ("kafka_delta_rs_ray.pipelines.merge", "merge"),
        "merge_backlog": ("kafka_delta_rs_ray.pipelines.merge", "merge_backlog"),
        "compact": ("kafka_delta_rs_ray.pipelines.compact", "compact"),
        "cluster": ("kafka_delta_rs_ray.pipelines.cluster", "cluster"),
        "expire": ("kafka_delta_rs_ray.pipelines.expire", "expire"),
        "delete_where": ("kafka_delta_rs_ray.pipelines.delete", "delete_where"),
        "rollback": ("kafka_delta_rs_ray.pipelines.delete", "rollback"),
        "stream_ingest": ("kafka_delta_rs_ray.pipelines.stream", "stream_ingest"),
    }
    if name in surface:
        import importlib

        mod, attr = surface[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)
