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
