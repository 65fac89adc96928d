"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash).

Nothing here (or in the library) calls ray.init()/ray.shutdown(); only
bench.py and the test fixture own a Ray session.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: full maintenance lifecycle (append → merge →
    replay no-op → compact → cluster → expire) on a deterministic
    synthetic image+caption table, plus a smoke read of the sf0.001
    events table. Returns the per-stage summary as a pyarrow Table."""
    import ray.data as rd

    from kafka_delta_rs_ray.pipelines.lifecycle import maintenance_lifecycle

    # smoke: the driver's testdata is readable as a Dataset
    n_events = rd.read_parquet(
        "/root/testdata/sf0.001/events.parquet").count()
    summary = maintenance_lifecycle(n_rows=300, n_changes=80)
    return summary.append_column(
        "sf0001_events", [[int(n_events)] * summary.num_rows])


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline (SURVEY.md §2 plus
    the training-data ops). Callables take sf_dir and return a
    Dataset / DataFrame / pyarrow Table."""
    from kafka_delta_rs_ray.ops.queries import QUERIES
    from kafka_delta_rs_ray.pipelines.lifecycle import maintenance_lifecycle

    # rows-only (non-SQL-expressible) maintenance lifecycle: stage
    # summary over the synthetic image table (deterministic per seed).
    # It leads the dict so the flagship sits inside the driver's
    # 50-entry CORRECTNESS window (see QUERIES ordering note).
    q = {
        "image_maintenance_lifecycle":
            lambda sf_dir: maintenance_lifecycle(n_rows=300, n_changes=80),
    }
    q.update(QUERIES)
    return q


def oracle_sql() -> dict[str, str]:
    """DuckDB oracles for every SQL-expressible query (same column
    names as the Ray results). Non-SQL ops (maintenance lifecycle,
    LSH/simhash pairs, lang-id, fingerprints, IVF ANN) are omitted →
    rows-only checks."""
    from kafka_delta_rs_ray.ops.queries import ORACLES

    return dict(ORACLES)
