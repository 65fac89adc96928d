"""Maintenance autopilot: metadata signals → thresholded decisions →
actions, then quiescence (a second pass after acting decides nothing)."""

import pyarrow as pa
import pytest

import ray.data as rd

from kafka_delta_rs_ray.pipelines.autopilot import autopilot
from kafka_delta_rs_ray.pipelines.ingest import append
from kafka_delta_rs_ray.pipelines.merge import merge
from kafka_delta_rs_ray.pipelines.synth import image_dataset
from kafka_delta_rs_ray.tablefmt import IMAGE_SCHEMA, Table
from kafka_delta_rs_ray.tablefmt.schema import CHANGESET_SCHEMA

from test_parity import _chrow


@pytest.fixture
def table(tmp_path, ray_session):
    t = Table.create(str(tmp_path / "t"), IMAGE_SCHEMA)
    # many small fragments, never clustered → overlapping phash ranges
    append(t, image_dataset(120, batch_size=20), target_fragment_rows=20)
    return t


def test_autopilot_cluster_then_quiesce(table):
    """Fresh unclustered table: phash point-selectivity is high →
    cluster fires first (subsuming compact); the loop reaches
    QUIESCENCE within a bounded number of passes (cluster may leave
    packable zcode runs for one compact pass) and then decides
    nothing."""
    pre = autopilot(table, dry_run=True, keep_last=50)
    jobs = [d["job"] for d in pre["decisions"]]
    assert jobs == ["cluster"], pre
    assert pre["actions"] == [] and table.latest_version() == 1  # dry run

    out = autopilot(table, keep_last=50)
    acted = [a["job"] for a in out["actions"]]
    assert acted == ["cluster"]
    assert out["actions"][0]["committed_version"] == 2

    for _ in range(2):  # at most one follow-up compact, then quiet
        again = autopilot(table, keep_last=50)
        if not again["decisions"]:
            break
        assert [d["job"] for d in again["decisions"]] == ["compact"]
    final = autopilot(table, dry_run=True, keep_last=50)
    assert final["decisions"] == [], final["signals"]
    # selectivity only binds past the fragment floor — a 1-fragment
    # table trivially "scans everything" and must not re-trigger
    s = final["signals"]
    assert s["fragments"] < 4 or s["point_selectivity"] <= 0.25


def test_autopilot_compact_on_delete_debt(table):
    """Delete debt (not layout) is the trigger: after clustering, a
    delete-heavy merge pushes deleted_rows/rows past the threshold →
    compact fires and clears it."""
    autopilot(table, keep_last=50)  # cluster first → good layout
    dels = [_chrow(f"img-{i:010d}", i + 1, "x", op="delete")
            for i in range(20)]  # 20/120 ≈ 17% debt
    merge(table, rd.from_arrow(pa.Table.from_pylist(
        dels, schema=CHANGESET_SCHEMA)), app_id="ap")

    out = autopilot(table, keep_last=50)
    acted = [a["job"] for a in out["actions"]]
    assert acted == ["compact"], out
    assert autopilot(table, dry_run=True,
                     keep_last=50)["signals"]["delete_debt"] == 0.0


def test_autopilot_expire_and_cli(table, tmp_path):
    """Version pileup triggers expire (with the min-age guard passed
    through); the CLI job surfaces the same report."""
    out = autopilot(table, keep_last=1, min_age_seconds=0)
    jobs = [a["job"] for a in out["actions"]]
    assert "expire" in jobs and "cluster" in jobs
    assert len(table.history()) == 1

    from kafka_delta_rs_ray.config import MaintenanceConfig
    from kafka_delta_rs_ray.run import run

    cfgp = tmp_path / "ap.yaml"
    cfgp.write_text(f"table_root: {table.root}\njob: autopilot\n"
                    "options:\n  dry_run: true\n")
    rep = run(MaintenanceConfig.load(str(cfgp)))
    assert rep["job"] == "autopilot" and rep["dry_run"]
    assert {"fragments", "delete_debt", "point_selectivity",
            "versions"} <= set(rep["signals"])


def test_autopilot_tiered_cluster_mode(table):
    """Tiered policy: a never-clustered table takes the FULL rewrite;
    a clustered table with a small unsorted append takes the
    INCREMENTAL path (sorted fragments keep their identity); and
    after acting, the layout quiesces."""
    pre = autopilot(table, dry_run=True, keep_last=50)
    assert pre["decisions"][0]["mode"] == "full"  # nothing sorted yet

    out = autopilot(table, keep_last=50)
    assert out["actions"][0]["mode"] == "full"
    sorted_ids = {f.id for f in table.read_manifest().fragments}

    # small append: 20/140 ≈ 14% dirty → incremental
    extra = image_dataset(20, seed=31, batch_size=20).map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("image_id"), "image_id",
            [[f"ap-{x}" for x in t["image_id"].to_pylist()]]),
        batch_format="pyarrow")
    append(table, extra, target_fragment_rows=20)

    # force the trigger regardless of how selective the append left us
    out2 = autopilot(table, keep_last=50, max_point_selectivity=0.0)
    cl = [a for a in out2["actions"] if a["job"] == "cluster"]
    assert cl and cl[0]["mode"] == "incremental", out2
    kept = {f.id for f in table.read_manifest().fragments} & sorted_ids
    assert kept == sorted_ids  # clean sorted fragments untouched

    # large append (dominates the table) → full rewrite again
    big = image_dataset(400, seed=32, batch_size=100).map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("image_id"), "image_id",
            [[f"bg-{x}" for x in t["image_id"].to_pylist()]]),
        batch_format="pyarrow")
    append(table, big, target_fragment_rows=100)
    d = autopilot(table, dry_run=True, keep_last=50,
                  max_point_selectivity=0.0)
    cl = [x for x in d["decisions"] if x["job"] == "cluster"]
    assert cl and cl[0]["mode"] == "full", d
