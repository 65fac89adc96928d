"""Format v2: sharded fragment lists (Iceberg-style manifest files).

Past SHARD_THRESHOLD fragments the version document references
``manifest/fraglist-*.parquet`` shards instead of inlining the list; a
commit reuses unchanged parent shards so commit I/O is O(changed
fragments). Thresholds are monkeypatched low so the tests exercise the
sharded path on small tables; the default threshold keeps small tables
on the v1 inline form.
"""

import json
import os

import pyarrow as pa
import pytest

import kafka_delta_rs_ray.tablefmt.manifest as mf
from kafka_delta_rs_ray.pipelines.compact import compact
from kafka_delta_rs_ray.pipelines.expire import expire
from kafka_delta_rs_ray.pipelines.ingest import append
from kafka_delta_rs_ray.pipelines.merge import merge
from kafka_delta_rs_ray.pipelines.synth import image_dataset
from kafka_delta_rs_ray.tablefmt import IMAGE_SCHEMA, Table


@pytest.fixture
def sharded(monkeypatch):
    monkeypatch.setattr(mf, "SHARD_THRESHOLD", 6)
    monkeypatch.setattr(mf, "SHARD_SIZE", 4)


def _doc(table: Table, version=None) -> dict:
    v = table.latest_version() if version is None else version
    with open(table.manifest_path(v)) as f:
        return json.load(f)


def test_sharded_write_read_roundtrip(tmp_path, ray_session, sharded):
    t = Table.create(str(tmp_path / "t"), IMAGE_SCHEMA)
    append(t, image_dataset(40, batch_size=5), target_fragment_rows=5)

    d = _doc(t)
    assert d["format_version"] == 2
    assert "fragments" not in d and len(d["fragment_lists"]) >= 2
    for desc in d["fragment_lists"]:
        assert os.path.exists(t.abspath(desc["path"]))

    m = t.read_manifest()
    assert len(m.fragments) == 8  # 40 rows / 5 per fragment
    assert m.total_rows() == 40
    assert sum(len(v) for v in m.shard_members.values()) == 8
    # scans read through the sharded manifest unchanged
    assert t.snapshot().to_arrow().num_rows == 40


def test_append_reuses_unchanged_shards(tmp_path, ray_session, sharded):
    t = Table.create(str(tmp_path / "t"), IMAGE_SCHEMA)
    append(t, image_dataset(40, batch_size=5), target_fragment_rows=5)
    shards_v1 = {desc["path"] for desc in _doc(t)["fragment_lists"]}

    extra = image_dataset(8, seed=9, batch_size=8).map_batches(
        lambda b: b.set_column(0, "image_id", pa.array(
            [f"new-{i}" for i in range(b.num_rows)])),
        batch_format="pyarrow")
    append(t, extra, target_fragment_rows=8)
    shards_v2 = {desc["path"] for desc in _doc(t)["fragment_lists"]}

    assert shards_v1 <= shards_v2  # every old shard reused verbatim
    assert len(shards_v2) == len(shards_v1) + 1  # one new shard added
    assert t.snapshot().to_arrow().num_rows == 48


def test_merge_rewrites_only_affected_shards(tmp_path, ray_session, sharded):
    from tests.test_maintenance import _one_key_changeset

    t = Table.create(str(tmp_path / "t"), IMAGE_SCHEMA)
    append(t, image_dataset(40, batch_size=5), target_fragment_rows=5)
    shards_v1 = {desc["path"] for desc in _doc(t)["fragment_lists"]}

    merge(t, _one_key_changeset("img-0000000003", "sharded"), app_id="sm")
    shards_v2 = {desc["path"] for desc in _doc(t)["fragment_lists"]}

    # the shard holding the DV-touched fragment was rewritten; shards
    # whose members are untouched are reused
    assert shards_v1 & shards_v2, "no shard reuse at all"
    assert shards_v2 - shards_v1, "no shard rewritten"
    out = t.snapshot().to_arrow()
    row = [r for r in out.to_pylist() if r["image_id"] == "img-0000000003"]
    assert len(row) == 1 and row[0]["caption"] == "sharded"


def test_expire_sweeps_unreferenced_shards(tmp_path, ray_session, sharded):
    t = Table.create(str(tmp_path / "t"), IMAGE_SCHEMA)
    append(t, image_dataset(40, batch_size=5), target_fragment_rows=5)
    compact(t, target_bytes=64 << 20)  # v2: v1's shards now stale
    stale = {desc["path"] for desc in _doc(t, 1)["fragment_lists"]}
    # compaction shrank the table below the threshold, so the new
    # version legitimately reverts to the inline form (v2 → v1)
    live = {desc["path"]
            for desc in _doc(t).get("fragment_lists", [])}

    rep = expire(t, keep_last=1, min_age_seconds=0)
    for rel in stale - live:
        assert not os.path.exists(t.abspath(rel))
        assert rel in rep["removed_files"]
    for rel in live:
        assert os.path.exists(t.abspath(rel))
    assert t.snapshot().to_arrow().num_rows == 40


def test_sharded_full_lifecycle_scan_identity(tmp_path, ray_session, sharded):
    from kafka_delta_rs_ray.pipelines.cluster import cluster
    from kafka_delta_rs_ray.pipelines.delete import rollback

    t = Table.create(str(tmp_path / "t"), IMAGE_SCHEMA)
    append(t, image_dataset(40, batch_size=5), target_fragment_rows=5)
    before = t.snapshot().to_arrow().sort_by("image_id")
    v1 = t.latest_version()

    compact(t, target_bytes=64 << 20)
    assert t.snapshot().to_arrow().sort_by("image_id").equals(before)
    cluster(t, target_fragment_rows=8)
    assert t.snapshot().to_arrow().sort_by("image_id").equals(before)
    rollback(t, v1)
    assert t.snapshot().to_arrow().sort_by("image_id").equals(before)


def test_small_tables_stay_inline(tmp_path, ray_session):
    """Default threshold: small tables keep the v1 inline form."""
    t = Table.create(str(tmp_path / "t"), IMAGE_SCHEMA)
    append(t, image_dataset(20, batch_size=10), target_fragment_rows=10)
    d = _doc(t)
    assert d["format_version"] == 1 and "fragments" in d


def test_shard_planner_property(tmp_path, sharded):
    """Property test (no Ray): random add/remove/modify sequences over
    the fragment set — after every publish/load cycle the loaded
    fragment set equals the expected set exactly, and shards are
    reused only when every member is unchanged. The ``sharded``
    fixture forces the v2 path (40 fragments ≫ threshold 6)."""
    import random

    from kafka_delta_rs_ray.tablefmt.manifest import (Fragment, Manifest,
                                                      plan_shards)

    rng = random.Random(7)
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "manifest"), exist_ok=True)

    def mk(i, dv=0):
        return Fragment(id=f"f{i}", path=f"data/f{i}.parquet",
                        rows=10, bytes=1000, deleted_rows=dv)

    frags = {i: mk(i) for i in range(40)}
    parent = None
    schema = pa.schema([("x", pa.int64())])
    next_id = 40
    for step in range(12):
        m = Manifest(step, None, "test", schema,
                     fragments=list(frags.values()))
        descs = plan_shards(parent, m, root)
        if len(frags) >= mf.SHARD_THRESHOLD:
            assert descs is not None
        if descs is None:
            loaded = m.fragments
            members = None
        else:
            loaded, members = mf._load_shards(root, descs)
        got = {f.id: (tuple(f.delete_paths), f.deleted_rows)
               for f in loaded}
        want = {f.id: (tuple(f.delete_paths), f.deleted_rows)
                for f in frags.values()}
        assert got == want, f"step {step}: loaded set diverged"
        assert len(loaded) == len(frags)  # no duplicates across shards

        parent = Manifest(step, None, "test", schema,
                          fragments=list(loaded), shard_members=members)
        # mutate: add a few, remove a few, modify (attach DV) a few
        for _ in range(rng.randint(0, 6)):
            frags[next_id] = mk(next_id)
            next_id += 1
        for _ in range(rng.randint(0, 4)):
            if frags:
                frags.pop(rng.choice(list(frags)))
        for _ in range(rng.randint(0, 4)):
            if frags:
                k = rng.choice(list(frags))
                f = frags[k]
                frags[k] = Fragment(id=f.id, path=f.path, rows=f.rows,
                                    bytes=f.bytes,
                                    delete_paths=list(f.delete_paths)
                                    + [f"deletes/d{step}.parquet"],
                                    deleted_rows=f.deleted_rows + 1)


def test_clone_sharded_table(sharded, tmp_path, ray_session):
    """Shallow clone of a SHARDED-manifest table: the clone's v0 writes
    its own shard files under the clone root (plan_shards runs with
    parent=None — source shard paths never leak into the clone), the
    scan is identical, and expiring the source leaves the clone whole."""
    t = Table.create(str(tmp_path / "t"), IMAGE_SCHEMA)
    append(t, image_dataset(60, batch_size=10), target_fragment_rows=5)
    assert len(t.read_manifest().fragments) >= mf.SHARD_THRESHOLD
    with open(t.manifest_path(t.latest_version())) as f:
        assert json.load(f).get("format_version") == 2

    src_rows = t.snapshot().to_arrow().sort_by("image_id")
    c = t.clone(str(tmp_path / "c"))
    with open(c.manifest_path(0)) as f:
        doc = json.load(f)
    assert doc.get("format_version") == 2
    for fl in doc["fragment_lists"]:
        assert os.path.exists(c.abspath(fl["path"])), fl["path"]
    assert c.snapshot().to_arrow().sort_by("image_id").equals(src_rows)

    compact(t, target_bytes=64 << 20)
    expire(t, keep_last=1, min_age_seconds=0)
    assert c.snapshot().to_arrow().sort_by("image_id").equals(src_rows)
