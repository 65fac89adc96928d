"""Format core: create/append/scan round-trip, snapshot isolation,
commit CAS conflict behavior (the reference's flush/commit tests,
src/pipeline/mod.rs:252-385, translated to table maintenance)."""

import os

import numpy as np
import pyarrow as pa
import pytest

from kafka_delta_rs_ray.codecs import decode
from kafka_delta_rs_ray.errors import CommitConflict, StateError
from kafka_delta_rs_ray.functions import psnr
from kafka_delta_rs_ray.pipelines.ingest import append
from kafka_delta_rs_ray.pipelines.synth import image_dataset, make_row
from kafka_delta_rs_ray.tablefmt import IMAGE_SCHEMA, Manifest, Table


@pytest.fixture
def table(tmp_path):
    return Table.create(str(tmp_path / "t"), IMAGE_SCHEMA)


def test_create_and_load(table):
    t2 = Table(table.root)
    assert t2.latest_version() == 0
    m = t2.read_manifest()
    assert m.kind == "create"
    assert m.schema.equals(IMAGE_SCHEMA)
    assert m.fragments == []
    with pytest.raises(StateError):
        Table("/tmp/definitely-not-a-table-xyz")


def test_append_scan_roundtrip(table, ray_session):
    ds = image_dataset(100, seed=42, batch_size=40)
    m = append(table, ds, target_fragment_rows=40)
    assert m.version == 1 and m.kind == "append"
    assert sum(f.rows for f in m.fragments) == 100
    assert len(m.fragments) >= 2  # batch_size 40 → ≥3 fragments

    snap = table.snapshot()
    out = snap.dataset()
    assert out.count() == 100
    tbl = snap.to_arrow()
    assert tbl.num_rows == 100
    ids = sorted(tbl["image_id"].to_pylist())
    assert ids[0] == "img-0000000000" and len(set(ids)) == 100

    # decoded-pixel invariant: every stored row decodes to >= 40 dB vs source
    idx = {i: n for n, i in enumerate(tbl["image_id"].to_pylist())}
    for rid in (0, 1, 57):
        r = make_row(rid, 42)
        n = idx[f"img-{rid:010d}"]
        rec = decode(tbl["bytes"][n].as_py(), tbl["fmt"][n].as_py())
        assert psnr(r["img"], rec) >= 40.0
        if tbl["fmt"][n].as_py() == "rawz":
            assert np.array_equal(rec, r["img"])


def test_zone_map_stats_present(table, ray_session):
    append(table, image_dataset(60, batch_size=30), target_fragment_rows=30)
    m = table.read_manifest()
    for f in m.fragments:
        assert "image_id" in f.stats and "phash" in f.stats and "w" in f.stats
        assert f.stats["w"]["min"] >= 32 and f.stats["w"]["max"] <= 256
        assert "bytes" not in f.stats  # no zone maps on binary


def test_column_projection_scan(table, ray_session):
    append(table, image_dataset(50, batch_size=25), target_fragment_rows=25)
    ds = table.snapshot().dataset(columns=["image_id", "caption"])
    sch = ds.schema()
    assert sch.names == ["image_id", "caption"]
    assert ds.count() == 50


def test_snapshot_isolation(table, ray_session):
    append(table, image_dataset(30, batch_size=30), target_fragment_rows=30)
    snap1 = table.snapshot()  # version 1
    append(table, image_dataset(20, seed=99, batch_size=20).map_batches(
        lambda b: b.set_column(0, "image_id",
                               pa.array([f"x-{i}" for i in range(b.num_rows)])),
        batch_format="pyarrow"), target_fragment_rows=20)
    assert table.latest_version() == 2
    # the old snapshot still sees exactly its 30 rows
    assert snap1.to_arrow().num_rows == 30
    assert table.snapshot().to_arrow().num_rows == 50


def test_commit_conflict_retry(table):
    """Loser re-runs its builder against the fresh manifest (optimistic
    concurrency; reference retry loop src/kafka/mod.rs:192-228)."""
    calls = []

    def sneaky_build(latest: Manifest) -> Manifest:
        calls.append(latest.version)
        if len(calls) == 1:
            # simulate a concurrent winner between read and publish
            table.commit(lambda l: Manifest(-1, None, "append", l.schema,
                                            list(l.fragments), l.txn, l.properties))
        return Manifest(-1, None, "append", latest.schema,
                        list(latest.fragments), latest.txn,
                        dict(latest.properties, who="me"))

    m = table.commit(sneaky_build)
    assert calls == [0, 1]  # second attempt saw the interloper's version
    assert m.version == 2
    assert table.read_manifest().properties["who"] == "me"


def test_commit_conflict_exhausts(table):
    def always_lose(latest: Manifest) -> Manifest:
        table.commit(lambda l: Manifest(-1, None, "append", l.schema,
                                        list(l.fragments), l.txn, l.properties))
        return Manifest(-1, None, "append", latest.schema, [], latest.txn, {})

    with pytest.raises(CommitConflict):
        table.commit(always_lose, max_attempts=2)


def test_commit_noop(table):
    assert table.commit(lambda latest: None) is None
    assert table.latest_version() == 0


# inline lambdas below are cloudpickled by value (a module-level helper
# would be pickled by reference, which workers can't import from tests/)
def _license_ds(n, seed, prefix):
    return image_dataset(n, seed=seed, batch_size=n).map_batches(
        lambda b: b.set_column(
            0, "image_id",
            pa.array([f"{prefix}-{i}" for i in range(b.num_rows)])
        ).append_column(
            "license", pa.array(["cc0"] * b.num_rows, pa.string())),
        batch_format="pyarrow")


def test_schema_evolution_merge_schema(table, ray_session):
    """Reference W2: Insert → Default rejects new columns; Upsert →
    MergeSchema evolves (src/pipeline/mod.rs:224-227). Old fragments
    surface nulls for the new column in every read path."""
    from kafka_delta_rs_ray.errors import ValidationError

    append(table, image_dataset(30, batch_size=30), target_fragment_rows=30)
    extra = _license_ds(10, 99, "x")

    with pytest.raises(ValidationError):
        append(table, extra, target_fragment_rows=10)  # mode="default"

    m = append(table, extra, target_fragment_rows=10, mode="merge_schema")
    assert m.schema.field("license").type == pa.string()
    assert m.properties.get("schema_evolved") is True

    tbl = table.snapshot().to_arrow().sort_by("image_id")
    assert tbl.num_rows == 40 and "license" in tbl.column_names
    lic = tbl["license"].to_pylist()
    assert lic.count("cc0") == 10 and lic.count(None) == 30

    # distributed scan conforms too, including projections
    ds = table.snapshot().dataset(columns=["image_id", "license"])
    assert ds.count() == 40
    got = ds.take_all()
    assert sum(1 for r in got if r["license"] == "cc0") == 10

    # type conflict is rejected in either mode
    bad = image_dataset(5, seed=3, batch_size=5).map_batches(
        lambda b: b.append_column("license",
                                  pa.array([1] * b.num_rows, pa.int64())),
        batch_format="pyarrow")
    with pytest.raises(ValidationError):
        append(table, bad, target_fragment_rows=5, mode="merge_schema")


def test_schema_evolution_cleared_by_cluster(table, ray_session):
    from kafka_delta_rs_ray.pipelines.cluster import cluster

    append(table, image_dataset(20, batch_size=20), target_fragment_rows=20)
    append(table, _license_ds(5, 98, "y"), target_fragment_rows=5,
           mode="merge_schema")
    before = table.snapshot().to_arrow().sort_by("image_id")

    cluster(table, target_fragment_rows=16)
    m = table.read_manifest()
    assert "schema_evolved" not in m.properties  # full rewrite conformed
    after = table.snapshot().to_arrow().sort_by("image_id")
    assert after.equals(before)


def test_row_filter_pushdown(table, ray_session):
    """row_filter pushes a pyarrow.dataset expression into the parquet
    scan (inside fragments), composing with zone-map pruning; results
    equal post-hoc filtering — including through the delete-aware path."""
    import pyarrow.dataset as pads

    from kafka_delta_rs_ray.pipelines.delete import delete_where

    append(table, image_dataset(80, batch_size=20), target_fragment_rows=20)
    full = table.snapshot().to_arrow()
    expected = full.filter(pa.compute.greater_equal(full["w"], 128))

    ds = table.snapshot().dataset(row_filter=pads.field("w") >= 128)
    got = pa.Table.from_pylist(ds.take_all(), schema=full.schema)
    assert got.sort_by("image_id").equals(expected.sort_by("image_id"))

    # dirty path: add deletion vectors, filter must still apply
    delete_where(table, {"h": (None, 40)})
    snap = table.snapshot()
    full2 = snap.to_arrow()
    exp2 = full2.filter(pa.compute.greater_equal(full2["w"], 128))
    got2 = pa.Table.from_pylist(
        snap.dataset(row_filter=pads.field("w") >= 128).take_all(),
        schema=full2.schema)
    assert got2.sort_by("image_id").equals(exp2.sort_by("image_id"))


def test_history(table, ray_session):
    append(table, image_dataset(20, batch_size=20), target_fragment_rows=20)
    h = table.history()
    assert [r["version"] for r in h] == [1, 0]
    assert h[0]["kind"] == "append" and h[1]["kind"] == "create"
    assert h[0]["rows"] == 20 and h[0]["parent"] == 0
    assert h[0]["committed_at"] >= h[1]["committed_at"]


# ------------------------------------------------------- nested types
def test_nested_list_table_roundtrip(tmp_path, ray_session):
    """A derived table whose schema carries a list<float32> column (the
    ImageEmbed stage's output) round-trips through append → commit →
    snapshot scan, including the dirty-fragment (delete-filter) read
    path. Reference parity: recursive List columns via the builder
    factory (src/utils/mod.rs:168-206, 208-334)."""
    import ray.data as rd

    from kafka_delta_rs_ray.stages.codec_stage import ImageEmbed

    t = Table.create(str(tmp_path / "emb"), ImageEmbed.OUTPUT_SCHEMA)
    src = image_dataset(40, batch_size=20)
    embedded = src.map_batches(ImageEmbed(grid=4), batch_format="pyarrow",
                               batch_size=20)
    m = append(t, embedded, target_fragment_rows=20)
    assert m.version == 1

    out = t.snapshot().to_arrow().sort_by("image_id")
    assert out.num_rows == 40
    assert out.schema.field("embedding").type == pa.list_(pa.float32())
    first = out["embedding"][0].as_py()
    assert len(first) == 16 and abs(sum(first)) < 1e-3  # mean-centered
    # deterministic: recompute one embedding from source pixels
    expected = ImageEmbed(grid=4)(_row_table(0))
    got0 = out.filter(
        pa.compute.equal(out["image_id"], "img-0000000000"))
    assert got0["embedding"][0].as_py() == expected["embedding"][0].as_py()
    # zone maps skip the nested column, keep the flat key
    for f in m.fragments:
        assert "embedding" not in f.stats
        assert "image_id" in f.stats


def _row_table(rid: int) -> pa.Table:
    from kafka_delta_rs_ray.codecs import encode
    from kafka_delta_rs_ray.functions.phash import phash64
    from kafka_delta_rs_ray.pipelines.synth import make_row

    r = make_row(rid, 42)
    return pa.Table.from_pylist([{
        "image_id": f"img-{rid:010d}", "bytes": encode(r["img"], r["fmt"]),
        "w": r["w"], "h": r["h"], "fmt": r["fmt"],
        "caption": f"test row {rid}", "phash": phash64(r["img"])}],
        schema=IMAGE_SCHEMA)


def test_nested_list_schema_evolution(table, ray_session):
    """merge_schema evolution ADDING a list<float32> column: new
    fragments carry it, old fragments surface nulls for it, and the
    conform path (null-fill + reorder) handles the nested type."""
    import ray.data as rd

    append(table, image_dataset(30, batch_size=30), target_fragment_rows=30)

    evolved_schema = pa.schema(list(IMAGE_SCHEMA)
                               + [pa.field("embedding",
                                           pa.list_(pa.float32()))])
    rows = []
    for rid in range(100, 110):
        d = _row_table(rid).to_pylist()[0]
        d["embedding"] = [float(rid), 1.5, -2.25]
        rows.append(d)
    new = rd.from_arrow(pa.Table.from_pylist(rows, schema=evolved_schema))
    m = append(table, new, mode="merge_schema", target_fragment_rows=10)
    assert m.schema.field("embedding").type == pa.list_(pa.float32())

    out = table.snapshot().to_arrow().sort_by("image_id")
    assert out.num_rows == 40
    embs = dict(zip(out["image_id"].to_pylist(),
                    out["embedding"].to_pylist()))
    assert embs["img-0000000000"] is None           # old fragment: null
    assert embs["img-0000000105"] == [105.0, 1.5, -2.25]

    # evolved projection that includes the nested col also works
    proj = table.snapshot().dataset(columns=["image_id", "embedding"])
    assert proj.count() == 40


def test_nested_map_column_roundtrip(tmp_path, ray_session):
    """Map<K,V> parity (reference src/utils/mod.rs:168-206 builds Map
    columns; keys restricted to hashable types): a map<string,int64>
    column survives append → scan."""
    import ray.data as rd

    schema = pa.schema([pa.field("media_id", pa.string()),
                        pa.field("attrs", pa.map_(pa.string(), pa.int64()))])
    t = Table.create(str(tmp_path / "m"), schema)
    tbl = pa.table({
        "media_id": pa.array(["a", "b"], pa.string()),
        "attrs": pa.array([[("x", 1), ("y", 2)], [("z", 3)]],
                          pa.map_(pa.string(), pa.int64()))})
    append(t, rd.from_arrow(tbl), target_fragment_rows=10)
    out = t.snapshot().to_arrow().sort_by("media_id")
    assert out["attrs"].to_pylist() == [[("x", 1), ("y", 2)], [("z", 3)]]
    assert "attrs" not in t.read_manifest().fragments[0].stats


def test_nested_list_type_mismatch_rejected(table, ray_session):
    """Evolution with a CONFLICTING nested type errors early."""
    from kafka_delta_rs_ray.errors import ValidationError
    from kafka_delta_rs_ray.tablefmt.schema import merge_schemas

    with pytest.raises(ValidationError):
        merge_schemas(
            pa.schema([pa.field("e", pa.list_(pa.float32()))]),
            pa.schema([pa.field("e", pa.list_(pa.int64()))]))


def test_date32_column_roundtrip_and_pruning(tmp_path, ray_session):
    """Date32 semantics (reference parity WITHOUT the reference's bug:
    its builder factory panics on a date column, src/utils/mod.rs:201-205
    vs 256-261 — SURVEY §7.4 known-bad list): a date column round-trips,
    gets ISO-string zone maps (lexicographic = chronological, so range
    pruning works with ISO strings), and prunes fragments correctly."""
    import datetime

    import ray.data as rd

    schema = pa.schema([("media_id", pa.string()),
                        ("shot_date", pa.date32()),
                        ("n", pa.int64())])
    t = Table.create(str(tmp_path / "d"), schema)
    d = datetime.date
    tbl = pa.table({
        "media_id": pa.array(["a", "b", "c", "x", "y", "z"]),
        "shot_date": pa.array([d(2024, 1, 1), d(2024, 6, 15), d(2024, 12, 31),
                               d(2025, 3, 2), d(2025, 7, 7), d(2025, 11, 30)],
                              pa.date32()),
        "n": pa.array(range(6), pa.int64())})
    m = append(t, rd.from_arrow(tbl), target_fragment_rows=3)  # 2 fragments
    assert len(m.fragments) == 2
    for f in m.fragments:
        assert f.stats["shot_date"]["min"] < f.stats["shot_date"]["max"]

    out = t.snapshot().to_arrow().sort_by("media_id")
    assert out["shot_date"].to_pylist() == tbl.sort_by("media_id")[
        "shot_date"].to_pylist()

    snap = t.snapshot()
    only_2024 = snap._select_fragments({"shot_date": (None, "2024-12-31")})
    assert len(only_2024) == 1
    none = snap._select_fragments({"shot_date": ("2026-01-01", None)})
    assert none == []
    pruned = snap.to_arrow(prune={"shot_date": ("2025-01-01", None)})
    assert set(pruned["media_id"].to_pylist()) == {"x", "y", "z"}


def test_timestamp_time_travel(table, ray_session):
    """snapshot(as_of=ts): latest version committed at or before ts —
    the timestamp flavor of time travel (version flavor already
    pinned by test_snapshot_isolation)."""
    import time as _time

    append(table, image_dataset(30, batch_size=30), target_fragment_rows=30)
    t_mid = _time.time()
    _time.sleep(0.05)
    append(table, image_dataset(10, seed=5, batch_size=10).map_batches(
        lambda b: b.set_column(0, "image_id", pa.array(
            [f"tt-{i}" for i in range(b.num_rows)])), batch_format="pyarrow"),
        target_fragment_rows=10)

    assert table.snapshot(as_of=t_mid).to_arrow().num_rows == 30
    assert table.snapshot(as_of=_time.time()).to_arrow().num_rows == 40
    with pytest.raises(StateError):
        table.snapshot(as_of=1.0)  # before the table existed
    with pytest.raises(ValueError):
        table.snapshot(version=1, as_of=t_mid)


def test_nested_column_parquet_compression(tmp_path, ray_session):
    """Parquet keys per-column codecs by LEAF path: a compression map
    keyed by top-level field names silently writes nested columns
    (list<float32> embeddings, map attrs) UNCOMPRESSED. Pin that every
    non-payload leaf chunk is ZSTD and payload leaves follow
    PAYLOAD_COMPRESSION."""
    import pyarrow.parquet as pq

    from kafka_delta_rs_ray.tablefmt.fragments import (
        PAYLOAD_COMPRESSION, write_fragment_table)

    schema = pa.schema([
        pa.field("image_id", pa.string()),
        pa.field("bytes", pa.large_binary()),
        pa.field("embedding", pa.list_(pa.float32())),
        pa.field("attrs", pa.map_(pa.string(), pa.int64())),
    ])
    tbl = pa.table({
        "image_id": [f"i{i}" for i in range(100)],
        "bytes": [b"x" * 64] * 100,
        "embedding": [[0.5] * 16] * 100,
        "attrs": [[("k", 1)]] * 100,
    }, schema=schema)
    root = str(tmp_path / "nc")
    os.makedirs(os.path.join(root, "data"))
    frag = write_fragment_table(tbl, root, "run1")

    rg = pq.ParquetFile(os.path.join(root, frag.path)).metadata.row_group(0)
    codecs = {rg.column(i).path_in_schema: rg.column(i).compression
              for i in range(rg.num_columns)}
    expect_payload = ("UNCOMPRESSED" if PAYLOAD_COMPRESSION == "none"
                      else PAYLOAD_COMPRESSION.upper())
    assert codecs["bytes"] == expect_payload
    for leaf in ("image_id", "embedding.list.element",
                 "attrs.key_value.key", "attrs.key_value.value"):
        assert codecs[leaf] == "ZSTD", (leaf, codecs)


def test_map_column_schema_evolution(tmp_path, ray_session):
    """merge_schema evolution ADDING a map<string,int64> column
    (reference treats Map as first-class in its builder factory,
    src/utils/mod.rs:190-200,297-327): new fragments carry it, OLD
    fragments null-fill it on read, and a projection including the map
    column scans clean."""
    import ray.data as rd

    schema = pa.schema([pa.field("media_id", pa.string()),
                        pa.field("n", pa.int64())])
    t = Table.create(str(tmp_path / "me"), schema)
    append(t, rd.from_arrow(pa.table({
        "media_id": pa.array(["a", "b"], pa.string()),
        "n": pa.array([1, 2], pa.int64())})), target_fragment_rows=10)

    evolved = pa.schema(list(schema)
                        + [pa.field("attrs",
                                    pa.map_(pa.string(), pa.int64()))])
    new = pa.table({
        "media_id": pa.array(["c", "d"], pa.string()),
        "n": pa.array([3, 4], pa.int64()),
        "attrs": pa.array([[("x", 1)], [("y", 2), ("z", 3)]],
                          pa.map_(pa.string(), pa.int64()))}).cast(evolved)
    m = append(t, rd.from_arrow(new), mode="merge_schema",
               target_fragment_rows=10)
    assert m.schema.field("attrs").type == pa.map_(pa.string(), pa.int64())

    out = t.snapshot().to_arrow().sort_by("media_id")
    attrs = dict(zip(out["media_id"].to_pylist(),
                     out["attrs"].to_pylist()))
    assert attrs["a"] is None and attrs["b"] is None  # old frags: null
    assert attrs["c"] == [("x", 1)]
    assert attrs["d"] == [("y", 2), ("z", 3)]
    proj = t.snapshot().dataset(columns=["media_id", "attrs"])
    assert proj.count() == 4


def test_leaf_paths_match_parquet_column_paths(tmp_path):
    """fragment_compression keys must be exactly the leaf paths parquet
    itself uses (ADVICE round 2: a map keyed by top-level names left
    nested columns silently uncompressed). Pin _leaf_paths against the
    paths pyarrow actually writes for a deeply nested schema."""
    import pyarrow.parquet as pq

    from kafka_delta_rs_ray.tablefmt.fragments import fragment_compression

    schema = pa.schema([
        pa.field("id", pa.string()),
        pa.field("emb", pa.list_(pa.float32())),
        pa.field("attrs", pa.map_(pa.string(), pa.int64())),
        pa.field("meta", pa.struct([("w", pa.int32()),
                                    ("tags", pa.list_(pa.string()))])),
    ])
    tbl = pa.table({
        "id": pa.array(["a"], pa.string()),
        "emb": pa.array([[1.0]], pa.list_(pa.float32())),
        "attrs": pa.array([[("k", 1)]], pa.map_(pa.string(), pa.int64())),
        "meta": pa.array([{"w": 2, "tags": ["t"]}], schema.field("meta").type),
    })
    p = str(tmp_path / "leaf.parquet")
    pq.write_table(tbl, p)
    md = pq.ParquetFile(p).metadata
    actual = {md.row_group(0).column(i).path_in_schema
              for i in range(md.num_columns)}
    computed = set(fragment_compression(schema))
    assert computed == actual, (computed - actual, actual - computed)


# -------------------------------------------------------------- branches
def test_branch_isolation_and_ff_merge(table, ray_session):
    """Writable branch: commits on the branch never touch main; a
    fast-forward merge publishes the branch state (and its txn
    ledger) as main's next version."""
    append(table, image_dataset(30, batch_size=30),
           target_fragment_rows=30)
    b = table.create_branch("dev")
    assert table.branches() == ["dev"]
    assert b.snapshot().dataset().count() == 30  # seeded from main

    extra = image_dataset(10, seed=7, batch_size=10).map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("image_id"), "image_id",
            [[f"dev-{x}" for x in t["image_id"].to_pylist()]]),
        batch_format="pyarrow")
    append(b, extra, target_fragment_rows=10)
    assert b.snapshot().dataset().count() == 40
    assert table.snapshot().dataset().count() == 30  # main untouched
    assert table.latest_version() == 1

    m = table.merge_branch("dev")
    assert m.kind == "branch_merge"
    assert m.properties["merged_branch"] == "dev"
    assert table.snapshot().dataset().count() == 40
    ids = set(table.snapshot().dataset().select_columns(
        ["image_id"]).to_pandas()["image_id"])
    assert any(i.startswith("dev-") for i in ids)


def test_branch_merge_conflict_and_noop(table, ray_session):
    append(table, image_dataset(20, batch_size=20),
           target_fragment_rows=20)
    table.create_branch("idle")  # no commits on it → merge is a no-op
    assert table.merge_branch("idle") is None

    b = table.create_branch("stale")
    append(b, image_dataset(5, seed=3, batch_size=5),
           target_fragment_rows=5)
    # main advances past the fork point → fast-forward impossible
    append(table, image_dataset(5, seed=4, batch_size=5),
           target_fragment_rows=5)
    from kafka_delta_rs_ray.errors import CommitConflict
    with pytest.raises(CommitConflict, match="fork point"):
        table.merge_branch("stale")


def test_branch_guards(table):
    with pytest.raises(Exception, match="bad branch name"):
        table.create_branch("no/slashes")
    table.create_branch("dup")
    from kafka_delta_rs_ray.errors import StateError
    with pytest.raises(StateError, match="already exists"):
        table.create_branch("dup")
    with pytest.raises(StateError, match="nested"):
        table.branch("dup").create_branch("nested")
    with pytest.raises(StateError, match="no such branch"):
        table.branch("ghost")


def test_expire_retains_branch_closure(table, ray_session):
    """Expire on main must keep files that only a branch references —
    and sweep them once the branch is deleted."""
    from kafka_delta_rs_ray.pipelines.expire import expire

    append(table, image_dataset(20, batch_size=20),
           target_fragment_rows=20)
    b = table.create_branch("keepme")
    append(b, image_dataset(6, seed=9, batch_size=6).map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("image_id"), "image_id",
            [[f"br-{x}" for x in t["image_id"].to_pylist()]]),
        batch_format="pyarrow"), target_fragment_rows=6)
    branch_frag_paths = [f.path for f in b.read_manifest().fragments
                         if f.path not in
                         {g.path for g in table.read_manifest().fragments}]
    assert branch_frag_paths
    # churn main so expire has something to drop
    append(table, image_dataset(4, seed=5, batch_size=4),
           target_fragment_rows=4)
    rep = expire(table, keep_last=1, min_age_seconds=0)
    for p in branch_frag_paths:
        assert p not in rep["removed_files"]
    assert b.snapshot().dataset().count() == 26  # branch scan intact

    table.delete_branch("keepme")
    assert table.branches() == []
    rep2 = expire(table, keep_last=1, min_age_seconds=0)
    for p in branch_frag_paths:
        assert p in rep2["removed_files"]


def test_expire_on_branch_handle_keeps_main(table, ray_session):
    from kafka_delta_rs_ray.pipelines.expire import expire

    append(table, image_dataset(12, batch_size=12),
           target_fragment_rows=12)
    b = table.create_branch("work")
    for s in (21, 22):
        append(b, image_dataset(3, seed=s, batch_size=3).map_batches(
            lambda t, s=s: t.set_column(
                t.schema.get_field_index("image_id"), "image_id",
                [[f"w{s}-{x}" for x in t["image_id"].to_pylist()]]),
            batch_format="pyarrow"), target_fragment_rows=3)
    rep = expire(b, keep_last=1, min_age_seconds=0)
    assert rep["expired_versions"]  # old branch versions dropped
    assert table.snapshot().dataset().count() == 12  # main intact
    assert b.snapshot().dataset().count() == 18


def test_create_branch_persists_fork_point(table, ray_session):
    """The fork version is durable branch metadata, not inferred from
    the oldest retained manifest (which expire can sweep)."""
    import json

    append(table, image_dataset(10, batch_size=10),
           target_fragment_rows=10)
    table.create_branch("meta")
    meta = os.path.join(table.root, "manifest", "branches", "meta",
                        ".branch.json")
    with open(meta) as f:
        doc = json.load(f)
    assert doc["fork_version"] == 1
    assert doc["name"] == "meta"


def test_merge_branch_fork_survives_branch_expire(table, ray_session):
    """ADVICE r4 (high): after expire(keep_last=1) on the branch line
    sweeps the seed manifest, the fork point must NOT inflate to the
    oldest retained branch version — a merge while main has advanced
    past the true fork must still raise CommitConflict instead of
    silently dropping main's post-fork commits."""
    from kafka_delta_rs_ray.pipelines.expire import expire

    append(table, image_dataset(10, batch_size=10),
           target_fragment_rows=10)          # main v1
    b = table.create_branch("ff")            # fork at v1
    for s in (31, 32):                       # branch v2, v3
        append(b, image_dataset(3, seed=s, batch_size=3).map_batches(
            lambda t, s=s: t.set_column(
                t.schema.get_field_index("image_id"), "image_id",
                [[f"b{s}-{x}" for x in t["image_id"].to_pylist()]]),
            batch_format="pyarrow"), target_fragment_rows=3)
    # main advances past the fork — its rows must never be lost
    append(table, image_dataset(4, seed=33, batch_size=4).map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("image_id"), "image_id",
            [[f"m-{x}" for x in t["image_id"].to_pylist()]]),
        batch_format="pyarrow"), target_fragment_rows=4)  # main v2
    # sweep the branch's seed manifest: oldest retained version is now
    # the branch head, which would fool a bvs[0]-derived fork guess
    expire(b, keep_last=1, min_age_seconds=0)
    assert b.versions()[0] > 1
    with pytest.raises(CommitConflict, match="fork point"):
        table.merge_branch("ff")
    # main rows intact
    ids = set(table.snapshot().dataset().select_columns(
        ["image_id"]).to_pandas()["image_id"])
    assert any(i.startswith("m-") for i in ids)


def test_create_branch_verifies_fork_closure(table, ray_session):
    """ADVICE r4 (medium): create_branch verifies the fork version's
    file closure post-publish and withdraws the branch if a concurrent
    expire already swept it (simulated by unlinking a fragment)."""
    append(table, image_dataset(8, batch_size=8),
           target_fragment_rows=8)
    frag = table.read_manifest().fragments[0]
    os.unlink(table.abspath(frag.path))  # simulate a mid-race sweep
    with pytest.raises(StateError, match="expired while branching"):
        table.create_branch("broken")
    assert table.branches() == []  # withdrawn, not half-created


def test_drop_column_metadata_only(table, ray_session):
    """ALTER TABLE DROP COLUMN: one metadata commit hides the column
    from every read path (fragments untouched on disk); guards reject
    the key column, unknown columns, and constraint-referenced
    columns; the next compaction physically reclaims the bytes."""
    import os

    import pyarrow.parquet as pq

    from kafka_delta_rs_ray.errors import StateError
    from kafka_delta_rs_ray.pipelines.compact import compact

    append(table, image_dataset(40, batch_size=10),
           target_fragment_rows=10)
    before = table.snapshot().to_arrow().sort_by("image_id")

    m = table.drop_column("caption")
    assert m.kind == "alter" and "caption" not in m.schema.names
    assert m.properties.get("schema_evolved") is True
    # fragments untouched (metadata-only), column invisible to scans
    frag0 = m.fragments[0]
    assert "caption" in pq.read_schema(table.abspath(frag0.path)).names
    after = table.snapshot().to_arrow().sort_by("image_id")
    assert "caption" not in after.column_names
    assert after.equals(before.drop_columns(["caption"]))
    # distributed scan + projection agree
    ds = table.snapshot().dataset(columns=["image_id", "w"])
    assert ds.count() == 40

    # guards
    with pytest.raises(StateError, match="key column"):
        table.drop_column("image_id")
    with pytest.raises(StateError, match="no such column"):
        table.drop_column("nope")
    table.add_constraint({"name": "w_pos", "col": "w", "op": ">",
                          "value": 0})
    with pytest.raises(StateError, match="referenced by constraint"):
        table.drop_column("w")

    # compaction conforms mixed generations and reclaims the bytes
    mc = compact(table, target_bytes=64 << 20)
    assert mc is not None
    for f in mc.fragments:
        assert "caption" not in pq.read_schema(table.abspath(f.path)).names
    assert table.snapshot().to_arrow().sort_by("image_id").equals(
        before.drop_columns(["caption"]))


def test_compact_across_evolved_generations(table, ray_session):
    """Compaction bins can mix fragments written before and after a
    merge_schema ADD: each input conforms to the manifest schema
    inside the rewrite (old rows null-filled), so the streaming
    writer never sees a schema mismatch and the scan is identical
    before/after."""
    from kafka_delta_rs_ray.pipelines.compact import compact

    append(table, image_dataset(30, batch_size=10),
           target_fragment_rows=10)
    append(table, _license_ds(10, 99, "gen2"), target_fragment_rows=10,
           mode="merge_schema")
    before = table.snapshot().to_arrow().sort_by("image_id")
    assert before["license"].to_pylist().count(None) == 30

    m = compact(table, target_bytes=64 << 20)
    assert m is not None
    after = table.snapshot().to_arrow().sort_by("image_id")
    assert after.equals(before)
