"""Maintenance operators: compact / cluster / expire / merge.

The golden invariant (SURVEY §5, input_hint): after each maintenance
operation, a full scan is row-identical under snapshot isolation —
exact caption/byte equality for lossless rows, and for every row the
decoded pixels stay the same stored bytes (maintenance never
transcodes)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from kafka_delta_rs_ray.pipelines.cluster import cluster
from kafka_delta_rs_ray.pipelines.compact import compact, plan_compaction
from kafka_delta_rs_ray.pipelines.expire import expire
from kafka_delta_rs_ray.pipelines.ingest import append
from kafka_delta_rs_ray.pipelines.merge import merge
from kafka_delta_rs_ray.pipelines.synth import changeset_dataset, image_dataset
from kafka_delta_rs_ray.state.lineage import RunContext
from kafka_delta_rs_ray.tablefmt import IMAGE_SCHEMA, Table

N = 120


def _sorted_rows(t: pa.Table) -> list[dict]:
    return t.sort_by("image_id").to_pylist()


@pytest.fixture
def table(tmp_path, ray_session):
    t = Table.create(str(tmp_path / "t"), IMAGE_SCHEMA)
    append(t, image_dataset(N, batch_size=20), target_fragment_rows=20)
    return t


def test_compact_plan_ffd():
    from kafka_delta_rs_ray.tablefmt.manifest import Fragment, Manifest

    frags = [Fragment(id=f"f{i}", path=f"data/f{i}", rows=10, bytes=b)
             for i, b in enumerate([70, 50, 40, 30, 10])]
    m = Manifest(1, 0, "append", IMAGE_SCHEMA, frags)
    bins = plan_compaction(m, target_bytes=100)
    # FFD: 70+30 | 50+40+10 → two bins, all five fragments packed
    assert len(bins) == 2
    packed = sorted(f for b in bins for f in b["fragment_ids"])
    assert packed == ["f0", "f1", "f2", "f3", "f4"]
    for b in bins:
        assert b["bytes"] <= 100


def test_compact_roundtrip(table):
    before = _sorted_rows(table.snapshot().to_arrow())
    n_frags_before = len(table.read_manifest().fragments)
    m = compact(table, target_bytes=64 << 20)
    assert m is not None and m.kind == "compact"
    assert len(m.fragments) < n_frags_before
    after = _sorted_rows(table.snapshot().to_arrow())
    assert before == after  # golden invariant: scan row-identical


def test_compact_noop_when_compact(table):
    compact(table, target_bytes=64 << 20)
    assert compact(table, target_bytes=10) is None  # all frags >= target*0.8? tiny target → no candidates


def test_compact_resume_skips_done_bins(table):
    run_id = "resume-test-1"
    compact(table, target_bytes=64 << 20, run_id=run_id)
    ctx = RunContext(table.root, run_id, job="compact")
    markers = os.listdir(os.path.join(ctx.dir, "markers", "bin"))
    assert markers  # bins recorded done
    # same run_id again: plan is reused, bins resumed, no second commit
    # (inputs no longer live → builder returns None)
    assert compact(table, target_bytes=64 << 20, run_id=run_id) is None


def test_cluster_roundtrip_and_zonemap_pruning(table):
    before = _sorted_rows(table.snapshot().to_arrow())
    m = cluster(table, target_fragment_rows=30)
    assert m.kind == "cluster"
    after = _sorted_rows(table.snapshot().to_arrow())
    assert before == after

    for f in m.fragments:
        assert f.sorted_by == "zcode"
        assert "zcode" in f.stats  # zone map present though column dropped

    # fragments cover mostly-disjoint zcode ranges → pruning selective:
    # a point-range scan over one fragment's range must skip others
    frags = sorted(m.fragments, key=lambda f: f.stats["zcode"]["min"])
    lo = frags[0].stats["zcode"]["min"]
    hi = frags[0].stats["zcode"]["max"]
    snap = table.snapshot()
    selected = snap._select_fragments({"zcode": (lo, hi)})
    assert len(selected) < len(m.fragments)
    # and the pruned scan returns every row in that zcode range
    sub = snap.to_arrow(prune={"zcode": (lo, hi)})
    assert sub.num_rows >= frags[0].rows


def test_cluster_byte_bounded_fragments(table):
    """target_fragment_bytes bounds each fragment's payload bytes even
    when zcode packs the large-resolution images together (row-count
    slicing alone would emit fragments 25x apart in size)."""
    before = _sorted_rows(table.snapshot().to_arrow())
    target = 256 << 10
    m = cluster(table, target_fragment_rows=1_000_000,
                target_fragment_bytes=target)
    after = _sorted_rows(table.snapshot().to_arrow())
    assert before == after
    # each fragment stays near the byte target: at most target + one
    # row's payload (the row that crossed the budget), parquet framing
    # aside
    max_row = max(len(r["bytes"]) for r in before)
    for f in m.fragments:
        assert f.bytes <= target + max_row + (64 << 10), \
            f"fragment {f.id} is {f.bytes} B against target {target}"
    # and the bound actually split buckets: more than one fragment
    assert len(m.fragments) > 1


def test_cluster_sorted_fragments_have_tight_ranges(table):
    m = cluster(table, target_fragment_rows=30)
    spans = sorted((f.stats["zcode"]["min"], f.stats["zcode"]["max"])
                   for f in m.fragments)
    overlaps = sum(1 for a, b in zip(spans, spans[1:]) if b[0] < a[1])
    # preserve_order write → adjacent fragments shouldn't all overlap
    assert overlaps <= len(spans) // 2


def test_expire_reachability(table):
    compact(table, target_bytes=64 << 20)  # v2: old fragments now unreachable
    old_frag_paths = [f.path for f in table.read_manifest(1).fragments]
    report = expire(table, keep_last=1, min_age_seconds=0)
    assert report["expired_versions"] == [0, 1]
    for rel in old_frag_paths:
        assert not os.path.exists(table.abspath(rel))
        assert rel in report["removed_files"]
    # latest snapshot intact
    assert table.snapshot().to_arrow().num_rows == N
    with pytest.raises(FileNotFoundError):
        table.read_manifest(1)


def test_expire_keeps_retained_closure(table):
    append(table, image_dataset(10, seed=7, batch_size=10).map_batches(
        lambda b: b.set_column(0, "image_id", pa.array(
            [f"zz-{i}" for i in range(b.num_rows)])), batch_format="pyarrow"))
    report = expire(table, keep_last=2, min_age_seconds=0)
    assert report["removed_files"] == []  # v1 ∪ v2 reference everything
    assert table.snapshot(table.latest_version() - 1).to_arrow().num_rows == N


def test_merge_upsert_insert_delete(table):
    before = table.snapshot().to_arrow()
    changes = changeset_dataset(N, 40, seed=43, n_partitions=4)
    ch = changes.materialize()
    m = merge(table, ch, app_id="app1")
    assert m is not None and m.kind == "merge"

    after = table.snapshot().to_arrow()
    cht = pa.concat_tables([b for b in ch.iter_batches(batch_format="pyarrow",
                                                       batch_size=1000)])
    # expected via a plain-dict oracle (pandas coerces int64→float on
    # row assignment, corrupting phash low bits)
    expect = {r["image_id"]: r for r in before.to_pylist()}
    seen = set()
    for r in sorted(cht.to_pylist(), key=lambda r: (r["image_id"], r["seq"])):
        iid = r["image_id"]
        if iid in seen:
            continue  # first-wins by seq
        seen.add(iid)
        if r["op"] == "delete":
            expect.pop(iid, None)
        else:
            expect[iid] = {k: r[k] for k in
                           ("image_id", "bytes", "w", "h", "fmt",
                            "caption", "phash")}
    got = {r["image_id"]: r for r in after.to_pylist()}
    assert sorted(got) == sorted(expect)
    for iid in expect:
        for col in ("caption", "phash", "bytes", "w", "h", "fmt"):
            assert got[iid][col] == expect[iid][col], (iid, col)


def test_merge_replay_is_noop(table):
    ch = changeset_dataset(N, 30, seed=44, n_partitions=4).materialize()
    m1 = merge(table, ch, app_id="app1")
    assert m1 is not None
    v = table.latest_version()
    snap_rows = _sorted_rows(table.snapshot().to_arrow())
    # replay the exact same changeset: watermarks absorb every row
    assert merge(table, ch, app_id="app1") is None
    assert table.latest_version() == v  # no new version
    assert _sorted_rows(table.snapshot().to_arrow()) == snap_rows


def test_merge_different_app_id_not_filtered(table):
    ch = changeset_dataset(N, 10, seed=45, n_partitions=4).materialize()
    assert merge(table, ch, app_id="appA") is not None
    # another writer identity: same seqs are NOT replays for it
    assert merge(table, ch, app_id="appB") is not None


def test_merge_first_wins_within_changeset(table, tmp_path):
    import ray.data as rd

    from kafka_delta_rs_ray.tablefmt.schema import CHANGESET_SCHEMA

    import numpy as np

    from kafka_delta_rs_ray.codecs import encode

    pixel = encode(np.zeros((1, 1, 3), dtype=np.uint8), "rawz")
    iid = "img-0000000005"
    rows = [
        {"image_id": iid, "bytes": pixel, "w": 1, "h": 1, "fmt": "rawz",
         "caption": "first", "phash": 1, "partition_id": 0, "seq": 100,
         "op": "upsert"},
        {"image_id": iid, "bytes": pixel, "w": 1, "h": 1, "fmt": "rawz",
         "caption": "second", "phash": 2, "partition_id": 0, "seq": 101,
         "op": "upsert"},
    ]
    ch = rd.from_arrow(pa.Table.from_pylist(rows, schema=CHANGESET_SCHEMA))
    merge(table, ch, app_id="fw")
    t = table.snapshot().to_arrow()
    row = t.filter(pc.equal(t["image_id"], iid)).to_pylist()
    assert len(row) == 1
    assert row[0]["caption"] == "first"  # lowest seq wins (D1 semantics)


def test_merge_then_compact_materializes_deletes(table):
    ch = changeset_dataset(N, 40, seed=46, n_partitions=4).materialize()
    merge(table, ch, app_id="app1")
    rows_before = _sorted_rows(table.snapshot().to_arrow())
    assert any(f.delete_paths for f in table.read_manifest().fragments)
    compact(table, target_bytes=64 << 20)
    m = table.read_manifest()
    assert not any(f.delete_paths for f in m.fragments)  # deletes gone
    assert _sorted_rows(table.snapshot().to_arrow()) == rows_before


def test_compact_transcode_recompression(table):
    """Rewrite-with-recompression: compact(transcode_fmt='dctq')
    re-encodes every image; captions stay byte-identical, decoded
    pixels stay PSNR >= 40 dB vs the original source (input_hint
    invariant), and row count is unchanged."""
    import numpy as np

    from kafka_delta_rs_ray.codecs import decode
    from kafka_delta_rs_ray.functions.psnr import psnr
    from kafka_delta_rs_ray.pipelines.synth import make_row

    before = table.snapshot().to_arrow().sort_by("image_id")
    m = compact(table, target_bytes=64 << 20, transcode_fmt="dctq")
    assert m is not None and m.kind == "compact"
    after = table.snapshot().to_arrow().sort_by("image_id")

    assert after.num_rows == before.num_rows
    assert set(after["fmt"].to_pylist()) == {"dctq"}
    assert after["caption"].to_pylist() == before["caption"].to_pylist()
    assert after["phash"].to_pylist() == before["phash"].to_pylist()
    for i in (0, 7, after.num_rows - 1):
        rid = int(after["image_id"][i].as_py()[4:])
        src = make_row(rid, 42)["img"]
        dec = decode(after["bytes"][i].as_py(), "dctq")
        assert psnr(dec, src) >= 40.0


def test_delete_where_and_rollback(table):
    """Predicate delete: zone-map classified (disjoint pruned,
    contained dropped wholesale, overlap scanned into DVs); rollback
    restores the prior snapshot as a NEW version and keeps writer
    watermarks (replay stays a no-op after restore)."""
    from kafka_delta_rs_ray.pipelines.delete import delete_where, rollback

    before = table.snapshot().to_arrow()
    v_before = table.latest_version()
    w = before["w"].to_numpy(zero_copy_only=False)
    n_match = int(((w >= 128)).sum())
    assert 0 < n_match < before.num_rows

    m = delete_where(table, {"w": (128, None)})
    assert m is not None and m.kind == "delete"
    after = table.snapshot().to_arrow()
    assert after.num_rows == before.num_rows - n_match
    assert (after["w"].to_numpy(zero_copy_only=False) < 128).all()

    # idempotent-ish: nothing left to delete in that range
    assert delete_where(table, {"w": (128, None)}) is None

    # compact materializes the DVs away; scan identity holds
    sorted_after = after.sort_by("image_id")
    compact(table, target_bytes=64 << 20)
    assert table.snapshot().to_arrow().sort_by("image_id").equals(sorted_after)

    # rollback to the pre-delete version: all rows visible again
    m2 = rollback(table, v_before)
    assert m2.kind == "rollback"
    restored = table.snapshot().to_arrow().sort_by("image_id")
    assert restored.equals(before.sort_by("image_id"))
    # history intact: the delete-era snapshot still reads its own view
    assert table.snapshot(m.version).to_arrow().num_rows == after.num_rows


def test_rollback_keeps_watermarks(table):
    import ray.data as rd

    from kafka_delta_rs_ray.pipelines.delete import rollback
    from kafka_delta_rs_ray.tablefmt.schema import CHANGESET_SCHEMA

    ch = changeset_dataset(N, 10, seed=51, n_partitions=2).materialize()
    assert merge(table, ch, app_id="rb") is not None
    v_mid = table.latest_version()
    rollback(table, v_mid - 1)  # undo the merge's data...
    # ...but NOT its watermark: the replay must stay a no-op
    assert merge(table, ch, app_id="rb") is None


def _one_key_changeset(iid: str, caption: str, seq: int = 1):
    import ray.data as rd

    from kafka_delta_rs_ray.codecs import encode
    from kafka_delta_rs_ray.tablefmt.schema import CHANGESET_SCHEMA

    pixel = encode(np.zeros((1, 1, 3), dtype=np.uint8), "rawz")
    rows = [{"image_id": iid, "bytes": pixel, "w": 1, "h": 1, "fmt": "rawz",
             "caption": caption, "phash": 1, "partition_id": 0,
             "seq": seq, "op": "upsert"}]
    return rd.from_arrow(pa.Table.from_pylist(rows, schema=CHANGESET_SCHEMA))


def test_compact_skips_bin_when_merge_lands_midway(table):
    """A merge that commits BETWEEN compact's rewrite and compact's
    commit attaches a deletion vector to a bin input without changing
    its id. Compact must skip that bin (delete-fingerprint check) —
    committing the stale rewrite would resurrect the deleted row and
    leave two live copies of the upserted key."""
    iid = "img-0000000005"
    n_before = table.snapshot().to_arrow().num_rows
    orig = Table.commit
    state = {"fired": False}

    def hooked(build, max_attempts=3):
        if not state["fired"]:
            state["fired"] = True
            merge(Table(table.root),
                  _one_key_changeset(iid, "concurrent-upsert"), app_id="cc")
        return orig(table, build, max_attempts)

    table.commit = hooked
    try:
        compact(table, target_bytes=64 << 20)
    finally:
        del table.commit
    after = table.snapshot().to_arrow()
    rows = after.filter(pc.equal(after["image_id"], iid)).to_pylist()
    assert len(rows) == 1  # the invariant the advisor saw broken
    assert rows[0]["caption"] == "concurrent-upsert"
    assert after.num_rows == n_before


def test_merge_concurrent_same_key_conflicts(table):
    """Two concurrent merges upserting the SAME key: the second to
    commit must detect the concurrently-added fragment carrying its key
    and raise CommitConflict (not silently leave the key live in two
    fragments). Rerunning against the fresh snapshot converges to one
    live row."""
    from kafka_delta_rs_ray.errors import CommitConflict

    iid = "img-0000000007"
    orig = Table.commit
    state = {"fired": False}

    def hooked(build, max_attempts=3):
        if not state["fired"]:
            state["fired"] = True
            merge(Table(table.root), _one_key_changeset(iid, "from-m2"),
                  app_id="m2")
        return orig(table, build, max_attempts)

    table.commit = hooked
    try:
        with pytest.raises(CommitConflict):
            merge(table, _one_key_changeset(iid, "from-m1"), app_id="m1")
    finally:
        del table.commit

    merge(table, _one_key_changeset(iid, "from-m1"), app_id="m1")  # rerun
    t = table.snapshot().to_arrow()
    rows = t.filter(pc.equal(t["image_id"], iid)).to_pylist()
    assert len(rows) == 1
    assert rows[0]["caption"] == "from-m1"


def test_merge_repeat_same_key_no_rowcount_drift(table):
    """Repeated merges touching the same key must not double-count
    deletion vectors: keys already dead under existing deletes are
    subtracted before writing the new delete file, so live_rows /
    total_rows never drift (or go negative)."""
    iid = "img-0000000009"
    n0 = table.read_manifest().total_rows()
    for i, app in enumerate(("d1", "d2", "d3")):
        merge(table, _one_key_changeset(iid, f"cap-{i}"), app_id=app)
        m = table.read_manifest()
        assert m.total_rows() == n0, f"round {i}: row count drifted"
        assert all(f.live_rows >= 0 for f in m.fragments)
        assert table.snapshot().to_arrow().num_rows == n0


def test_expire_default_min_age_keeps_young_orphans(table):
    """Default expire keeps young unreferenced files: an in-flight
    run's pre-commit fragment (unreferenced until its CAS) must not be
    swept by a concurrent expire."""
    orphan = os.path.join(table.root, "data", "frag-inflight-test.parquet")
    with open(orphan, "wb") as f:
        f.write(b"not-yet-committed")
    report = expire(table, keep_last=1)  # default min_age = 1 h
    assert os.path.exists(orphan)
    assert report["kept_young_files"] >= 1


def test_cluster_slice_wise_resumable(table):
    """Clustering a 100 TB table runs one key-range slice per commit
    (the cluster resume granularity): each pruned slice rewrites only
    its overlapping fragments and commits independently; a crash
    between slices leaves a fully-usable table. Scan identity holds
    after every slice."""
    before = table.snapshot().to_arrow().sort_by("image_id")
    phs = sorted(before["phash"].to_pylist())
    mid = phs[len(phs) // 2]

    m1 = cluster(table, target_fragment_rows=32,
                 prune={"phash": (None, mid)})
    assert m1 is not None and m1.kind == "cluster"
    assert table.snapshot().to_arrow().sort_by("image_id").equals(before)

    m2 = cluster(table, target_fragment_rows=32,
                 prune={"phash": (mid + 1, None)})
    # slice 2 may be empty if slice 1 rewrote every overlapping fragment
    if m2 is not None:
        assert m2.version == m1.version + 1
    assert table.snapshot().to_arrow().sort_by("image_id").equals(before)
    # the rewritten fragments carry zcode zone maps
    assert any("zcode" in f.stats for f in table.read_manifest().fragments)


def test_concurrent_overlapping_merges_converge(table):
    """TRUE concurrency (threads, no orchestration): two merges upsert
    the SAME key at once. Outcomes allowed per the optimistic protocol:
    both commit in some serial order, or one raises CommitConflict and
    is rerun. Invariant either way: exactly ONE live row for the key,
    consistent row counts."""
    import threading

    from kafka_delta_rs_ray.errors import CommitConflict

    iid = "img-0000000011"
    n0 = table.read_manifest().total_rows()
    outcomes = {}

    def go(app, caption):
        t2 = Table(table.root)
        ch = _one_key_changeset(iid, caption)
        try:
            outcomes[app] = merge(t2, ch, app_id=app) is not None
        except CommitConflict:
            outcomes[app] = "conflict"

    th = [threading.Thread(target=go, args=("cm1", "from-cm1")),
          threading.Thread(target=go, args=("cm2", "from-cm2"))]
    for t_ in th:
        t_.start()
    for t_ in th:
        t_.join()

    # rerun any conflicted merge against the fresh snapshot
    for app, res in outcomes.items():
        if res == "conflict":
            merge(Table(table.root), _one_key_changeset(iid, f"from-{app}"),
                  app_id=app)

    t = table.snapshot().to_arrow()
    rows = t.filter(pc.equal(t["image_id"], iid)).to_pylist()
    assert len(rows) == 1, f"key live in {len(rows)} fragments"
    assert rows[0]["caption"].startswith("from-cm")
    m = table.read_manifest()
    assert m.total_rows() == n0
    assert t.num_rows == n0
    assert all(f.live_rows >= 0 for f in m.fragments)


def test_concurrent_compact_and_merge_threads(table):
    """Compaction racing a live merge (threads): whatever interleaving
    happens, the table ends consistent — the merged key has exactly one
    live copy with the merged caption, no rows resurrect, and row
    counts hold."""
    import threading

    iid = "img-0000000013"
    n0 = table.read_manifest().total_rows()
    errs = []

    def do_merge():
        try:
            merge(Table(table.root), _one_key_changeset(iid, "race-merge"),
                  app_id="race")
        except Exception as e:  # noqa: BLE001 (collected for assert)
            errs.append(e)

    def do_compact():
        try:
            compact(Table(table.root), target_bytes=64 << 20)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    th = [threading.Thread(target=do_merge),
          threading.Thread(target=do_compact)]
    for t_ in th:
        t_.start()
    for t_ in th:
        t_.join()
    from kafka_delta_rs_ray.errors import CommitConflict

    real = [e for e in errs if not isinstance(e, CommitConflict)]
    assert not real, real
    if any(isinstance(e, CommitConflict) for e in errs):
        # merge lost the race against compact's fragment swap: rerun
        merge(Table(table.root), _one_key_changeset(iid, "race-merge"),
              app_id="race")

    t = table.snapshot().to_arrow()
    rows = t.filter(pc.equal(t["image_id"], iid)).to_pylist()
    assert len(rows) == 1
    assert rows[0]["caption"] == "race-merge"
    assert t.num_rows == n0
    assert table.read_manifest().total_rows() == n0


def test_merge_prunes_fragments_by_key_set(table):
    """Zone-map pruning precision: a changeset whose keys all live in
    ONE fragment's id range must attach deletion vectors to that
    fragment only — fragments whose [min,max] holds no changed key are
    never read (the set check, not just the global key range)."""
    # fixture fragments hold id-ordered 20-row chunks; pick two ids
    # from the FIRST fragment's range
    import ray.data as rd

    from kafka_delta_rs_ray.tablefmt.schema import CHANGESET_SCHEMA

    rows = [_one_key_changeset(f"img-{i:010d}", f"prune-{i}", seq=i + 1)
            for i in (2, 7)]
    tbl = pa.concat_tables([pa.Table.from_pylist(
        r.take_all(), schema=CHANGESET_SCHEMA) for r in rows])
    merge(table, rd.from_arrow(tbl), app_id="prune")

    m = table.read_manifest()
    with_dv = [f for f in m.fragments if f.delete_paths]
    assert len(with_dv) == 1  # only the one holding img-...02/07
    assert with_dv[0].stats["image_id"]["min"] <= "img-0000000002"
    assert with_dv[0].stats["image_id"]["max"] >= "img-0000000007"


def test_delete_where_string_predicate(table):
    """Predicate deletes work on string columns too (fmt): zone-map
    classification + the vectorized scan compare lexicographically."""
    from kafka_delta_rs_ray.pipelines.delete import delete_where

    before = table.snapshot().to_arrow()
    n_dctq = sum(1 for f in before["fmt"].to_pylist() if f == "dctq")
    assert 0 < n_dctq < before.num_rows

    m = delete_where(table, {"fmt": ("dctq", "dctq")})
    assert m is not None
    after = table.snapshot().to_arrow()
    assert after.num_rows == before.num_rows - n_dctq
    assert set(after["fmt"].to_pylist()) == {"rawz"}
    # idempotent: nothing left in that range
    assert delete_where(table, {"fmt": ("dctq", "dctq")}) is None


def test_compact_preserves_clustering(table):
    """Compacting a CLUSTERED table packs adjacent zcode runs (not
    size-order FFD), so outputs keep sorted_by="zcode" and the union
    zone map — pruned scans stay selective after compaction instead of
    every fragment covering the whole key space."""
    cluster(table, target_fragment_rows=16)  # many small sorted frags
    merge(table, _one_key_changeset("img-0000000002", "dv"), app_id="pc")
    before = _sorted_rows(table.snapshot().to_arrow())

    m = compact(table, target_bytes=2 << 20)
    assert m is not None
    assert _sorted_rows(table.snapshot().to_arrow()) == before

    new_frags = [f for f in m.fragments if "zcode" in f.stats]
    assert new_frags, "zcode zone maps lost in compaction"
    rewritten = [f for f in m.fragments if f.sorted_by == "zcode"]
    assert rewritten
    # ranges stay mostly disjoint → a point query prunes
    spans = sorted((f.stats["zcode"]["min"], f.stats["zcode"]["max"])
                   for f in m.fragments if "zcode" in f.stats)
    if len(spans) > 1:
        lo, hi = spans[0]
        sel = table.snapshot()._select_fragments({"zcode": (lo, hi)})
        assert len(sel) < len(m.fragments)


def test_compact_resume_redoes_bin_without_delete_fingerprint(table):
    """A resume marker lacking fp_json (pre-upgrade format) is NOT
    resumable: substituting the current snapshot's delete state would
    let a delete that landed between the original rewrite and the
    resume pass the commit check and resurrect deleted rows. The bin
    must be redone, not resumed from the stale marker."""
    import json

    from kafka_delta_rs_ray.tablefmt.manifest import Fragment

    run_id = "fpless-resume-1"
    ctx = RunContext(table.root, run_id, job="compact")
    snap = table.snapshot()
    bins = plan_compaction(snap.manifest, target_bytes=64 << 20)
    assert bins
    ctx.write_plan({"bins": bins, "base_version": snap.version,
                    "target_bytes": 64 << 20, "transcode_fmt": None})
    # stale marker WITHOUT fp_json, pointing at a fragment that was
    # never written -- resuming from it would commit a dangling path
    bogus = Fragment(id="bogus", path="data/frag-bogus.parquet",
                     rows=1, bytes=1)
    ctx.write_marker("bin", str(bins[0]["bin_id"]),
                     {"frag_json": json.dumps(bogus.to_json()), "rows": 1,
                      "seconds": 0.0})

    before = _sorted_rows(table.snapshot().to_arrow())
    m = compact(table, target_bytes=64 << 20, run_id=run_id)
    assert m is not None
    assert all(f.id != "bogus" for f in m.fragments)
    assert _sorted_rows(table.snapshot().to_arrow()) == before


def test_distributed_merge_concurrent_same_key_conflicts(table):
    """Same interleaving as test_merge_concurrent_same_key_conflicts
    but with the DISTRIBUTED changed-key path forced (driver_keys_max=
    1): the commit-time concurrent-fragment check must detect the
    overlap via the distributed key dataset (the key set never sat on
    the driver) and raise CommitConflict; the rerun converges."""
    from kafka_delta_rs_ray.errors import CommitConflict

    iid = "img-0000000011"
    orig = Table.commit
    state = {"fired": False}

    def hooked(build, max_attempts=3):
        if not state["fired"]:
            state["fired"] = True
            merge(Table(table.root), _one_key_changeset(iid, "from-m2"),
                  app_id="dm2", driver_keys_max=1)
        return orig(table, build, max_attempts)

    table.commit = hooked
    try:
        with pytest.raises(CommitConflict):
            merge(table, _one_key_changeset(iid, "from-m1"),
                  app_id="dm1", driver_keys_max=1)
    finally:
        del table.commit

    merge(table, _one_key_changeset(iid, "from-m1"), app_id="dm1",
          driver_keys_max=1)  # rerun against the fresh snapshot
    t = table.snapshot().to_arrow()
    rows = t.filter(pc.equal(t["image_id"], iid)).to_pylist()
    assert len(rows) == 1
    assert rows[0]["caption"] == "from-m1"


def test_distributed_merge_concurrent_disjoint_keys_both_commit(table):
    """Two concurrent DISTRIBUTED merges with disjoint keys: the
    commit-time check must NOT false-positive — both land."""
    orig = Table.commit
    state = {"fired": False}

    def hooked(build, max_attempts=3):
        if not state["fired"]:
            state["fired"] = True
            merge(Table(table.root), _one_key_changeset("dj-b", "b"),
                  app_id="dj2", driver_keys_max=1)
        return orig(table, build, max_attempts)

    table.commit = hooked
    try:
        m = merge(table, _one_key_changeset("dj-a", "a"),
                  app_id="dj1", driver_keys_max=1)
    finally:
        del table.commit
    assert m is not None
    ids = set(table.snapshot().to_arrow()["image_id"].to_pylist())
    assert {"dj-a", "dj-b"} <= ids


def test_cluster_generic_key_cols(tmp_path, ray_session):
    """cluster(key_cols=[...]) works on an arbitrary (non-image)
    table: per-column bounds come from fragment zone maps, scan
    contents are preserved exactly, fragments get zcode zone maps and
    are range-ordered by the leading key, and the manifest records the
    key columns."""
    import random

    import ray.data as rd

    schema = pa.schema([pa.field("doc_id", pa.string()),
                        pa.field("n_tokens", pa.int64()),
                        pa.field("score", pa.float64())])
    t = Table.create(str(tmp_path / "g"), schema)
    rng = random.Random(3)
    rows = [{"doc_id": f"d{i:05d}", "n_tokens": rng.randrange(1, 5000),
             "score": rng.random()} for i in range(400)]
    append(t, rd.from_arrow(pa.Table.from_pylist(rows, schema=schema)),
           target_fragment_rows=100)

    pre = t.snapshot().to_arrow().sort_by("doc_id")
    m = cluster(t, target_fragment_rows=64,
                key_cols=["n_tokens", "score"], salt_col="doc_id")
    assert m.properties["cluster_key_cols"] == ["n_tokens", "score"]
    post = t.snapshot().to_arrow().sort_by("doc_id")
    assert pre.equals(post.select(pre.column_names))

    frags = t.snapshot().manifest.fragments
    assert all("zcode" in f.stats for f in frags)
    assert all(f.sorted_by == "zcode" for f in frags)
    # clustering quality: fragment n_tokens ranges should be much
    # narrower than the global range (the whole point of the curve)
    widths = [f.stats["n_tokens"]["max"] - f.stats["n_tokens"]["min"]
              for f in frags]
    assert sorted(widths)[len(widths) // 2] < 5000 * 0.6

    # hilbert + 1-column variants also run
    cluster(t, target_fragment_rows=64, key_cols=["score"],
            salt_col="doc_id", curve="hilbert")
    assert t.snapshot().to_arrow().sort_by("doc_id") \
            .select(pre.column_names).equals(pre)

    # string keys cluster through the order-preserving 8-byte prefix:
    # scan identity holds and fragments are range-ordered by doc_id
    cluster(t, target_fragment_rows=64, key_cols=["doc_id"],
            salt_col="doc_id")
    assert t.snapshot().to_arrow().sort_by("doc_id") \
            .select(pre.column_names).equals(pre)
    sfr = sorted(t.snapshot().manifest.fragments,
                 key=lambda f: f.stats["doc_id"]["min"])
    overlaps = sum(1 for a, b in zip(sfr, sfr[1:])
                   if a.stats["doc_id"]["max"] > b.stats["doc_id"]["min"])
    assert overlaps <= len(sfr) // 4  # mostly disjoint doc_id ranges

    # binary / stats-less columns are still rejected early
    import zlib as _z

    t2 = Table.create(str(tmp_path / "gb"), pa.schema(
        [pa.field("doc_id", pa.string()), pa.field("blob", pa.binary())]))
    append(t2, rd.from_arrow(pa.Table.from_pylist(
        [{"doc_id": f"d{i}", "blob": _z.compress(bytes(8))}
         for i in range(10)])))
    with pytest.raises(ValueError, match="lacks zone-map stats"):
        cluster(t2, key_cols=["blob"], salt_col="doc_id")


def test_table_changes_cdc(table):
    """Change feed (CDC): the (from, to] span replays exactly —
    applying the feed's deletes-then-inserts to the from-snapshot
    reproduces the to-snapshot; delete rows carry the pre-image;
    physical commits (compact/cluster) emit nothing; wholesale
    fragment drops (contained predicate delete) emit their live rows;
    rollback spans are rejected."""
    from kafka_delta_rs_ray.pipelines.cdc import table_changes
    from kafka_delta_rs_ray.pipelines.delete import delete_where, rollback

    v0 = table.latest_version()
    snap0 = table.snapshot().to_arrow()

    ch = changeset_dataset(N, 40, seed=43, n_partitions=4).materialize()
    merge(table, ch, app_id="cdc")
    v1 = table.latest_version()
    snap1 = table.snapshot().to_arrow()

    compact(table)
    cluster(table)
    v2 = table.latest_version()

    # physical-only span → zero changes
    assert table_changes(table, v1, v2).count() == 0

    feed = pa.Table.from_pylist(table_changes(table, v0, v1).take_all())
    assert set(feed["_commit_version"].to_pylist()) == {v1}
    # replay: deletes first (an update is delete(old)+insert(new))
    state = {r["image_id"]: r for r in snap0.to_pylist()}
    rows = feed.to_pylist()
    pre_images = {}
    for r in rows:
        if r["_change_type"] == "delete":
            pre_images[r["image_id"]] = r
            old = state.pop(r["image_id"])
            # the delete row is the PRE-image
            assert old["caption"] == r["caption"]
            assert old["phash"] == r["phash"]
    for r in rows:
        if r["_change_type"] == "insert":
            state[r["image_id"]] = {k: r[k] for k in
                                    ("image_id", "bytes", "w", "h",
                                     "fmt", "caption", "phash")}
    got = {r["image_id"]: r for r in snap1.to_pylist()}
    assert sorted(state) == sorted(got)
    for iid, r in got.items():
        for col in ("caption", "phash", "bytes", "w", "h", "fmt"):
            assert state[iid][col] == r[col], (iid, col)

    # span across the physical commits ends at the same logical state
    feed02 = pa.Table.from_pylist(table_changes(table, v0, v2).take_all())
    assert feed02.num_rows == feed.num_rows

    # wholesale fragment drop: clustering packs similar phash values
    # together, so one fragment's exact phash range fully contains it
    # (others overlap → scanned into DVs; both paths hit the feed)
    frag0 = table.snapshot().manifest.fragments[0]
    live_before = table.snapshot().to_arrow()
    dm = delete_where(table, {"phash": (frag0.stats["phash"]["min"],
                                        frag0.stats["phash"]["max"])})
    assert dm is not None
    v3 = table.latest_version()
    dropped = pa.Table.from_pylist(table_changes(table, v2, v3).take_all())
    assert set(dropped["_change_type"].to_pylist()) == {"delete"}
    n_deleted = live_before.num_rows - table.snapshot().to_arrow().num_rows
    assert dropped.num_rows == n_deleted

    # rollback commits are rejected
    rollback(table, v2)
    with pytest.raises(ValueError, match="rollback"):
        table_changes(table, v0).count()


def test_tags_pin_versions_through_expire(table):
    """Named version refs: tag → snapshot(tag=) time travel; expire
    keeps a tagged version's FULL closure regardless of keep_last;
    delete_tag releases it for the next expire; tags are immutable
    (re-tagging a name is an explicit delete+create)."""
    v0 = table.latest_version()
    pre = table.snapshot().to_arrow().sort_by("image_id")
    table.tag("baseline", v0)
    assert table.tags() == {"baseline": v0}
    with pytest.raises(FileExistsError):
        table.tag("baseline", v0)  # immutable ref
    with pytest.raises(Exception, match="missing version"):
        table.tag("nope", 999)

    merge(table, changeset_dataset(N, 30, seed=77).materialize(),
          app_id="tags")
    compact(table)
    rep = expire(table, keep_last=1, min_age_seconds=0)
    assert v0 in rep["retained_versions"]  # pinned by the tag

    got = table.snapshot(tag="baseline").to_arrow().sort_by("image_id")
    assert got.equals(pre)  # full closure intact, byte-identical

    table.delete_tag("baseline")
    assert table.tags() == {}
    rep2 = expire(table, keep_last=1, min_age_seconds=0)
    assert v0 in rep2["expired_versions"]  # released
    with pytest.raises(Exception, match="no such tag"):
        table.snapshot(tag="baseline")


def test_tag_withdraws_when_closure_broken(table):
    """tag() verifies the version's FULL file closure (fragments +
    delete files + shards) after publishing, not just the manifest: a
    version whose data files were already swept by a concurrent expire
    can never end up pinned-but-broken — the tag withdraws itself with
    an error."""
    from kafka_delta_rs_ray.errors import StateError

    v0 = table.latest_version()
    compact(table)  # v0's fragments now reachable only via v0
    # simulate expire's sweep having removed one of v0's data files
    victim = table.read_manifest(v0).fragments[0].path
    os.unlink(table.abspath(victim))
    with pytest.raises(StateError, match="missing"):
        table.tag("broken", v0)
    assert table.tags() == {}  # withdrawn, not half-pinned
    # tagging the intact latest version still works
    table.tag("ok")
    assert table.tags() == {"ok": table.latest_version()}


def test_cdc_consumer_cursors(table):
    """changes_since/ack: a consumer sees each commit's changes
    exactly once across process restarts when it acks after
    processing; a crash before ack replays the span (at-least-once);
    acks are monotonic."""
    from kafka_delta_rs_ray.pipelines.cdc import ack, changes_since, cursor

    assert cursor(table, "idx") == 0
    feed, v1 = changes_since(table, "idx")
    n1 = feed.count()
    assert n1 == N  # the initial append
    ack(table, "idx", v1)
    assert cursor(table, "idx") == v1

    # nothing new → empty feed
    feed2, v2 = changes_since(table, "idx")
    assert v2 == v1 and feed2.count() == 0

    merge(table, changeset_dataset(N, 25, seed=91).materialize(),
          app_id="cur")
    feed3, v3 = changes_since(table, "idx")
    assert v3 == v1 + 1
    rows = pa.Table.from_pylist(feed3.take_all())
    assert set(rows["_commit_version"].to_pylist()) == {v3}

    # crash-before-ack: the same span replays
    feed3b, v3b = changes_since(table, "idx")
    assert v3b == v3 and feed3b.count() == rows.num_rows

    ack(table, "idx", v3)
    ack(table, "idx", v1)  # stale ack is a no-op
    assert cursor(table, "idx") == v3


def test_table_changes_across_schema_evolution(table):
    """A change feed spanning a merge_schema append conforms EVERY
    change row to the to_version schema: pre-evolution inserts
    null-fill the new column, post-evolution inserts carry it."""
    import ray.data as rd

    from kafka_delta_rs_ray.pipelines.cdc import table_changes

    v0 = table.latest_version()

    def with_license(b, prefix):
        return (b.set_column(
            0, "image_id",
            pa.array([f"{prefix}-{i}" for i in range(b.num_rows)]))
            .append_column("license",
                           pa.array(["cc0"] * b.num_rows, pa.string())))

    merge(table, changeset_dataset(N, 10, seed=61).materialize(),
          app_id="sev")                         # pre-evolution changes
    extra = image_dataset(8, seed=9, batch_size=8).map_batches(
        lambda b: with_license(b, "ev"), batch_format="pyarrow")
    append(table, extra, target_fragment_rows=8, mode="merge_schema")

    feed = pa.Table.from_pylist(
        table_changes(table, v0).take_all())
    assert "license" in feed.column_names
    ev = feed.filter(pc.match_substring(feed["image_id"], "ev-"))
    assert ev.num_rows == 8
    assert all(v == "cc0" for v in ev["license"].to_pylist())
    pre = feed.filter(pc.invert(pc.match_substring(feed["image_id"],
                                                   "ev-")))
    assert pre.num_rows > 0
    assert all(v is None for v in pre["license"].to_pylist())


def test_table_stats_reports_clustering_quality(table, tmp_path):
    """ANALYZE-lite: zone-map layout stats are metadata-only and move
    the right way — clustering collapses avg_rel_width/overlap on the
    sort column and the CLI job returns the same report."""
    import yaml

    from kafka_delta_rs_ray.config import MaintenanceConfig
    from kafka_delta_rs_ray.run import run
    from kafka_delta_rs_ray.state.tablestats import table_stats

    pre = table_stats(table)
    assert pre["fragments"] > 1 and pre["rows"] == N
    assert "phash" in pre["columns"]
    pre_sel = pre["columns"]["phash"]["est_point_selectivity"]

    cluster(table, target_fragment_rows=20)
    post = table_stats(table)
    assert post["cluster_curve"] == "morton"
    zc = post["columns"]["zcode"]
    assert zc["coverage"] == 1.0
    # clustered layout: zcode ranges are narrow and mostly disjoint
    assert zc["avg_rel_width"] < 0.5
    assert zc["est_point_selectivity"] < pre_sel or pre_sel == 1.0

    cfgp = tmp_path / "stats.yaml"
    cfgp.write_text(yaml.safe_dump({"table_root": table.root,
                                    "job": "stats"}))
    out = run(MaintenanceConfig.load(str(cfgp)))
    assert out["job"] == "stats" and out["fragments"] == post["fragments"]
    assert out["columns"]["zcode"] == zc


def test_cluster_incremental_rewrites_only_new_data(table):
    """Incremental cluster = O(new data) rewrite: already-sorted clean
    fragments keep their identity; only post-cluster appends (and
    delete-carrying fragments) are rewritten into a new sorted run;
    a second incremental pass on a quiesced layout commits nothing."""
    m1 = cluster(table, target_fragment_rows=30)
    sorted_ids = {f.id for f in m1.fragments}

    # append new unsorted data (distinct ids so scan identity is checkable)
    extra = image_dataset(25, seed=77, batch_size=25).map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("image_id"), "image_id",
            [[f"new-{x}" for x in t["image_id"].to_pylist()]]),
        batch_format="pyarrow")
    append(table, extra, target_fragment_rows=25)
    before = _sorted_rows(table.snapshot().to_arrow())

    m2 = cluster(table, target_fragment_rows=30, incremental=True)
    assert m2 is not None and m2.kind == "cluster"
    after = _sorted_rows(table.snapshot().to_arrow())
    assert before == after  # scan identity

    kept = {f.id for f in m2.fragments} & sorted_ids
    assert kept == sorted_ids  # clean sorted fragments untouched
    new_run = [f for f in m2.fragments if f.id not in sorted_ids]
    assert new_run and all(f.sorted_by == "zcode" for f in new_run)
    assert sum(f.rows for f in new_run) == 25  # only the new data

    # quiesced: nothing dirty → no commit
    v = table.latest_version()
    assert cluster(table, target_fragment_rows=30,
                   incremental=True) is None
    assert table.latest_version() == v


def test_cluster_incremental_folds_in_deletes(table):
    """A delete-carrying sorted fragment counts as dirty: incremental
    cluster rewrites it, materializing the deletes away."""
    cluster(table, target_fragment_rows=30)
    ch = changeset_dataset(40, 12, seed=5).materialize()
    merge(table, ch, app_id="inc")
    assert any(f.delete_paths for f in
               table.snapshot().manifest.fragments)
    before = _sorted_rows(table.snapshot().to_arrow())

    m = cluster(table, target_fragment_rows=30, incremental=True)
    assert m is not None
    assert not any(f.delete_paths for f in m.fragments)
    assert _sorted_rows(table.snapshot().to_arrow()) == before


def test_prefix64_order_preserving():
    """String curve keys: the vectorized 8-byte-prefix transform matches
    the scalar one, preserves lexicographic order at 8-byte granularity,
    handles nulls (low edge), slices, and non-ASCII bytes."""
    from kafka_delta_rs_ray.stages.zorder import prefix64, prefix64_scalar

    vals = ["", "a", "aa", "ab", "abcdefgh", "abcdefghZZZ", "b",
            "z" * 20, "éclair", "0", None]
    arr = pa.chunked_array([vals[:5], vals[5:]], type=pa.string())
    v = prefix64(arr)
    for i, s in enumerate(vals):
        expect = 0 if s is None else prefix64_scalar(s)
        assert int(v[i]) == expect, (i, s)
    # order preservation on the non-null prefix-distinct values
    strs = sorted(s for s in vals if s is not None)
    pv = [prefix64_scalar(s) for s in strs]
    assert pv == sorted(pv)
    # sliced array path
    sl = pa.array(vals[:5], pa.string()).slice(2, 3)
    assert list(prefix64(sl)) == [prefix64_scalar(s) for s in vals[2:5]]


def test_cluster_timestamp_key_rejected_cleanly(tmp_path, ray_session):
    """Timestamp/date key_cols (whose zone-map stats are stringified by
    the manifest JSON layer) must fail at declaration with a clear
    message, not crash mid-shuffle in the string-prefix transform."""
    import pandas as _pd
    import ray.data as rd

    schema = pa.schema([pa.field("doc_id", pa.string()),
                        pa.field("ts", pa.timestamp("us"))])
    t = Table.create(str(tmp_path / "ts"), schema)
    append(t, rd.from_arrow(pa.table({
        "doc_id": [f"d{i}" for i in range(20)],
        "ts": pa.array([_pd.Timestamp("2024-01-01")
                        + _pd.Timedelta(hours=i) for i in range(20)],
                       pa.timestamp("us"))})))
    with pytest.raises(ValueError, match="epoch integers"):
        cluster(t, key_cols=["ts"], salt_col="doc_id")


def test_export_shards_roundtrip_and_resume(table, tmp_path):
    """Export = snapshot rows exactly (deletes applied), one shard per
    fragment, atomic completeness manifest; a re-run with the same
    out_dir skips every finished shard and restores missing ones."""
    import glob as _glob
    import json as _json

    import pyarrow.parquet as _pq

    from kafka_delta_rs_ray.pipelines.export import export_shards

    # attach deletes via a merge so the export must subtract them
    ch = changeset_dataset(N, 30, seed=9, n_partitions=2).materialize()
    merge(table, ch, app_id="exp")
    expect = table.snapshot().to_arrow().sort_by("image_id")

    out = str(tmp_path / "out")
    rep = export_shards(table, out)
    assert rep["rows"] == expect.num_rows
    assert rep["resumed_shards"] == 0
    man = _json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert man["source_version"] == table.latest_version()
    shards = sorted(_glob.glob(os.path.join(out, "shard-*.parquet")))
    assert len(shards) == len(man["shards"]) == len(
        table.snapshot().manifest.fragments)
    got = pa.concat_tables([_pq.read_table(p) for p in shards])
    got = got.sort_by("image_id").select(expect.column_names)
    assert got.equals(expect)

    # resume: drop one shard, re-run — only that shard is rewritten
    os.unlink(shards[0])
    rep2 = export_shards(table, out)
    assert rep2["rows"] == expect.num_rows
    assert rep2["resumed_shards"] == len(shards) - 1
    assert os.path.exists(shards[0])

    # column projection
    out2 = str(tmp_path / "out2")
    rep3 = export_shards(table, out2, columns=["image_id", "caption"])
    p0 = sorted(_glob.glob(os.path.join(out2, "shard-*.parquet")))[0]
    assert _pq.read_schema(p0).names == ["image_id", "caption"]
    assert rep3["rows"] == expect.num_rows


def test_export_cli_job(table, tmp_path):
    from kafka_delta_rs_ray.config import MaintenanceConfig
    from kafka_delta_rs_ray.run import run

    out = str(tmp_path / "cli-out")
    cfgp = tmp_path / "exp.yaml"
    cfgp.write_text(f"table_root: {table.root}\njob: export\n"
                    f"options:\n  output_path: {out}\n"
                    f"  columns: [image_id, phash]\n")
    rep = run(MaintenanceConfig.load(str(cfgp)))
    assert rep["job"] == "export" and rep["rows"] == N
    assert rep["shards"] >= 1 and os.path.exists(
        os.path.join(out, "_MANIFEST.json"))


def test_export_generation_guard(table, tmp_path):
    """Resume is valid only for the same (version, columns) generation:
    a changed table or projection refuses the stale dir unless
    overwrite=True, which removes every prior shard first — deleted
    rows and orphaned fragment shards can never mix into a 'complete'
    export. Crashed tmp files are swept on start."""
    import glob as _glob

    from kafka_delta_rs_ray.errors import StateError
    from kafka_delta_rs_ray.pipelines.export import export_shards

    out = str(tmp_path / "out")
    export_shards(table, out)
    # crashed-writer leftover is swept by the next run
    leftover = os.path.join(out, "shard-dead.parquet.tmp-deadbeef")
    open(leftover, "wb").write(b"junk")

    # table changes (merge attaches deletes) → old generation is stale
    ch = changeset_dataset(N, 20, seed=5, n_partitions=2).materialize()
    merge(table, ch, app_id="gen")
    with pytest.raises(StateError, match="different export generation"):
        export_shards(table, out)
    rep = export_shards(table, out, overwrite=True)
    assert not os.path.exists(leftover)
    expect = table.snapshot().to_arrow().sort_by("image_id")
    assert rep["rows"] == expect.num_rows
    # directory holds exactly the current generation's shards
    import pyarrow.parquet as _pq

    shards = sorted(_glob.glob(os.path.join(out, "shard-*.parquet")))
    got = pa.concat_tables([_pq.read_table(p) for p in shards])
    assert got.num_rows == expect.num_rows

    # projection change is also a new generation
    with pytest.raises(StateError, match="different export generation"):
        export_shards(table, out, columns=["image_id"])


def test_delete_where_string_predicate(table):
    """Predicate deletes work on STRING columns end-to-end: zone-map
    classification compares lexicographically and the scan kernel's
    vectorized bounds apply to object arrays — pinned on the fmt
    column (delete every rawz row)."""
    from kafka_delta_rs_ray.pipelines.delete import delete_where, rollback

    pre = table.snapshot().to_arrow()
    n_rawz = sum(1 for v in pre["fmt"].to_pylist() if v == "rawz")
    assert 0 < n_rawz < pre.num_rows  # synth mixes fmts
    m = delete_where(table, {"fmt": ("rawz", "rawz")})
    assert m is not None
    post = table.snapshot().to_arrow()
    assert post.num_rows == pre.num_rows - n_rawz
    assert set(post["fmt"].to_pylist()) == {"dctq"}
    rollback(table, m.parent)
    assert table.snapshot().to_arrow().num_rows == pre.num_rows


def test_update_where_basic(table):
    """Predicate UPDATE (copy-on-write): matched rows get the assigned
    values in a new snapshot, unmatched rows are byte-identical, row
    count never moves, and the change survives compaction (DVs + the
    rewrite fragment materialize away cleanly)."""
    from kafka_delta_rs_ray.pipelines.update import update_where

    before = table.snapshot().to_arrow()
    w = before["w"].to_numpy(zero_copy_only=False)
    n_match = int((w >= 128).sum())
    assert 0 < n_match < before.num_rows

    m = update_where(table, {"w": (128, None)}, {"caption": "WIDE"})
    assert m is not None and m.kind == "update"
    after = table.snapshot().to_arrow()
    assert after.num_rows == before.num_rows
    a = after.sort_by("image_id")
    b = before.sort_by("image_id")
    aw = a["w"].to_numpy(zero_copy_only=False)
    caps = a["caption"].to_pylist()
    old = b["caption"].to_pylist()
    for i in range(a.num_rows):
        assert caps[i] == ("WIDE" if aw[i] >= 128 else old[i])
    # untouched columns identical everywhere
    for col in ("image_id", "bytes", "w", "h", "fmt", "phash"):
        assert a[col].equals(b[col]), col

    # compaction materializes DVs; scan identity holds
    sorted_after = after.sort_by("image_id")
    compact(table, target_bytes=64 << 20)
    assert table.snapshot().to_arrow().sort_by("image_id").equals(
        sorted_after)

    # predicate matching nothing → no-op, no commit
    v = table.latest_version()
    assert update_where(table, {"w": (100000, None)},
                        {"caption": "X"}) is None
    assert table.latest_version() == v


def test_update_where_constraint_quarantine(tmp_path, ray_session):
    """UPDATE honours the table's CHECK constraints with dead-letter
    semantics: a row whose UPDATED form violates a constraint keeps
    its original row live and the attempted update lands in
    quarantine/ — violations never poison the commit (reference
    dead-letter contract, src/kafka/mod.rs:288-300)."""
    import glob

    import pyarrow.parquet as pq

    from kafka_delta_rs_ray.pipelines.update import update_where

    t = Table.create(str(tmp_path / "tc"), IMAGE_SCHEMA,
                     constraints=[{"name": "h_pos", "col": "h",
                                   "op": ">", "value": 0}])
    append(t, image_dataset(40, batch_size=20), target_fragment_rows=20)
    before = t.snapshot().to_arrow()

    # every attempted update violates h > 0 → full rejection: no
    # commit, originals intact, quarantine holds the attempted rows
    v = t.latest_version()
    assert update_where(t, {"w": (None, None)}, {"h": -5}) is None
    assert t.latest_version() == v
    assert t.snapshot().to_arrow().sort_by("image_id").equals(
        before.sort_by("image_id"))
    q = glob.glob(os.path.join(t.root, "quarantine", "*.parquet"))
    assert q, "quarantined updates missing"
    qt = pa.concat_tables([pq.read_table(p) for p in q])
    assert qt.num_rows == before.num_rows
    assert all("h_pos" in e for e in qt["error"].to_pylist())

    # a passing assignment still commits
    m = update_where(t, {"w": (None, None)}, {"h": 7})
    assert m is not None
    assert set(t.snapshot().to_arrow()["h"].to_pylist()) == {7}


def test_update_where_validates_assignments(table):
    """Validate-early posture: unknown column, key column, and
    type-incompatible value each fail at call time with a specific
    message — never inside a write task."""
    from kafka_delta_rs_ray.errors import ConfigError
    from kafka_delta_rs_ray.pipelines.update import update_where

    with pytest.raises(ConfigError, match="not in the table schema"):
        update_where(table, {"w": (0, None)}, {"nope": 1})
    with pytest.raises(ConfigError, match="key column"):
        update_where(table, {"w": (0, None)}, {"image_id": "x"})
    with pytest.raises(ConfigError, match="not compatible"):
        update_where(table, {"w": (0, None)}, {"h": "tall"})
    with pytest.raises(ConfigError, match="at least one assignment"):
        update_where(table, {"w": (0, None)}, {})


def test_clone_shallow_zero_copy(table, tmp_path):
    """Shallow clone: hard-linked data files (zero bytes copied), the
    clone scans identically, the two lines commit independently, and
    expire on the source never breaks the clone's closure."""
    from kafka_delta_rs_ray.pipelines.delete import delete_where
    from kafka_delta_rs_ray.tablefmt.manifest import Manifest

    src_rows = table.snapshot().to_arrow().sort_by("image_id")
    c = table.clone(str(tmp_path / "c"))
    assert c.read_manifest().kind == "clone"
    assert c.snapshot().to_arrow().sort_by("image_id").equals(src_rows)

    # zero-copy: every clone data file is a hard link (nlink >= 2)
    for f in c.read_manifest().fragments:
        assert os.stat(c.abspath(f.path)).st_nlink >= 2

    # independence: a delete on the clone never touches the source
    m = delete_where(c, {"w": (128, None)})
    assert m is not None
    assert table.snapshot().to_arrow().sort_by("image_id").equals(
        src_rows)
    assert c.snapshot().to_arrow().num_rows < src_rows.num_rows

    # source churns + expires: clone still reads its full closure
    compact(table, target_bytes=64 << 20)
    expire(table, keep_last=1, min_age_seconds=0)
    assert c.snapshot().to_arrow().num_rows > 0

    # cloning onto an existing table root is rejected
    from kafka_delta_rs_ray.errors import StateError

    with pytest.raises(StateError, match="already"):
        table.clone(str(tmp_path / "c"))


def test_update_delete_on_evolved_schema(tmp_path, ray_session):
    """Schema-evolution edges of the predicate verbs: old fragments
    physically lacking a predicate column never match (SQL NULL
    comparison semantics — the scan must not crash); updating an
    ADDED column over an old fragment null-fills (conform) before
    assigning, and the rewrite fragment carries the full current
    schema."""
    import pyarrow.parquet as pq_

    from kafka_delta_rs_ray.pipelines.delete import delete_where
    from kafka_delta_rs_ray.pipelines.update import update_where

    t = Table.create(str(tmp_path / "te"), IMAGE_SCHEMA)
    append(t, image_dataset(20, batch_size=20), target_fragment_rows=20)

    def with_score(b):
        return b.append_column(
            "score", pa.array([5] * b.num_rows, pa.int64())).set_column(
            0, "image_id",
            pa.array([f"g2-{i}" for i in range(b.num_rows)]))

    gen2 = image_dataset(10, seed=7, batch_size=10).map_batches(
        with_score, batch_format="pyarrow")
    append(t, gen2, target_fragment_rows=10, mode="merge_schema")

    # predicate on the added column: old fragments are all-NULL there
    # → only gen2 rows match; scan must not crash on missing column
    m = update_where(t, {"score": (5, None)}, {"caption": "SCORED"})
    assert m is not None
    tab = t.snapshot().to_arrow()
    scored = [c for c, s in zip(tab["caption"].to_pylist(),
                                tab["score"].to_pylist()) if s == 5]
    assert len(scored) == 10 and all(c == "SCORED" for c in scored)
    assert sum(1 for s in tab["score"].to_pylist() if s is None) == 20

    # update the ADDED column over ALL rows: old fragments conform
    # (null-fill) then assign — every row gets the value
    m2 = update_where(t, {"w": (None, None)}, {"score": 9})
    assert m2 is not None
    tab2 = t.snapshot().to_arrow()
    assert set(tab2["score"].to_pylist()) == {9}
    # rewrite fragments carry the full evolved schema physically
    new_frags = [f for f in m2.fragments
                 if f.id not in {x.id for x in m.fragments}]
    assert new_frags
    for f in new_frags:
        assert "score" in pq_.read_schema(t.abspath(f.path)).names

    # delete on the added column skips old fragments cleanly
    md = delete_where(t, {"score": (9, None)})
    assert md is not None
    assert t.snapshot().to_arrow().num_rows == 0


def test_update_where_conflicts_with_concurrent_compact(table):
    """UPDATE vs concurrent COMPACT on the same fragments: the update
    computed its delete files + rewrite fragments against the OLD
    layout, a compaction commits first and moves those rows — the
    update's commit must detect the dead input fragment and raise
    CommitConflict (committing would attach DVs to vanished ids and
    silently drop the update). Rerun against the fresh snapshot
    converges."""
    from kafka_delta_rs_ray.errors import CommitConflict
    from kafka_delta_rs_ray.pipelines.update import update_where

    orig = Table.commit
    state = {"fired": False}

    def hooked(build, max_attempts=3):
        if not state["fired"]:
            state["fired"] = True
            compact(Table(table.root), target_bytes=64 << 20)
        return orig(table, build, max_attempts)

    table.commit = hooked
    try:
        with pytest.raises(CommitConflict, match="rewritten"):
            update_where(table, {"w": (128, None)}, {"caption": "X"})
    finally:
        del table.commit

    m = update_where(table, {"w": (128, None)}, {"caption": "X"})
    assert m is not None
    t = table.snapshot().to_arrow()
    wide = [c for c, w in zip(t["caption"].to_pylist(),
                              t["w"].to_pylist()) if w >= 128]
    assert wide and all(c == "X" for c in wide)


def test_delete_where_conflicts_with_concurrent_compact(table):
    """Same race for predicate DELETE: DVs reference fragment ids the
    concurrent compaction removed — commit must conflict, rerun
    converges to the correct row set."""
    from kafka_delta_rs_ray.errors import CommitConflict
    from kafka_delta_rs_ray.pipelines.delete import delete_where

    n_match = int((table.snapshot().to_arrow()["w"]
                   .to_numpy(zero_copy_only=False) >= 128).sum())
    assert n_match > 0
    orig = Table.commit
    state = {"fired": False}

    def hooked(build, max_attempts=3):
        if not state["fired"]:
            state["fired"] = True
            compact(Table(table.root), target_bytes=64 << 20)
        return orig(table, build, max_attempts)

    table.commit = hooked
    try:
        with pytest.raises(CommitConflict, match="rewritten"):
            delete_where(table, {"w": (128, None)})
    finally:
        del table.commit

    n_before = table.snapshot().to_arrow().num_rows
    m = delete_where(table, {"w": (128, None)})
    assert m is not None
    assert table.snapshot().to_arrow().num_rows == n_before - n_match


def test_update_where_conflicts_with_concurrent_delete(table):
    """The lost-update race from review: UPDATE scans fragment F as
    live, a concurrent DELETE tombstones matching rows in F (F stays
    live — liveness alone would pass), then the update's commit must
    detect F's changed delete-state fingerprint and conflict —
    committing would resurrect the concurrently-deleted rows with
    updated values. Rerun after the delete converges: only surviving
    rows are updated."""
    from kafka_delta_rs_ray.errors import CommitConflict
    from kafka_delta_rs_ray.pipelines.delete import delete_where
    from kafka_delta_rs_ray.pipelines.update import update_where

    orig = Table.commit
    state = {"fired": False}

    def hooked(build, max_attempts=3):
        if not state["fired"]:
            state["fired"] = True
            delete_where(Table(table.root), {"w": (192, None)})
        return orig(table, build, max_attempts)

    table.commit = hooked
    try:
        with pytest.raises(CommitConflict, match="delete state"):
            update_where(table, {"w": (128, None)}, {"caption": "X"})
    finally:
        del table.commit

    m = update_where(table, {"w": (128, None)}, {"caption": "X"})
    assert m is not None
    t = table.snapshot().to_arrow()
    w = t["w"].to_numpy(zero_copy_only=False)
    assert (w < 192).all()  # the concurrent delete held
    caps = [c for c, ww in zip(t["caption"].to_pylist(), w) if ww >= 128]
    assert caps and all(c == "X" for c in caps)
