"""Reference-parity tests (SURVEY §5 translation table): the Rust
suite's semantics re-pinned against table maintenance.

- dup-offset test (src/pipeline/mod.rs:314-332) → duplicate seq in one
  changeset: second row dropped regardless of key
- dup-key test (src/pipeline/mod.rs:334-352) → duplicate image_id:
  lowest seq wins
- null-handling (src/pipeline/mod.rs:370-384, utils:424-459) → nullable
  caption round-trips through fragments
- mock-sink flush/commit tests (src/pipeline/mod.rs:283-293) → commit
  atomicity under fault injection: data files written but CAS never
  run → old snapshot intact, orphans invisible, expire sweeps them
"""

import os

import pyarrow as pa
import pytest

import ray.data as rd

from kafka_delta_rs_ray.pipelines.expire import expire
from kafka_delta_rs_ray.pipelines.ingest import append
from kafka_delta_rs_ray.pipelines.merge import merge
from kafka_delta_rs_ray.pipelines.synth import image_dataset
from kafka_delta_rs_ray.tablefmt import IMAGE_SCHEMA, Table
from kafka_delta_rs_ray.tablefmt.fragments import write_fragment_table
from kafka_delta_rs_ray.tablefmt.schema import CHANGESET_SCHEMA


@pytest.fixture
def table(tmp_path, ray_session):
    t = Table.create(str(tmp_path / "t"), IMAGE_SCHEMA)
    append(t, image_dataset(40, batch_size=20), target_fragment_rows=20)
    return t


import numpy as np

from kafka_delta_rs_ray.codecs import encode

_PIXEL = encode(np.zeros((1, 1, 3), dtype=np.uint8), "rawz")


def _chrow(iid, seq, caption, partition=0, op="upsert", bytes_=_PIXEL):
    return {"image_id": iid, "bytes": bytes_, "w": 1, "h": 1, "fmt": "rawz",
            "caption": caption, "phash": 7, "partition_id": partition,
            "seq": seq, "op": op}


def test_duplicate_seq_dropped(table):
    """Reference: insert with an already-seen offset is skipped even
    for a different key (offset uniqueness domain)."""
    ch = rd.from_arrow(pa.Table.from_pylist(
        [_chrow("new-a", 100, "row a"),
         _chrow("new-b", 100, "row b (dup offset)")],
        schema=CHANGESET_SCHEMA))
    merge(table, ch, app_id="dup-seq")
    t = table.snapshot().to_arrow()
    ids = set(t["image_id"].to_pylist())
    assert "new-a" in ids          # first (lowest image_id) wins
    assert "new-b" not in ids      # duplicate offset dropped


def test_seq_loser_winner_falls_back_to_next_row(table):
    """Dual-domain ordering: seq-domain losers are dropped BEFORE the
    key domain picks the lowest surviving seq. Key new-c's seq-400 row
    loses the offset domain (duplicate of new-a's seq 400), so new-c
    must keep its seq-401 row — the optimistic key dedup would have
    picked seq 400, and the repair pass must splice in the survivor."""
    ch = rd.from_arrow(pa.Table.from_pylist(
        [_chrow("new-a", 400, "a owns offset 400"),
         _chrow("new-c", 400, "c loses offset 400"),
         _chrow("new-c", 401, "c survivor")],
        schema=CHANGESET_SCHEMA))
    merge(table, ch, app_id="dup-seq-fallback")
    t = table.snapshot().to_arrow()
    rows = {r["image_id"]: r["caption"] for r in t.to_pylist()
            if r["image_id"] in ("new-a", "new-c")}
    assert rows["new-a"] == "a owns offset 400"
    assert rows["new-c"] == "c survivor"


def test_exact_duplicate_row_survives_once(table):
    """At-least-once redelivery of the SAME row (same partition, seq
    AND key) must apply the row once, not drop it entirely — the loser
    identity is counted, not set-membership (a set cannot distinguish
    the surviving copy from the losing copies of one triple)."""
    ch = rd.from_arrow(pa.Table.from_pylist(
        [_chrow("new-x", 500, "copy 1"),
         _chrow("new-x", 500, "copy 2")],
        schema=CHANGESET_SCHEMA))
    merge(table, ch, app_id="exact-dup")
    t = table.snapshot().to_arrow()
    rows = [r for r in t.to_pylist() if r["image_id"] == "new-x"]
    assert len(rows) == 1
    assert rows[0]["caption"] in ("copy 1", "copy 2")


def test_exact_duplicate_does_not_shadow_lower_seq(table):
    """With an exact-duplicate pair at seq 500 plus a seq-9 row for the
    same key, the key domain must keep the seq-9 row (the duplicate
    pair resolves to one survivor, which then loses the key domain)."""
    ch = rd.from_arrow(pa.Table.from_pylist(
        [_chrow("new-y", 500, "late copy 1"),
         _chrow("new-y", 500, "late copy 2"),
         _chrow("new-y", 9, "early winner")],
        schema=CHANGESET_SCHEMA))
    merge(table, ch, app_id="exact-dup-shadow")
    t = table.snapshot().to_arrow()
    rows = [r for r in t.to_pylist() if r["image_id"] == "new-y"]
    assert len(rows) == 1 and rows[0]["caption"] == "early winner"


def test_seq_losers_distributed_matches_driver_path(ray_session):
    """The >2M-row distributed groupby path must produce the same
    loser set as the driver fast path on any input."""
    from kafka_delta_rs_ray.pipelines.merge import _seq_losers

    rows = [_chrow(f"k{i}", 100 + (i % 5), f"c{i}", partition=i % 3)
            for i in range(60)]
    ds = rd.from_arrow(pa.Table.from_pylist(rows, schema=CHANGESET_SCHEMA))
    fast = _seq_losers(ds, n_buckets=4, n_rows=len(rows))
    dist = _seq_losers(ds, n_buckets=4, n_rows=None)
    assert fast == dist and len(fast) > 0


def test_duplicate_key_keeps_lowest_seq(table):
    ch = rd.from_arrow(pa.Table.from_pylist(
        [_chrow("new-k", 201, "second"), _chrow("new-k", 200, "first")],
        schema=CHANGESET_SCHEMA))
    merge(table, ch, app_id="dup-key")
    t = table.snapshot().to_arrow()
    rows = [r for r in t.to_pylist() if r["image_id"] == "new-k"]
    assert len(rows) == 1 and rows[0]["caption"] == "first"


def test_null_caption_roundtrip(table):
    ch = rd.from_arrow(pa.Table.from_pylist(
        [_chrow("null-cap", 300, None)], schema=CHANGESET_SCHEMA))
    merge(table, ch, app_id="nulls")
    t = table.snapshot().to_arrow()
    row = [r for r in t.to_pylist() if r["image_id"] == "null-cap"]
    assert len(row) == 1 and row[0]["caption"] is None


def test_commit_atomicity_fault_injection(table):
    """Crash between fragment write and CAS: the fragment exists on
    disk but no manifest references it → every snapshot unchanged;
    expire sweeps the orphan; a later retry (re-write + commit)
    succeeds and the orphan never resurfaces."""
    v_before = table.latest_version()
    rows_before = table.snapshot().to_arrow().num_rows

    # simulate the crash: fragment written, commit never runs
    orphan_tbl = pa.Table.from_pylist(
        [{"image_id": "orphan", "bytes": b"x", "w": 1, "h": 1,
          "fmt": "rawz", "caption": "c", "phash": 0}], schema=IMAGE_SCHEMA)
    frag = write_fragment_table(orphan_tbl, table.root, "crashed-run")
    assert os.path.exists(table.abspath(frag.path))

    assert table.latest_version() == v_before
    assert table.snapshot().to_arrow().num_rows == rows_before  # invisible

    report = expire(table, keep_last=1, min_age_seconds=0)
    assert frag.path in report["removed_files"]  # orphan swept
    assert not os.path.exists(table.abspath(frag.path))
    assert table.snapshot().to_arrow().num_rows == rows_before

    # the retry path: same logical work, new run-scoped file, commits
    ch = rd.from_arrow(pa.Table.from_pylist(
        [_chrow("orphan", 400, "retried")], schema=CHANGESET_SCHEMA))
    m = merge(table, ch, app_id="retry")
    assert m is not None
    t = table.snapshot().to_arrow()
    assert "orphan" in set(t["image_id"].to_pylist())


def test_expire_min_age_protects_inflight(table):
    """A just-written pre-commit file survives expire when
    min_age_seconds exceeds its age (in-flight writer protection)."""
    orphan_tbl = pa.Table.from_pylist(
        [{"image_id": "inflight", "bytes": b"x", "w": 1, "h": 1,
          "fmt": "rawz", "caption": "c", "phash": 0}], schema=IMAGE_SCHEMA)
    frag = write_fragment_table(orphan_tbl, table.root, "inflight-run")
    report = expire(table, keep_last=1, min_age_seconds=3600)
    assert frag.path not in report["removed_files"]
    assert os.path.exists(table.abspath(frag.path))


def test_corrupt_payload_quarantined_watermark_advances(table, tmp_path):
    """Dead-letter parity (src/kafka/mod.rs:288-300): a corrupt payload
    never reaches the table, lands in quarantine/ with its error, and
    its seq still advances the watermark (the reference commits offsets
    for dead-lettered messages too) — so the batch is not replayed."""
    import glob

    import pyarrow.parquet as pq

    ch = rd.from_arrow(pa.Table.from_pylist(
        [_chrow("good-1", 500, "fine"),
         _chrow("bad-1", 501, "corrupt", bytes_=b"not-an-image")],
        schema=CHANGESET_SCHEMA))
    m = merge(table, ch, app_id="dlq")
    assert m is not None
    ids = set(table.snapshot().to_arrow()["image_id"].to_pylist())
    assert "good-1" in ids and "bad-1" not in ids

    q = glob.glob(os.path.join(table.root, "quarantine", "*.parquet"))
    assert q, "quarantine file missing"
    qt = pa.concat_tables([pq.read_table(p) for p in q])
    assert "bad-1" in set(qt["image_id"].to_pylist())
    assert qt.num_rows >= 1 and "error" in qt.column_names

    # watermark covers the quarantined seq → replay is a no-op
    assert m.watermark("dlq", 0) == 501
    assert merge(table, ch, app_id="dlq") is None


def test_all_quarantined_still_advances_watermark(table):
    ch = rd.from_arrow(pa.Table.from_pylist(
        [_chrow("bad-2", 600, "corrupt", bytes_=b"")],
        schema=CHANGESET_SCHEMA))
    m = merge(table, ch, app_id="dlq2")
    assert m is not None and m.watermark("dlq2", 0) == 600
    assert "bad-2" not in set(table.snapshot().to_arrow()["image_id"].to_pylist())
    assert merge(table, ch, app_id="dlq2") is None  # no infinite replay


def test_merge_backlog_gauge(table):
    """Offset-lag parity (src/kafka/mod.rs:199-208): pending = staged
    rows above the committed watermark, per partition; drained to zero
    by the merge, reported per partition before it."""
    from kafka_delta_rs_ray.pipelines.merge import merge_backlog

    ch = rd.from_arrow(pa.Table.from_pylist(
        [_chrow("bl-1", 700, "a", partition=0),
         _chrow("bl-2", 701, "b", partition=0),
         _chrow("bl-3", 50, "c", partition=1)],
        schema=CHANGESET_SCHEMA))
    assert merge_backlog(table, ch, "bl") == {0: 2, 1: 1}
    merge(table, ch, app_id="bl")
    assert merge_backlog(table, ch, "bl") == {}


def test_concurrent_merges_both_commit(table):
    """Two writers race the manifest CAS (the reference's commit-retry
    loop, src/kafka/mod.rs:192-228): the loser re-reads, revalidates,
    retries; both changesets land; the ledger carries both app_ids."""
    import threading

    ch_a = rd.from_arrow(pa.Table.from_pylist(
        [_chrow(f"cc-a-{i}", 800 + i, "a") for i in range(5)],
        schema=CHANGESET_SCHEMA)).materialize()
    ch_b = rd.from_arrow(pa.Table.from_pylist(
        [_chrow(f"cc-b-{i}", 900 + i, "b") for i in range(5)],
        schema=CHANGESET_SCHEMA)).materialize()

    errs = []

    def go(ch, app):
        try:
            assert merge(table, ch, app_id=app) is not None
        except Exception as e:  # noqa: BLE001 - collected for the assert
            errs.append((app, e))

    threads = [threading.Thread(target=go, args=(ch_a, "ccA")),
               threading.Thread(target=go, args=(ch_b, "ccB"))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs

    snap = table.snapshot()
    ids = set(snap.to_arrow()["image_id"].to_pylist())
    assert all(f"cc-a-{i}" in ids and f"cc-b-{i}" in ids for i in range(5))
    txn = snap.manifest.txn
    assert txn["ccA"]["0"] == 804 and txn["ccB"]["0"] == 904


def test_stream_ingest_flush_and_crash_replay(table):
    """The reference's consumer loop (size-triggered flush, final flush
    at stream end, crash-replay absorbed): a 'crashed' consumer re-sends
    its whole stream; every replayed micro-batch is a no-op, fresh rows
    still land."""
    from kafka_delta_rs_ray.pipelines.stream import stream_ingest

    def mb(lo, hi, part=0):
        return pa.Table.from_pylist(
            [_chrow(f"st-{s}", s, f"cap {s}", partition=part)
             for s in range(lo, hi)], schema=CHANGESET_SCHEMA)

    src = [mb(1000, 1004), mb(1004, 1008), mb(1008, 1010)]
    stats = stream_ingest(table, src, app_id="stream",
                          max_buffer_rows=6, max_wait_secs=3600)
    # 4+4 rows trip the 6-row trigger → flush; the 2-row tail flushes
    # at stream end (reference: final flush, src/kafka/mod.rs:243-250)
    assert stats["flushes"] == 2 and stats["rows_in"] == 10
    assert len(stats["committed_versions"]) == 2
    ids = set(table.snapshot().to_arrow()["image_id"].to_pylist())
    assert all(f"st-{s}" in ids for s in range(1000, 1010))

    # crash replay: same stream + one genuinely new micro-batch
    stats2 = stream_ingest(table, src + [mb(1010, 1012)], app_id="stream",
                           max_buffer_rows=6, max_wait_secs=3600)
    assert len(stats2["committed_versions"]) >= 1  # only fresh rows commit
    t2 = table.snapshot().to_arrow()
    ids2 = [i for i in t2["image_id"].to_pylist() if i.startswith("st-")]
    assert sorted(ids2) == sorted({f"st-{s}" for s in range(1000, 1012)})
    assert len(ids2) == len(set(ids2))  # no duplicates from the replay


def test_stream_ingest_multi_source_crash_replay(table):
    """Multi-topic parity (reference subscribes N topics with one
    consumer, src/kafka/mod.rs:113-157): two sources interleave
    round-robin, each owning its partition_id; a crash replays BOTH
    streams and every replayed row is absorbed by the per-partition
    watermarks."""
    from kafka_delta_rs_ray.pipelines.stream import stream_ingest

    def mb(prefix, lo, hi, part=0):
        return pa.Table.from_pylist(
            [_chrow(f"{prefix}-{s}", s, f"cap {s}", partition=part)
             for s in range(lo, hi)], schema=CHANGESET_SCHEMA)

    src_a = [mb("ms-a", 100, 104), mb("ms-a", 104, 106)]
    src_b = [mb("ms-b", 100, 103, 1)]
    stats = stream_ingest(table, None, app_id="ms",
                          sources=[src_a, src_b],
                          max_buffer_rows=5, max_wait_secs=3600)
    assert stats["rows_in"] == 9
    ids = set(table.snapshot().to_arrow()["image_id"].to_pylist())
    assert all(f"ms-a-{s}" in ids for s in range(100, 106))
    assert all(f"ms-b-{s}" in ids for s in range(100, 103))
    wm = table.read_manifest().txn["ms"]
    assert wm["0"] == 105 and wm["1"] == 102  # per-source watermarks

    # crash: both streams replayed in full, plus one fresh batch on b
    stats2 = stream_ingest(table, None, app_id="ms",
                           sources=[src_a, src_b + [mb("ms-b", 103, 105, 1)]],
                           max_buffer_rows=5, max_wait_secs=3600)
    t2 = table.snapshot().to_arrow()
    ids2 = [i for i in t2["image_id"].to_pylist() if i.startswith("ms-")]
    assert len(ids2) == len(set(ids2))  # no dup from the replay
    assert sorted(set(ids2)) == sorted(
        {f"ms-a-{s}" for s in range(100, 106)}
        | {f"ms-b-{s}" for s in range(100, 105)})


def test_quarantine_write_retry(table, tmp_path, monkeypatch):
    """Dead-letter send retry parity (3 attempts / backoff, reference
    src/kafka/mod.rs:52-80): transient quarantine-write failures are
    retried; the record lands and the corrupt row stays out of the
    table."""
    import pyarrow.parquet as pq_mod

    from kafka_delta_rs_ray.stages.validate import ValidateImages

    calls = {"n": 0}
    real_write = pq_mod.write_table

    def flaky(tbl, dest, **kw):
        calls["n"] += 1
        if calls["n"] <= 2:
            raise OSError("transient storage error")
        return real_write(tbl, dest, **kw)

    monkeypatch.setattr("kafka_delta_rs_ray.stages.validate.pq.write_table",
                        flaky)
    v = ValidateImages(table.root, run_id="qr", retry_backoff_secs=0.01)
    batch = pa.Table.from_pylist(
        [_chrow("ok-1", 1, "fine"),
         _chrow("bad-1", 2, "corrupt", bytes_=b"\x00garbage")],
        schema=CHANGESET_SCHEMA)
    out = v(batch)
    assert out["image_id"].to_pylist() == ["ok-1"]  # bad row withheld
    assert calls["n"] == 3 and v.quarantined == 1
    import glob

    qfiles = glob.glob(os.path.join(table.root, "quarantine", "q-qr-*.parquet"))
    assert len(qfiles) == 1  # record landed despite two failures


def test_quarantine_write_gives_up_after_retries(table, monkeypatch):
    """Permanent quarantine-write failure: logged and counted, rows
    STILL withheld from the table (audit loss, never corruption)."""
    from kafka_delta_rs_ray.stages.validate import ValidateImages

    def always_fail(tbl, dest, **kw):
        raise OSError("disk on fire")

    monkeypatch.setattr("kafka_delta_rs_ray.stages.validate.pq.write_table",
                        always_fail)
    v = ValidateImages(table.root, run_id="qf", retry_backoff_secs=0.0)
    batch = pa.Table.from_pylist(
        [_chrow("bad-2", 3, "corrupt", bytes_=b"nope")],
        schema=CHANGESET_SCHEMA)
    out = v(batch)
    assert out.num_rows == 0  # corrupt row never reaches a fragment
    assert v.quarantine_write_failures == 1 and v.quarantined == 0


def test_stream_ingest_time_trigger(table):
    """max_wait_secs=0 → every poll flushes (the reference's elapsed >=
    max_wait_secs arm, src/kafka/mod.rs:182-190)."""
    from kafka_delta_rs_ray.pipelines.stream import stream_ingest

    src = [pa.Table.from_pylist([_chrow(f"tw-{s}", 2000 + s, "t")],
                                schema=CHANGESET_SCHEMA) for s in range(3)]
    stats = stream_ingest(table, src, app_id="tw",
                          max_buffer_rows=10_000, max_wait_secs=0.0)
    assert stats["flushes"] == 3  # time trigger fired per micro-batch
    ids = set(table.snapshot().to_arrow()["image_id"].to_pylist())
    assert all(f"tw-{s}" in ids for s in range(3))


def test_quarantine_report(table):
    """Dead-letter audit surface: per-error counts without touching
    payload bytes (A1 metric parity, src/monitoring/mod.rs:150-202)."""
    from kafka_delta_rs_ray.stages.validate import (ValidateImages,
                                                    quarantine_report)

    v = ValidateImages(table.root, run_id="qrep")
    batch = pa.Table.from_pylist(
        [_chrow("b1", 1, "x", bytes_=b"junk"),
         _chrow("b2", 2, "y", bytes_=b""),
         _chrow("b3", 3, "z", bytes_=b"more-junk")],
        schema=CHANGESET_SCHEMA)
    v(batch)
    rep = quarantine_report(table.root, run_id="qrep")
    assert rep["rows"] == 3 and rep["files"] == 1
    assert rep["errors"]["empty payload"] == 1
    assert sum(rep["errors"].values()) == 3
    # unscoped report includes this run too
    assert quarantine_report(table.root)["rows"] >= 3


def test_replayed_flush_with_shared_run_id_is_noop(table):
    """stream_ingest passes ONE ctx.run_id to every flush, so the
    per-merge quarantine count must not glob earlier flushes' files:
    a fully-replayed later flush would then see n_fresh>0, skip the
    no-op return and commit a spurious empty merge version."""
    ch = rd.from_arrow(pa.Table.from_pylist(
        [_chrow("sq-good", 800, "fine"),
         _chrow("sq-bad", 801, "corrupt", bytes_=b"not-an-image")],
        schema=CHANGESET_SCHEMA))
    m1 = merge(table, ch, app_id="sharedrun", run_id="shared-run-1")
    assert m1 is not None
    v1 = table.read_manifest().version
    # full replay, SAME run_id (as stream_ingest does): no new rows,
    # no new quarantine files -> must be a commit-level no-op
    assert merge(table, ch, app_id="sharedrun", run_id="shared-run-1") is None
    assert table.read_manifest().version == v1


def test_distributed_changed_key_path_matches_driver_path(tmp_path,
                                                          ray_session):
    """Above driver_keys_max, merge swaps the driver key set +
    broadcast for sorted-block-range prune + hash-partitioned
    semi-join + worker-written per-fragment delete files. Results must
    be IDENTICAL to the driver path on the same input, including
    deleted_rows accounting across a second overlapping merge (the
    dead-key subtraction now runs inside the per-fragment task)."""
    def mk(root):
        t = Table.create(str(root), IMAGE_SCHEMA)
        append(t, image_dataset(60, batch_size=20), target_fragment_rows=20)
        return t

    def ch(tag, lo, hi, seq0):
        from kafka_delta_rs_ray.pipelines.synth import image_id_for
        rows = [_chrow(image_id_for(i), seq0 + i, f"{tag}-{i}")
                for i in range(lo, hi)]
        rows.append(_chrow(image_id_for(hi), seq0 + hi, None, op="delete"))
        return rd.from_arrow(pa.Table.from_pylist(
            rows, schema=CHANGESET_SCHEMA)).materialize()

    t_drv = mk(tmp_path / "drv")
    t_dst = mk(tmp_path / "dst")
    c1 = ch("v1", 5, 25, 1000)
    merge(t_drv, c1, app_id="eq")
    m1 = merge(t_dst, c1, app_id="eq", driver_keys_max=1)
    assert m1 is not None

    def scan(t):
        tb = t.snapshot().to_arrow()
        return tb.select(sorted(tb.column_names)).sort_by("image_id")

    assert scan(t_drv).equals(scan(t_dst))
    # worker-side delete files: every touched fragment got its OWN file
    dst_frags = [f for f in t_dst.snapshot().manifest.fragments
                 if f.delete_paths]
    assert dst_frags, "distributed merge attached no deletion vectors"
    assert len({p for f in dst_frags for p in f.delete_paths}) \
        == len(dst_frags)
    dd = {f.id: f.deleted_rows for f in t_dst.snapshot().manifest.fragments}
    dv = {f.id: f.deleted_rows for f in t_drv.snapshot().manifest.fragments}
    assert sorted(dd.values()) == sorted(dv.values())

    # second, overlapping merge: dead-key subtraction must not double
    # count deleted_rows on either path
    c2 = ch("v2", 15, 35, 2000)
    merge(t_drv, c2, app_id="eq")
    assert merge(t_dst, c2, app_id="eq", driver_keys_max=1) is not None
    assert scan(t_drv).equals(scan(t_dst))
    sum_drv = sum(f.deleted_rows
                  for f in t_drv.snapshot().manifest.fragments)
    sum_dst = sum(f.deleted_rows
                  for f in t_dst.snapshot().manifest.fragments)
    assert sum_drv == sum_dst
    # replay on the distributed path is still a no-op
    assert merge(t_dst, c2, app_id="eq", driver_keys_max=1) is None
