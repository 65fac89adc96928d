"""Declarative CHECK constraints: write-time row contracts riding the
dead-letter path (stages/constraints.py). Violating rows quarantine
with a per-constraint error, NULL comparisons pass (SQL CHECK), and
constraints evolve via property-only 'alter' commits."""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from kafka_delta_rs_ray.errors import ConfigError, StateError
from kafka_delta_rs_ray.pipelines.ingest import append
from kafka_delta_rs_ray.pipelines.merge import merge
from kafka_delta_rs_ray.stages.constraints import (constraint_violations,
                                                   normalize_constraints)
from kafka_delta_rs_ray.tablefmt import IMAGE_SCHEMA, Table
from kafka_delta_rs_ray.tablefmt.schema import CHANGESET_SCHEMA

def _pixel():
    from kafka_delta_rs_ray.codecs import encode

    return encode(np.zeros((1, 1, 3), dtype=np.uint8), "rawz")


def _row(iid, w=1, caption="c", phash=7):
    return {"image_id": iid, "bytes": _pixel(), "w": w, "h": 1,
            "fmt": "rawz", "caption": caption, "phash": phash}


def _chrow(iid, seq, w=1, caption="c"):
    return {**_row(iid, w=w, caption=caption), "partition_id": 0,
            "seq": seq, "op": "upsert"}


CONS = [
    {"name": "w_positive", "col": "w", "op": ">", "value": 0},
    {"name": "caption_present", "col": "caption", "op": "not_null"},
    {"name": "fmt_known", "col": "fmt", "op": "in",
     "value": ["rawz", "dctq"]},
]


def test_normalize_rejects_malformed():
    with pytest.raises(ConfigError):
        normalize_constraints([{"name": "x", "col": "w", "op": "~"}])
    with pytest.raises(ConfigError):
        normalize_constraints([{"name": "x", "col": "w", "op": ">"}])
    with pytest.raises(ConfigError):
        normalize_constraints([{"name": "x", "col": "w", "op": "in",
                                "value": []}])
    with pytest.raises(ConfigError):
        normalize_constraints(
            [{"name": "x", "col": "w", "op": ">", "value": 0},
             {"name": "x", "col": "h", "op": ">", "value": 0}])
    with pytest.raises(ConfigError):
        normalize_constraints([{"col": "w", "op": ">", "value": 0}])


def test_null_comparison_passes_not_null_rejects():
    batch = pa.table({"w": pa.array([5, None, -1], pa.int32()),
                      "caption": pa.array(["a", None, "b"])})
    bad, errors = constraint_violations(batch, normalize_constraints([
        {"name": "w_pos", "col": "w", "op": ">", "value": 0}]))
    # SQL CHECK: the NULL w passes the comparison constraint
    assert bad.tolist() == [False, False, True]
    assert "w_pos" in errors[2]

    bad, errors = constraint_violations(batch, normalize_constraints([
        {"name": "cap", "col": "caption", "op": "not_null"}]))
    assert bad.tolist() == [False, True, False]


def test_missing_column_skipped():
    batch = pa.table({"w": pa.array([1], pa.int32())})
    bad, _ = constraint_violations(batch, normalize_constraints([
        {"name": "z", "col": "zoom", "op": ">", "value": 0}]))
    assert not bad.any()


def test_append_quarantines_violators(tmp_path, ray_session):
    t = Table.create(str(tmp_path / "t"), IMAGE_SCHEMA, constraints=CONS)
    assert [c["name"] for c in t.constraints()] == [
        "w_positive", "caption_present", "fmt_known"]
    rows = [_row("ok-1"), _row("bad-w", w=0), _row("bad-cap", caption=None)]
    append(t, rd.from_arrow(pa.Table.from_pylist(rows,
                                                 schema=IMAGE_SCHEMA)))
    ids = set(t.snapshot().to_arrow()["image_id"].to_pylist())
    assert ids == {"ok-1"}
    q = glob.glob(os.path.join(t.root, "quarantine", "*.parquet"))
    qt = pa.concat_tables([pq.read_table(p) for p in q])
    errs = dict(zip(qt["image_id"].to_pylist(), qt["error"].to_pylist()))
    assert "w_positive" in errs["bad-w"]
    assert "caption_present" in errs["bad-cap"]


def test_merge_constraint_violation_advances_watermark(tmp_path,
                                                      ray_session):
    """A constraint-violating upsert dead-letters exactly like a corrupt
    payload: withheld from the table, watermark still advances, replay
    is a commit-level no-op."""
    t = Table.create(str(tmp_path / "t"), IMAGE_SCHEMA, constraints=CONS)
    append(t, rd.from_arrow(pa.Table.from_pylist(
        [_row("base-1")], schema=IMAGE_SCHEMA)))
    ch = rd.from_arrow(pa.Table.from_pylist(
        [_chrow("good-1", 10), _chrow("bad-1", 11, w=-3)],
        schema=CHANGESET_SCHEMA))
    m = merge(t, ch, app_id="cons")
    assert m is not None
    ids = set(t.snapshot().to_arrow()["image_id"].to_pylist())
    assert "good-1" in ids and "bad-1" not in ids
    assert m.watermark("cons", 0) == 11
    assert merge(t, ch, app_id="cons") is None


def test_add_drop_constraint_commits(tmp_path, ray_session):
    t = Table.create(str(tmp_path / "t"), IMAGE_SCHEMA)
    append(t, rd.from_arrow(pa.Table.from_pylist(
        [_row("pre-1", w=0)], schema=IMAGE_SCHEMA)))  # no gate yet
    m = t.add_constraint({"name": "w_positive", "col": "w",
                          "op": ">", "value": 0})
    assert m.kind == "alter"
    # duplicate name rejected through the same normalize path
    with pytest.raises(ConfigError):
        t.add_constraint({"name": "w_positive", "col": "h",
                          "op": ">", "value": 0})
    # future writes enforce; existing rows are untouched
    append(t, rd.from_arrow(pa.Table.from_pylist(
        [_row("post-ok", w=2), _row("post-bad", w=0)],
        schema=IMAGE_SCHEMA)))
    ids = set(t.snapshot().to_arrow()["image_id"].to_pylist())
    assert ids == {"pre-1", "post-ok"}
    t.drop_constraint("w_positive")
    assert t.constraints() == []
    with pytest.raises(StateError):
        t.drop_constraint("w_positive")
    append(t, rd.from_arrow(pa.Table.from_pylist(
        [_row("after-drop", w=0)], schema=IMAGE_SCHEMA)))
    assert "after-drop" in set(
        t.snapshot().to_arrow()["image_id"].to_pylist())


def test_constraint_unknown_column_rejected_at_declaration(tmp_path):
    """A typo'd column fails at create/add (schema in hand), never
    silently skips enforcement."""
    with pytest.raises(ConfigError, match="not in the table schema"):
        Table.create(str(tmp_path / "t"), IMAGE_SCHEMA, constraints=[
            {"name": "w_pos", "col": "wdith", "op": ">", "value": 0}])
    t = Table.create(str(tmp_path / "t2"), IMAGE_SCHEMA)
    with pytest.raises(ConfigError, match="not in the table schema"):
        t.add_constraint({"name": "x", "col": "nope", "op": "not_null"})


def test_datasink_all_quarantined_still_commits_watermark(tmp_path,
                                                          ray_session):
    """A write whose rows are ALL dead-lettered by a CHECK constraint
    still commits its txn watermarks (append/merge parity) — replays
    must be no-ops, not re-quarantine loops."""
    from kafka_delta_rs_ray.tablefmt.datasink import write_table

    t = Table.create(str(tmp_path / "t"), IMAGE_SCHEMA, constraints=CONS)
    ds = rd.from_arrow(pa.Table.from_pylist(
        [_row("bad-a", w=0), _row("bad-b", w=-1)], schema=IMAGE_SCHEMA))
    m = write_table(ds, t, txn={"app": {"0": 17}})
    assert m is not None and m.watermark("app", 0) == 17
    assert t.snapshot().dataset().count() == 0


def test_constraint_value_type_checked_at_declaration():
    """ADVICE r4 (low): a value that cannot be a scalar of the
    column's arrow type fails at declaration (C1 posture), not as
    ArrowInvalid inside every write task."""
    with pytest.raises(ConfigError, match="not compatible"):
        normalize_constraints(
            [{"name": "bad", "col": "w", "op": ">", "value": "abc"}],
            schema=IMAGE_SCHEMA)
    with pytest.raises(ConfigError, match="not compatible"):
        normalize_constraints(
            [{"name": "bad", "col": "fmt", "op": "in",
              "value": ["rawz", 7]}],
            schema=IMAGE_SCHEMA)
    # compatible values still pass with the schema in hand
    out = normalize_constraints(
        [{"name": "ok", "col": "w", "op": ">", "value": 0},
         {"name": "ok2", "col": "fmt", "op": "in",
          "value": ["rawz", "dctq"]}],
        schema=IMAGE_SCHEMA)
    assert len(out) == 2
    # without a schema there is nothing to check against — accepted
    assert normalize_constraints(
        [{"name": "x", "col": "w", "op": ">", "value": "abc"}])
