"""TableDatasink: the idiomatic ``ds.write_datasink`` write surface —
distributed fragment writes, one atomic commit in on_write_complete,
full write contract (validation, constraints, watermarks)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from kafka_delta_rs_ray.pipelines.synth import image_dataset
from kafka_delta_rs_ray.tablefmt import IMAGE_SCHEMA, Table
from kafka_delta_rs_ray.tablefmt.datasink import TableDatasink, write_table


def _pixel():
    from kafka_delta_rs_ray.codecs import encode

    return encode(np.zeros((1, 1, 3), dtype=np.uint8), "rawz")


def _row(iid, w=1, **kw):
    return {"image_id": iid, "bytes": _pixel(), "w": w, "h": 1,
            "fmt": "rawz", "caption": "c", "phash": 7, **kw}


def test_datasink_basic_commit(tmp_path, ray_session):
    t = Table.create(str(tmp_path / "t"), IMAGE_SCHEMA)
    m = write_table(image_dataset(120, batch_size=40), t,
                    target_fragment_rows=40)
    assert m is not None and m.kind == "append"
    assert t.snapshot().dataset().count() == 120
    assert len(t.snapshot().manifest.fragments) >= 3
    # scan equals a plain append of the same input
    ids = t.snapshot().to_arrow()["image_id"].to_pylist()
    assert len(set(ids)) == 120


def test_datasink_txn_watermarks(tmp_path, ray_session):
    t = Table.create(str(tmp_path / "t"), IMAGE_SCHEMA)
    m = write_table(image_dataset(30, batch_size=30), t,
                    txn={"app": {"0": 29}})
    assert m.watermark("app", 0) == 29


def test_datasink_constraints_quarantine(tmp_path, ray_session):
    t = Table.create(str(tmp_path / "t"), IMAGE_SCHEMA, constraints=[
        {"name": "w_positive", "col": "w", "op": ">", "value": 0}])
    ds = rd.from_arrow(pa.Table.from_pylist(
        [_row("ok-1", w=2), _row("bad-1", w=0)], schema=IMAGE_SCHEMA))
    write_table(ds, t)
    ids = set(t.snapshot().to_arrow()["image_id"].to_pylist())
    assert ids == {"ok-1"}
    from kafka_delta_rs_ray.stages.validate import quarantine_report

    assert quarantine_report(t.root)["rows"] == 1


def test_datasink_rejects_unknown_columns(tmp_path, ray_session):
    t = Table.create(str(tmp_path / "t"), IMAGE_SCHEMA)
    v0 = t.snapshot().version
    ds = rd.from_arrow(pa.Table.from_pylist(
        [{**_row("x-1"), "extra": 1}]))
    with pytest.raises(Exception):
        ds.write_datasink(TableDatasink(t, mode="default"))
    # failed write commits nothing
    assert t.snapshot().version == v0


def test_datasink_merge_schema_evolves(tmp_path, ray_session):
    t = Table.create(str(tmp_path / "t"), IMAGE_SCHEMA)
    write_table(image_dataset(20, batch_size=20), t)
    evolved = pa.schema(list(IMAGE_SCHEMA)
                        + [pa.field("rating", pa.int64())])
    ds = rd.from_arrow(pa.Table.from_pylist(
        [{**_row("n-1"), "rating": 5}], schema=evolved))
    m = write_table(ds, t, mode="merge_schema")
    assert "rating" in [f.name for f in m.schema]
    tb = t.snapshot().to_arrow()
    by_id = dict(zip(tb["image_id"].to_pylist(),
                     tb["rating"].to_pylist()))
    assert by_id["n-1"] == 5
    assert by_id["img-0000000001"] is None  # old rows null-fill


def test_datasink_empty_input_no_commit(tmp_path, ray_session):
    t = Table.create(str(tmp_path / "t"), IMAGE_SCHEMA)
    v0 = t.snapshot().version
    m = write_table(rd.from_arrow(IMAGE_SCHEMA.empty_table()), t)
    assert m is None
    assert t.snapshot().version == v0
