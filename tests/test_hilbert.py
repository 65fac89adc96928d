"""Hilbert-curve clustering key (north_star: "Z-order/Hilbert").

Deterministic curve properties are pinned exactly; the zone-map
locality comparison vs Morton uses a tolerance because both curves
are near-equivalent on the uniform part of the synth table (Hilbert's
unit-step continuity wins on skewed/boxy predicates, Morton on pure
prefix ranges).
"""

import numpy as np
import pyarrow as pa
import pytest

from kafka_delta_rs_ray.functions.hilbert import hilbert3_21, hcode_from_columns
from kafka_delta_rs_ray.functions.morton import zcode_from_columns


def test_hilbert_bijective_on_random_coords():
    rng = np.random.default_rng(11)
    n = 100_000
    x = rng.integers(0, 1 << 21, n).astype(np.uint64)
    y = rng.integers(0, 1 << 21, n).astype(np.uint64)
    z = rng.integers(0, 1 << 21, n).astype(np.uint64)
    h = hilbert3_21(x, y, z)
    n_coords = len(set(zip(x.tolist(), y.tolist(), z.tolist())))
    assert len(np.unique(h)) == n_coords
    assert int(h.max()).bit_length() <= 63  # int64-safe sort key


def test_hilbert_curve_continuity():
    """The defining Hilbert property: consecutive codes differ by ONE
    unit step in ONE coordinate (Morton jumps diagonally). Checked on
    the full 8x8x8 origin cube — a complete prefix of the curve."""
    n = 8
    g = np.arange(n, dtype=np.uint64)
    xx, yy, zz = np.meshgrid(g, g, g, indexing="ij")
    x, y, z = xx.ravel(), yy.ravel(), zz.ravel()
    h = hilbert3_21(x, y, z)
    order = np.argsort(h)
    hs = h[order].astype(np.int64)
    assert (np.diff(hs) == 1).all()  # complete prefix: codes 0..511
    steps = (np.abs(np.diff(x[order].astype(np.int64)))
             + np.abs(np.diff(y[order].astype(np.int64)))
             + np.abs(np.diff(z[order].astype(np.int64))))
    assert (steps == 1).all()

    # Morton, for contrast, takes non-unit jumps on the same cube
    from kafka_delta_rs_ray.functions.morton import morton3_21

    m = morton3_21(x, y, z)
    om = np.argsort(m)
    msteps = (np.abs(np.diff(x[om].astype(np.int64)))
              + np.abs(np.diff(y[om].astype(np.int64)))
              + np.abs(np.diff(z[om].astype(np.int64))))
    assert (msteps > 1).any()


def test_hcode_matches_zcode_packing():
    """Same input packing as the Morton key: phash top 21 bits + w/h."""
    ph = np.array([0, -1, 123456789012345], dtype=np.int64)
    w = np.array([64, 128, 256], dtype=np.int32)
    h = np.array([64, 32, 256], dtype=np.int32)
    hc = hcode_from_columns(ph, w, h)
    zc = zcode_from_columns(ph, w, h)
    assert hc.dtype == zc.dtype == np.int64
    assert (hc >= 0).all()  # 63-bit, sign-safe
    # deterministic
    assert np.array_equal(hc, hcode_from_columns(ph, w, h))


def test_cluster_with_hilbert_curve(tmp_path, ray_session):
    """cluster(curve='hilbert'): scan identity holds, zone maps exist,
    the manifest records the curve, and zone-map locality (fraction of
    fragments overlapping a box predicate) is within 15% of Morton's
    on the same data."""
    from kafka_delta_rs_ray.pipelines.cluster import cluster
    from kafka_delta_rs_ray.pipelines.ingest import append
    from kafka_delta_rs_ray.pipelines.synth import image_dataset
    from kafka_delta_rs_ray.tablefmt import IMAGE_SCHEMA, Table

    def build(root, curve):
        t = Table.create(str(root), IMAGE_SCHEMA)
        append(t, image_dataset(800, batch_size=200),
               target_fragment_rows=200)
        before = t.snapshot().to_arrow().sort_by("image_id")
        m = cluster(t, target_fragment_rows=64, curve=curve)
        after = t.snapshot().to_arrow().sort_by("image_id")
        assert before.equals(after), f"{curve}: scan changed"
        assert m.properties["cluster_curve"] == curve
        assert all("zcode" in f.stats for f in m.fragments)
        return m.fragments

    def overlap_fraction(frags):
        rng = np.random.default_rng(5)
        hits = 0
        n_q = 100
        for _ in range(n_q):
            w0 = int(rng.choice([32, 64, 128, 256]))
            p0 = int(rng.integers(-(2 ** 62), 2 ** 62))
            p1 = p0 + 2 ** 58
            for f in frags:
                s = f.stats
                if (s["w"]["min"] <= w0 <= s["w"]["max"]
                        and not (s["phash"]["max"] < p0
                                 or s["phash"]["min"] > p1)):
                    hits += 1
        return hits / (n_q * len(frags))

    fm = build(tmp_path / "tm", "morton")
    fh = build(tmp_path / "th", "hilbert")
    om, oh = overlap_fraction(fm), overlap_fraction(fh)
    assert oh <= om * 1.15, (oh, om)
