"""Every SQL-expressible query vs its DuckDB oracle at sf0.001 —
mirrors the driver's compare (row count + schema-insensitive,
order-insensitive value comparison)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from kafka_delta_rs_ray.ops.queries import ORACLES, QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * "
                  f"FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    raise TypeError(type(result))


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, con, ray_session):
    ray_df = _canon(_to_pandas(QUERIES[name](SF_DIR)))
    sql_df = _canon(con.execute(ORACLES[name]).df())
    assert len(ray_df) == len(sql_df), f"{name}: row count"
    assert list(ray_df.columns) == list(sql_df.columns), f"{name}: columns"
    for col in ray_df.columns:
        a, b = ray_df[col], sql_df[col]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            assert np.allclose(a.astype(float), b.astype(float),
                               rtol=1e-9, atol=1e-9), f"{name}.{col}"
        else:
            assert a.astype(str).tolist() == b.astype(str).tolist(), \
                f"{name}.{col}"


def test_rows_only_queries_run(ray_session):
    """Non-SQL queries at least produce stable, non-erroring output."""
    for name in sorted(set(QUERIES) - set(ORACLES)):
        out = _to_pandas(QUERIES[name](SF_DIR))
        assert out is not None, name
        # deterministic across two runs
        out2 = _to_pandas(QUERIES[name](SF_DIR))
        pd.testing.assert_frame_equal(
            _canon(out), _canon(out2), check_dtype=False)


def test_quantiles_forced_multi_pass(ray_session):
    """The histogram-refinement selection must stay exact when the
    collect threshold forces multiple passes AND when duplicate-heavy
    buckets can never shrink below the threshold (single-distinct-
    value ranges terminate via the rmin==rmax detector)."""
    import duckdb

    from kafka_delta_rs_ray.ops.queries import (events_value_quantiles,
                                                events_value_quantiles_sql)

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    ora = {float(k): v
           for k, v in con.execute(events_value_quantiles_sql()).fetchall()}
    got = events_value_quantiles(sf, collect_threshold=2)
    assert dict(zip(got["q"].to_pylist(), got["value"].to_pylist())) == ora


def test_quantiles_cont_interpolation_exact(tmp_path, ray_session):
    """percentile_cont through the engine: interpolated values (frac
    not 0) match numpy's linear quantile bit-for-bit on a dataset where
    quartile positions fall BETWEEN order statistics, both grouped and
    global, including with a forced multi-pass collect threshold."""
    import pyarrow.parquet as pq

    import ray.data as rd

    from kafka_delta_rs_ray.ops.quantiles import quantiles_cont

    rng = np.random.default_rng(11)
    n = 1002  # (n-1)*0.25 = 250.25 → real interpolation
    vals = rng.normal(size=n) * 100
    grp = np.where(np.arange(n) % 2 == 0, "a", "b")
    t = pd.DataFrame({"g": grp, "v": vals})
    p = tmp_path / "q.parquet"
    pq.write_table(__import__("pyarrow").Table.from_pandas(t), str(p))
    ds = rd.read_parquet(str(p))

    out = quantiles_cont(ds, "v", [0.25, 0.5, 0.75], group_col="g",
                         collect_threshold=4).to_pandas()
    for g in ("a", "b"):
        gv = t.loc[t["g"] == g, "v"].to_numpy()
        for q in (0.25, 0.5, 0.75):
            want = round(float(np.quantile(gv, q, method="linear")), 6)
            got = float(out.loc[(out["g"] == g) & (out["q"] == q),
                                "value"].iloc[0])
            assert got == want, (g, q, got, want)

    glob = quantiles_cont(ds, "v", [0.9]).to_pandas()
    assert float(glob["value"].iloc[0]) == round(
        float(np.quantile(vals, 0.9, method="linear")), 6)


def test_quantiles_adjacent_doubles_duplicate_runs(tmp_path, ray_session):
    """Two adjacent float64 doubles, each duplicated far past the
    collect threshold: refinement can't subdivide and must resolve
    the rank with the exact counting pass instead of stalling to a
    silent null."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kafka_delta_rs_ray.ops.queries import (events_value_quantiles,
                                                events_value_quantiles_sql)

    a = 1.5
    b = float(np.nextafter(a, np.inf))
    vals = [a] * 300 + [b] * 300
    pq.write_table(pa.table({"value": pa.array(vals, pa.float64())}),
                   str(tmp_path / "events.parquet"))

    got = events_value_quantiles(str(tmp_path), collect_threshold=2)
    gd = dict(zip(got["q"].to_pylist(), got["value"].to_pylist()))
    assert None not in gd.values()

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    ora = {float(k): v
           for k, v in con.execute(events_value_quantiles_sql()).fetchall()}
    assert gd == ora


def test_analytics_shuffle_groups_scale_with_input():
    """The window/join analytics family's exchange-group count grows
    with input rows (no more fixed 64-way bucket putting corpus/64
    rows in one task at scale) and hash_bucket co-locates equal keys
    for any modulus."""
    from kafka_delta_rs_ray.ops.dedup import TARGET_GROUP_ROWS
    from kafka_delta_rs_ray.ops.queries import hash_bucket, n_key_groups

    assert n_key_groups(1_000) == 64                      # floor
    assert n_key_groups(10**7) == 10**7 // TARGET_GROUP_ROWS
    assert n_key_groups(10**9) > n_key_groups(10**7) > 64  # grows
    assert n_key_groups(10**12) <= 1 << 20                # cap

    ids = np.array([5, -3, 5, 7, 2**40 + 5, -3], dtype=np.int64)
    for n in (64, 1000, 4096):
        b = hash_bucket(ids, n)
        assert b[0] == b[2] and b[1] == b[5]               # co-location
        assert ((b >= 0) & (b < n)).all()
    # sequential ids spread across groups rather than aliasing
    seq = hash_bucket(np.arange(0, 64_000, 64, dtype=np.int64), 64)
    assert len(np.unique(seq)) > 32


def test_quantile_rank_exact_arithmetic(ray_session):
    """Rank ceil(q*n) must use exact arithmetic: 0.07*100 is
    7.000000000000001 in binary, so a float ceil returns the 8th
    smallest instead of the 7th (the documented percentile_disc
    contract and the DuckDB oracle both say 7)."""
    import ray.data as rd

    from kafka_delta_rs_ray.ops.quantiles import quantiles_disc

    ds = rd.from_pandas(
        pd.DataFrame({"value": np.arange(1.0, 101.0)})).repartition(4)
    t = quantiles_disc(ds, "value", [0.07, 0.29, 0.5])
    got = dict(zip(t["q"].to_pylist(), t["value"].to_pylist()))
    con = duckdb.connect()
    ora = {q: con.execute(
        f"SELECT percentile_disc({q}) WITHIN GROUP (ORDER BY v) "
        f"FROM unnest(generate_series(1, 100)) AS t(v)").fetchone()[0]
        for q in (0.07, 0.29, 0.5)}
    assert got == {q: float(v) for q, v in ora.items()}
    assert got[0.07] == 7.0  # the float-ceil bug returned 8.0


def test_grouped_quantile_forced_multi_pass(ray_session):
    """Grouped refinement stays exact when forced through multiple
    passes per group (collect_threshold=2)."""
    import duckdb

    from kafka_delta_rs_ray.ops.quantiles import grouped_quantile_disc
    from kafka_delta_rs_ray.ops.queries import (
        _read, events_value_median_by_type_sql)

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    ora = dict(con.execute(events_value_median_by_type_sql()).fetchall())
    t = grouped_quantile_disc(_read(sf, "events", ["event_type", "value"]),
                              "event_type", "value", 0.5,
                              collect_threshold=2)
    assert dict(zip(t["event_type"].to_pylist(),
                    t["value"].to_pylist())) == ora

def test_sample_priority_shift_matches_unsigned_order():
    """doc_sample_bottomk / events_value_quantile_sketch sort an int64
    view of (id * odd64 − 2^63): that shift must reproduce the
    oracle's UNSIGNED mod-2^64 priority order exactly, including ids
    whose priority lands on both sides of the 2^63 wrap boundary."""
    from kafka_delta_rs_ray.ops.queries import _SAMPLE_MIX

    rng = np.random.default_rng(7)
    ids = np.concatenate([
        rng.integers(0, 1 << 62, 4096, dtype=np.uint64),
        np.array([0, 1, 2, (1 << 64) - 1, 1 << 63], dtype=np.uint64),
    ])
    with np.errstate(over="ignore"):
        pri_unsigned = ids * np.uint64(_SAMPLE_MIX)          # mod 2^64
        pri_shifted = (pri_unsigned
                       - np.uint64(1 << 63)).view(np.int64)  # int64 view
    # the wrap boundary is actually exercised
    assert (pri_unsigned >= np.uint64(1 << 63)).any()
    assert (pri_unsigned < np.uint64(1 << 63)).any()
    order_u = np.argsort(pri_unsigned, kind="stable")
    order_s = np.argsort(pri_shifted, kind="stable")
    assert (order_u == order_s).all()

def test_range_window_segment_loop_matches_composite(ray_session,
                                                     monkeypatch):
    """Force the RANGE-frame kernel's per-user-segment fallback
    (key_max 0 → the composite seg_id·L key is 'too big') and pin
    exact equality with the composite-key path."""
    from kafka_delta_rs_ray.ops import queries as q

    def run():
        out = q.events_value_7d_sum(SF_DIR).to_pandas()
        return (out.sort_values("event_id").reset_index(drop=True)
                [["event_id", "user_id", "v7d_sum_micro"]])

    composite = run()
    monkeypatch.setattr(q, "RANGE_WINDOW_KEY_MAX", 0)
    fallback = run()
    pd.testing.assert_frame_equal(composite, fallback)


def test_pareto_narrowing_paths_match_pull_path(ray_session):
    """customers_pareto_80's three termination regimes must agree: the
    default bounded driver pull (sf0.001 customer count sits under
    pull_max), the range-bucket narrowing forced to a small pull, and
    pull_max=0 which narrows all the way to the single-valued
    closed-form crossing."""
    from kafka_delta_rs_ray.ops.queries import customers_pareto_80

    base = customers_pareto_80(SF_DIR)
    narrowed = customers_pareto_80(SF_DIR, pull_max=4)
    closed = customers_pareto_80(SF_DIR, pull_max=0)
    pd.testing.assert_frame_equal(base, narrowed)
    pd.testing.assert_frame_equal(base, closed)


def test_gap_fill_zero_fills_missing_days(tmp_path, ray_session):
    """sf0.01 has every calendar day populated, so the zero-fill path
    never fires there — pin it on a synthetic sparse table: events on
    Jan 1/4/9 only must yield a 9-row spine with six zero days, and
    match the DuckDB generate_series oracle exactly."""
    import pyarrow.parquet as pq

    from kafka_delta_rs_ray.ops.queries import (
        events_daily_gap_filled, events_daily_gap_filled_sql)

    days = ["2024-01-01", "2024-01-04", "2024-01-04", "2024-01-09"]
    tbl = pa.table({
        "ts": pa.array([pd.Timestamp(d) for d in days],
                       type=pa.timestamp("us")),
        "user_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "event_type": ["click"] * 4,
        "event_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "value": pa.array([0.0] * 4),
        "props": ["{}"] * 4})
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    out = events_daily_gap_filled(str(tmp_path))
    assert len(out) == 9
    assert out["n"].tolist() == [1, 0, 0, 2, 0, 0, 0, 0, 1]

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    oracle = con.execute(events_daily_gap_filled_sql()).df()
    got = _canon(out)
    want = _canon(oracle)
    assert got["n"].astype(int).tolist() == want["n"].astype(int).tolist()
    assert (got["day"].astype(str).tolist()
            == want["day"].astype(str).tolist())


def test_bloom_filter_properties():
    """The semi-join's pruning sidecar: zero false negatives ever,
    false-positive rate within ~4x of the (1-e^(-kn/m))^k design point
    at 16 bits/key, and per-batch partial unions bit-identical to a
    single bulk insert (the property the distributed OR-tree relies
    on)."""
    from kafka_delta_rs_ray.functions.bloom import (bloom_bits,
                                                    bloom_insert,
                                                    bloom_test)

    rng = np.random.default_rng(7)
    keys = rng.choice(2**62, size=20_000, replace=False)
    members, outside = keys[:10_000], keys[10_000:]

    words = np.zeros(bloom_bits(len(members)) // 64, dtype=np.uint64)
    bloom_insert(words, members)
    assert bloom_test(words, members).all()  # no false negatives

    fp = bloom_test(words, outside).mean()
    assert fp < 4 * 6e-4, fp

    # partial-union == bulk-insert, any split
    merged = np.zeros_like(words)
    for chunk in np.array_split(members, 13):
        part = np.zeros_like(words)
        bloom_insert(part, chunk)
        merged |= part
    assert np.array_equal(merged, words)


def test_cms_sketch_properties():
    """The frequency-prune sidecar: estimates never undercount (the
    property the threshold prune's zero-false-negative claim rests
    on), overcounts stay within the e·N/w design bound, and summed
    per-chunk partial sketches are bit-identical to one bulk insert
    (the distributed reduce-tree's correctness property)."""
    from kafka_delta_rs_ray.functions.cms import (D_ROWS, cms_insert,
                                                  cms_query, cms_width)

    rng = np.random.default_rng(11)
    # zipf-ish: few hot keys, long tail
    keys = np.concatenate([
        np.repeat(rng.choice(2**62, size=20, replace=False), 500),
        rng.choice(2**62, size=50_000)])
    rng.shuffle(keys)

    w = cms_width(len(keys), 100)
    counts = np.zeros((D_ROWS, w), dtype=np.int64)
    cms_insert(counts, keys)

    uniq, true = np.unique(keys, return_counts=True)
    est = cms_query(counts, uniq)
    assert (est >= true).all()  # never undercounts
    over = est - true
    assert over.mean() <= np.e * len(keys) / w  # design bound
    # hot-key estimates are near-exact (small additive noise) at this width
    hot = true >= 400
    assert (over[hot] <= 0.05 * true[hot]).all()

    merged = np.zeros_like(counts)
    for chunk in np.array_split(keys, 17):
        part = np.zeros_like(counts)
        cms_insert(part, chunk)
        merged += part
    assert np.array_equal(merged, counts)


def test_fuzzy_token_match_on_typo_corpus(tmp_path, ray_session):
    """The testdata vocabulary has no edit-distance-1 pairs (the
    registry entry is legitimately empty there), so pin the SymSpell
    blocking + exact-verify path on a corpus WITH typos: planted
    variants of dictionary words must surface with their exact
    frequencies and match the DuckDB levenshtein cross-join oracle,
    and the _lev_is_1 verify must agree with true edit distance on
    adversarial cases."""
    import pyarrow.parquet as pq

    from kafka_delta_rs_ray.ops.queries import (_lev_is_1,
                                                doc_fuzzy_token_match,
                                                doc_fuzzy_token_match_sql)

    # substitution, deletion, insertion variants + unrelated tokens
    texts = (["database systems scale horizontally"] * 30
             + ["databse systems", "databases scale", "scal out",
                "horizontally databaze", "sustems vertical",
                "unrelated zebra quokka"] * 2)
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": texts,
        "source": ["s"] * len(texts),
        "lang": ["en"] * len(texts)})
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    out = doc_fuzzy_token_match(str(tmp_path), dict_k=5)
    assert len(out) > 0
    pairs = set(zip(out["term"], out["variant"]))
    assert ("database", "databse") in pairs      # deletion typo
    assert ("database", "databaze") in pairs     # substitution typo
    assert ("database", "databases") in pairs    # insertion
    assert ("systems", "sustems") in pairs

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    oracle = con.execute(
        doc_fuzzy_token_match_sql().replace("LIMIT 50", "LIMIT 5")).df()
    pd.testing.assert_frame_equal(_canon(out), _canon(oracle),
                                  check_dtype=False)

    # exact-verify unit pins
    assert _lev_is_1("cat", "cut") and _lev_is_1("cat", "cats")
    assert _lev_is_1("cat", "at") and not _lev_is_1("cat", "cat")
    assert not _lev_is_1("cat", "dog") and not _lev_is_1("ab", "abcd")


def test_rolling_7d_users_interval_split(tmp_path, ray_session):
    """sf events are dense (~30 consecutive days), so the >6-day-gap
    interval SPLIT path never fires there — pin it on a sparse
    corpus: one user active on Jan 1 and Jan 20 (two merged
    intervals), one on Jan 3+5 (one merged interval), then match the
    exact COUNT(DISTINCT) range-join oracle."""
    import pyarrow.parquet as pq

    from kafka_delta_rs_ray.ops.queries import (
        events_rolling_7d_users, events_rolling_7d_users_sql)

    rows = [(1, "2024-01-01"), (1, "2024-01-20"),
            (2, "2024-01-03"), (2, "2024-01-05")]
    tbl = pa.table({
        "ts": pa.array([pd.Timestamp(d) for _, d in rows],
                       type=pa.timestamp("us")),
        "user_id": pa.array([u for u, _ in rows], type=pa.int64()),
        "event_type": ["click"] * len(rows),
        "event_id": pa.array(range(len(rows)), type=pa.int64()),
        "value": pa.array([0.0] * len(rows)),
        "props": ["{}"] * len(rows)})
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    out = events_rolling_7d_users(str(tmp_path))
    assert len(out) == 20  # Jan 1..20 spine
    # user 1 covers windows 1-7 and 20; user 2 covers 3-11
    want = [1, 1, 2, 2, 2, 2, 2, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 1]
    assert out["n_users"].tolist() == want

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    oracle = con.execute(events_rolling_7d_users_sql()).df()
    assert out["n_users"].astype(int).tolist() == \
        oracle["n_users"].astype(int).tolist()
    assert (out["day"].astype(str).tolist()
            == oracle["day"].astype(str).tolist())


def test_hll_overlap_partial_intersection(tmp_path, ray_session):
    """The sf events have total purchase/error overlap (every user
    does both), so pin the inclusion-exclusion path on a PARTIAL
    overlap: 600 purchase-only, 400 error-only, 300 both — the
    composed estimate must land within 10% of 300 and the in-callable
    self-check must hold."""
    import pyarrow.parquet as pq

    from kafka_delta_rs_ray.ops.queries import (
        events_purchase_error_overlap_hll)

    rows = ([(u, "purchase") for u in range(600)]
            + [(u, "error") for u in range(1000, 1400)]
            + [(u, t) for u in range(5000, 5300)
               for t in ("purchase", "error")])
    tbl = pa.table({
        "ts": pa.array([pd.Timestamp("2024-01-01")] * len(rows),
                       type=pa.timestamp("us")),
        "user_id": pa.array([u for u, _ in rows], type=pa.int64()),
        "event_type": [t for _, t in rows],
        "event_id": pa.array(range(len(rows)), type=pa.int64()),
        "value": pa.array([0.0] * len(rows)),
        "props": ["{}"] * len(rows)})
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    out = events_purchase_error_overlap_hll(str(tmp_path))
    est = out["n_both_approx"][0].as_py()
    assert abs(est - 300) <= 30, est
    assert abs(out["n_purchasers_approx"][0].as_py() - 900) <= 45
    assert abs(out["n_errorers_approx"][0].as_py() - 700) <= 35


def test_weighted_median_narrowing_matches_pull(ray_session):
    """The weighted median's two termination regimes must agree: the
    default bounded pull (sf0.001 lineitem sits under pull_max) and
    the 4096-bucket weight-narrowing path forced by pull_max=2 —
    and both must equal the DuckDB integer-crossing window oracle."""
    from kafka_delta_rs_ray.ops.queries import (
        lineitem_qty_weighted_price_median,
        lineitem_qty_weighted_price_median_sql)

    base = lineitem_qty_weighted_price_median(SF_DIR).to_pandas()
    narrowed = lineitem_qty_weighted_price_median(
        SF_DIR, pull_max=2).to_pandas()
    pd.testing.assert_frame_equal(base, narrowed)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/lineitem.parquet')")
    oracle = con.execute(lineitem_qty_weighted_price_median_sql()).df()
    assert base.iloc[0, 0] == oracle.iloc[0, 0]
