"""Training-data ops: dedup family, similarity search, text analysis,
multimodal stages — on synthetic inputs with KNOWN duplicates/neighbors."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _docs_ds():
    """12 docs: 0/1 exact dups; 2/3 near dups (one word changed);
    4..9 distinct; 10/11 another exact dup pair."""
    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep green forest while birds sing loudly")
    near = base.replace("green", "blue")
    texts = [base, base, base + " extra tail words here", near,
             "completely different content about spark and ray data engines",
             "another unrelated document mentioning tables and manifests",
             "short one", "lorem ipsum dolor sit amet consectetur",
             "数据处理引擎测试文档", "el rapido zorro marron que salta",
             "dup pair two identical text", "dup pair two identical text"]
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(12)), pa.int64()),
        "text": pa.array(texts, pa.string())}))


def _emb_ds(n=60, d=16, seed=3):
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(n, d)).astype(np.float32)
    m[1] = m[0] + 0.001 * rng.normal(size=d).astype(np.float32)  # near-dup
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "vec_id": pa.array(list(range(n)), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in m],
                              pa.list_(pa.float32())),
        "label": pa.array([i % 4 for i in range(n)], pa.int32())}))


def test_exact_dedup_first_wins(ray_session):
    from kafka_delta_rs_ray.ops.dedup import exact_dedup

    out = exact_dedup(_docs_ds()).to_pandas()
    ids = sorted(out["doc_id"])
    assert 0 in ids and 1 not in ids      # first-wins: min doc_id kept
    assert 10 in ids and 11 not in ids
    assert len(ids) == 10


def test_exact_dedup_survives_crc32_collision(ray_session):
    """'plumless' and 'buckeroo' share a crc32 — a 32-bit content hash
    (the round-1 implementation) would silently drop one of them. The
    128-bit fingerprint must keep both."""
    import zlib

    import ray.data as rd

    from kafka_delta_rs_ray.ops.dedup import exact_dedup

    assert zlib.crc32(b"plumless") == zlib.crc32(b"buckeroo")
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["plumless", "buckeroo", "plumless"], pa.string())}))
    out = exact_dedup(ds, n_buckets=8).to_pandas()
    assert sorted(out["doc_id"]) == [0, 1]  # both kept; true dup dropped


def test_minhash_lsh_finds_near_dups(ray_session):
    from kafka_delta_rs_ray.ops.dedup import minhash_lsh_pairs

    out = minhash_lsh_pairs(_docs_ds(), threshold=0.5).to_pandas()
    pairs = set(map(tuple, out[["doc_a", "doc_b"]].itertuples(index=False)))
    assert (0, 1) in pairs      # exact dup
    assert (10, 11) in pairs
    assert (0, 3) in pairs or (1, 3) in pairs  # near dup
    assert (4, 5) not in pairs  # unrelated docs


def test_simhash_finds_exact_dups(ray_session):
    from kafka_delta_rs_ray.ops.dedup import simhash_pairs

    out = simhash_pairs(_docs_ds(), max_dist=3).to_pandas()
    pairs = set(map(tuple, out[["doc_a", "doc_b"]].itertuples(index=False)))
    assert (0, 1) in pairs and (10, 11) in pairs
    assert (4, 5) not in pairs


def test_ngram_jaccard_verifies(ray_session):
    from kafka_delta_rs_ray.ops.dedup import ngram_jaccard_pairs

    out = ngram_jaccard_pairs(_docs_ds(), threshold=0.5).to_pandas()
    pairs = {(a, b): j for a, b, j in
             out[["doc_a", "doc_b", "jaccard"]].itertuples(index=False)}
    assert pairs.get((0, 1)) == 1.0  # exact dup → jaccard exactly 1
    assert all(j >= 0.5 for j in pairs.values())


def test_ngram_distributed_matches_broadcast(ray_session, monkeypatch):
    """Force the distributed pair⋈shingle-set verify (threshold 0) and
    pin byte-equality with the broadcast-text path — the same
    equivalence contract as the minhash BROADCAST_VERIFY_MAX switch."""
    from kafka_delta_rs_ray.ops import dedup

    def run():
        out = dedup.ngram_jaccard_pairs(_docs_ds(), threshold=0.5).to_pandas()
        return (out.sort_values(["doc_a", "doc_b"])
                .reset_index(drop=True)[["doc_a", "doc_b", "jaccard"]])

    broadcast = run()
    monkeypatch.setattr(dedup, "NGRAM_BROADCAST_MAX", 0)
    distributed = run()
    pd.testing.assert_frame_equal(broadcast, distributed)
    assert len(broadcast) > 0  # the pin is vacuous on an empty pair set


def test_embedding_near_dup(ray_session):
    from kafka_delta_rs_ray.ops.dedup import embedding_near_dup

    out = embedding_near_dup(_emb_ds(), threshold=0.99).to_pandas()
    pairs = set(map(tuple, out[["vec_a", "vec_b"]].itertuples(index=False)))
    assert (0, 1) in pairs
    assert len(pairs) < 5  # random vectors are not near-dups


def test_knn_bruteforce_matches_numpy(ray_session):
    from kafka_delta_rs_ray.ops.similarity import knn_bruteforce

    ds = _emb_ds()
    out = knn_bruteforce(ds, n_queries=3, k=5).to_pandas()
    # numpy oracle
    m = np.stack([np.asarray(r["embedding"]) for r in ds.take_all()]).astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    for q in range(3):
        sims = np.round(m @ m[q], 6)
        order = sorted((int(i) for i in range(len(m)) if i != q),
                       key=lambda i: (-sims[i], i))[:5]
        got = out[out["query_id"] == q].sort_values("rank")["neighbor_id"].tolist()
        assert got == order, q
    assert out.groupby("query_id").size().tolist() == [5, 5, 5]


def test_knn_ivf_recall(ray_session):
    from kafka_delta_rs_ray.ops.similarity import knn_bruteforce, knn_ivf

    ds = _emb_ds(n=120)
    exact = knn_bruteforce(ds, n_queries=5, k=5).to_pandas()
    approx = knn_ivf(ds, n_queries=5, k=5, n_centroids=8, nprobe=4).to_pandas()
    hits = tot = 0
    for q in exact["query_id"].unique():
        e = set(exact[exact["query_id"] == q]["neighbor_id"])
        a = set(approx[approx["query_id"] == q]["neighbor_id"])
        hits += len(e & a)
        tot += len(e)
    assert hits / tot >= 0.8, f"IVF recall {hits/tot:.2f}"


def test_token_count_and_quality():
    from kafka_delta_rs_ray.ops.textops import QualityScore, TokenCount

    df = pd.DataFrame({"doc_id": [1, 2],
                       "text": ["Hello world, foo bar!", "a b"]})
    tc = TokenCount()(df)
    assert tc["n_tokens"].tolist() == [4, 2]
    assert tc["n_words"].tolist() == [4, 2]
    q = QualityScore()(df)
    assert q["keep"].tolist() == [False, False]  # both < 10 words


def test_lang_id_heuristic():
    from kafka_delta_rs_ray.ops.textops import LangId

    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": ["the cat and the dog is here",
                                "数据处理引擎", "xyzzy plugh"]})
    out = LangId()(df)
    assert out["lang_pred"].tolist() == ["en", "zh", "und"]


def test_fingerprint_order_sensitive():
    from kafka_delta_rs_ray.ops.textops import Fingerprint

    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": ["alpha beta gamma", "gamma beta alpha",
                                "alpha beta gamma"]})
    out = Fingerprint()(df)
    fps = out["fingerprint"].tolist()
    assert fps[0] == fps[2] and fps[0] != fps[1]


def test_decode_stats_stage(ray_session):
    from kafka_delta_rs_ray.pipelines.synth import image_dataset
    from kafka_delta_rs_ray.stages.codec_stage import DecodeStats

    out = (image_dataset(20, batch_size=10)
           .map_batches(DecodeStats, batch_format="pyarrow", batch_size=10,
                        concurrency=2)
           .to_pandas())
    assert len(out) == 20
    assert (out["lum_mean"] >= 0).all() and (out["lum_mean"] <= 255).all()
    # phash recomputed from decoded pixels must be close to stored one
    # (identical for rawz rows)


def test_resize_transcode_stage(ray_session):
    from kafka_delta_rs_ray.codecs import decode
    from kafka_delta_rs_ray.pipelines.synth import image_dataset
    from kafka_delta_rs_ray.stages.codec_stage import ResizeTranscode

    out = (image_dataset(10, batch_size=5)
           .map_batches(ResizeTranscode, batch_format="pyarrow", batch_size=5,
                        concurrency=2)
           .take_all())
    for r in out:
        img = decode(r["bytes"], r["fmt"])
        assert img.shape == (32, 32, 3)
        assert r["w"] == 32 and r["h"] == 32


def test_frame_sample_output_schema_contract():
    # FrameSample is REAL since the vraw codec landed (test_media.py
    # covers demux/sampling); here just pin the output-schema contract
    from kafka_delta_rs_ray.stages.codec_stage import FrameSample

    names = [f.name for f in FrameSample.OUTPUT_SCHEMA]
    assert names == ["media_id", "frame_idx", "bytes", "w", "h", "fmt"]


def test_changeset_source_schema_first(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data as rd

    from kafka_delta_rs_ray.errors import ValidationError
    from kafka_delta_rs_ray.sources import read_changeset
    from kafka_delta_rs_ray.tablefmt.schema import CHANGESET_SCHEMA

    good = pa.Table.from_pylist([{
        "image_id": "a", "bytes": b"x", "w": 1, "h": 1, "fmt": "rawz",
        "caption": "c", "phash": 0, "partition_id": 0, "seq": 1,
        "op": "upsert", "extra_column": "dropme"}])
    p = tmp_path / "ch.parquet"
    pq.write_table(good, p)
    out = read_changeset(str(p)).take_all()
    assert len(out) == 1 and "extra_column" not in out[0]  # projection

    bad = good.drop_columns(["seq"])
    p2 = tmp_path / "bad.parquet"
    pq.write_table(bad, p2)
    with pytest.raises(Exception) as ei:  # Ray wraps ValidationError
        read_changeset(str(p2)).take_all()
    assert "missing required column" in str(ei.value)


def test_image_phash_near_dup(ray_session):
    """Hot synthetic images are byte-identical within a hot bucket →
    hamming-0 pairs; the LSH must find them and verify distances."""
    import numpy as np

    from kafka_delta_rs_ray.ops.queries import image_phash_near_dup

    df = image_phash_near_dup(None).to_pandas()
    assert len(df) > 0
    assert (df["hamming"] <= 3).all()
    assert (df["img_a"] < df["img_b"]).all()  # canonical order, no dups
    assert not df.duplicated(["img_a", "img_b"]).any()

    # brute-force oracle on the same 2000-row table (metadata only),
    # post exact-dedup: the registered query keeps one representative
    # per exact phash BEFORE the near-dup pass (hot buckets are
    # quadratic otherwise), so the oracle dedups the same way
    from kafka_delta_rs_ray.pipelines.synth import image_dataset

    meta = image_dataset(2000, batch_size=500).select_columns(
        ["image_id", "phash"]).to_pandas()
    meta = (meta.sort_values("image_id")
            .drop_duplicates("phash", keep="first"))
    ph = meta["phash"].to_numpy().astype(np.int64).view(np.uint64)
    ids = meta["image_id"].to_numpy()
    order = np.argsort(ids)
    ph, ids = ph[order], ids[order]
    ai, bi = np.triu_indices(len(ids), k=1)
    x = (ph[ai] ^ ph[bi]).astype(np.uint64)
    dist = np.array([bin(int(v)).count("1") for v in x])
    keep = dist <= 3
    expected = set(zip(ids[ai][keep], ids[bi][keep]))
    got = set(zip(df["img_a"], df["img_b"]))
    assert got == expected


def test_image_exact_dedup(ray_session):
    import pandas as pd

    from kafka_delta_rs_ray.ops.queries import image_exact_dedup
    from kafka_delta_rs_ray.pipelines.synth import image_dataset

    got = image_exact_dedup(None).to_pandas().sort_values("image_id")
    meta = image_dataset(2000, batch_size=500).select_columns(
        ["image_id", "phash"]).to_pandas()
    expected = (meta.sort_values("image_id")
                .drop_duplicates("phash", keep="first"))
    assert len(got) == len(expected) < 2000  # hot dups collapsed
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True)[["image_id", "phash"]],
        expected.reset_index(drop=True)[["image_id", "phash"]])


def test_image_embed_knn_deterministic(ray_session):
    """Nested-column ANN composition: embeddings derived from decoded
    pixels feed brute-force kNN; output is deterministic per seed and
    exact-duplicate (hot) images rank each other at similarity ~1."""
    from kafka_delta_rs_ray.ops.queries import image_embed_knn

    a = image_embed_knn(None).to_pandas().sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    b = image_embed_knn(None).to_pandas().sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    assert a.equals(b)
    assert set(a.columns) == {"query_id", "neighbor_id", "rank"}
    assert a.groupby("query_id")["rank"].max().eq(5).all()


def test_doc_dedup_pipeline_first_wins(ray_session):
    """Composed corpus dedup: exact dups (0/1, 10/11) and the near-dup
    cluster around doc 0 collapse to their min doc_id; unrelated docs
    survive."""
    from kafka_delta_rs_ray.ops.queries import doc_dedup_pipeline

    # run the pipeline over the known 12-doc corpus: write it as
    # parquet and point sf_dir at it
    import tempfile, os
    import pyarrow.parquet as pq

    d = tempfile.mkdtemp(prefix="dedup-pipe-")
    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep green forest while birds sing loudly")
    texts = [base, base, base + " extra tail words here",
             base.replace("green", "blue"),
             "completely different content about spark and ray data engines",
             "another unrelated document mentioning tables and manifests",
             "short one", "lorem ipsum dolor sit amet consectetur",
             "数据处理引擎测试文档", "el rapido zorro marron que salta",
             "dup pair two identical text", "dup pair two identical text"]
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(12)), pa.int64()),
        "text": pa.array(texts, pa.string())}),
        os.path.join(d, "documents.parquet"))

    out = sorted(doc_dedup_pipeline(d).to_pandas()["doc_id"])
    assert 0 in out and 1 not in out          # exact dup collapsed
    assert 10 in out and 11 not in out
    assert 4 in out and 5 in out              # unrelated docs survive
    assert len(out) < 12


def test_hll_sketch_accuracy_and_merge_order():
    """HLL estimate within ~3x standard error of truth, and register
    merge is order-independent (the property the distributed reduce
    relies on)."""
    import numpy as np

    from kafka_delta_rs_ray.functions import hll

    rng = np.random.default_rng(7)
    keys = rng.choice(2**40, size=50_000, replace=False).astype(np.int64)
    parts = np.array_split(keys, 7)
    regs = [hll.empty_registers(12) for _ in parts]
    for r, p in zip(regs, parts):
        hll.add_hashed(r, p, 12)
    fwd = regs[0]
    for r in regs[1:]:
        fwd = hll.merge(fwd, r)
    rev = regs[-1]
    for r in regs[-2::-1]:
        rev = hll.merge(rev, r)
    assert np.array_equal(fwd, rev)
    est = hll.estimate(fwd)
    assert abs(est - 50_000) / 50_000 < 0.05  # p=12 → ~1.6% stderr


def test_hll_query_close_to_exact(ray_session):
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from kafka_delta_rs_ray.ops.queries import events_distinct_users_hll

    sf = "/root/testdata/sf0.001"
    approx = events_distinct_users_hll(sf)["n_users_approx"][0].as_py()
    exact = len(pc.unique(
        pq.read_table(f"{sf}/events.parquet", columns=["user_id"])
        ["user_id"].combine_chunks()))
    assert exact > 0
    # linear-counting regime at tiny cardinality is near-exact
    assert abs(approx - exact) <= max(2, 0.05 * exact)


def test_block_lsh_shuffle_groups_bounded():
    """The block-LSH shuffle key must SCALE: groupby('block_id') had 4
    distinct keys (one task sees ~corpus/4 rows). Pin (a) the group
    count grows with the corpus so groups stay ~TARGET_GROUP_ROWS, and
    (b) uniform hashes spread evenly over the buckets."""
    import numpy as np

    from kafka_delta_rs_ray.ops.dedup import (
        MAX_GROUPS, TARGET_GROUP_ROWS, PhashBlocks, _n_block_groups)

    # (a) group sizing: ~TARGET_GROUP_ROWS rows per group at scale
    for n in (10**6, 10**8, 10**9):
        g = _n_block_groups(n)
        assert 64 <= g <= MAX_GROUPS
        rows_per_group = n * 4 / g
        assert rows_per_group <= TARGET_GROUP_ROWS * 1.01
    assert _n_block_groups(100) == 64          # floor
    assert _n_block_groups(10**9) >= 64_000    # grows, not constant 4

    # (b) bucket balance on uniform hashes
    n = 20_000
    rng = np.random.default_rng(7)
    ph = rng.integers(-(2**63), 2**63, n, dtype=np.int64)
    import pyarrow as pa

    batch = pa.table({"image_id": [f"i{i}" for i in range(n)],
                      "phash": pa.array(ph, pa.int64())})
    n_groups = _n_block_groups(n)
    out = PhashBlocks(n_groups)(batch)
    counts = np.bincount(out["bucket"].to_numpy(), minlength=n_groups)
    assert (counts > 0).sum() == n_groups          # all buckets used
    assert counts.max() <= 4 * counts.mean()       # no hot bucket


def test_simhash_bucketed_matches_blockwise(ray_session):
    """The bucketed shuffle must emit the SAME pair set the 4-group
    block shuffle did: every (block_id, block_val) still co-locates."""
    import ray.data as rd

    from kafka_delta_rs_ray.ops.dedup import simhash_pairs

    out = simhash_pairs(_docs_ds(), max_dist=3).to_pandas()
    # a duplicate pair matches in ALL 4 blocks -> must appear ONCE
    assert not out.duplicated(["doc_a", "doc_b"]).any()
    pairs = set(map(tuple, out[["doc_a", "doc_b"]].itertuples(index=False)))
    assert (0, 1) in pairs and (10, 11) in pairs
    assert (4, 5) not in pairs


def test_knn_ivf_skips_non_probed_buckets(ray_session):
    """The IVF point: a bucket no query probes must do ZERO similarity
    work, and a probed bucket must multiply only its own query subset
    (the round-2 version ran the full query matmul in every bucket and
    filtered afterward — brute-force compute in an IVF costume)."""
    import numpy as np
    import ray

    from kafka_delta_rs_ray.ops.similarity import (_BucketTopK,
                                                   _normalize)

    rng = np.random.default_rng(3)
    qids = np.array([100, 101], dtype=np.int64)
    qm = _normalize(rng.normal(size=(2, 8)))
    qref = ray.put((qids, qm))
    # query 0 probes bucket 0 only; query 1 probes buckets 0 and 2
    bq_ref = ray.put({0: np.array([0, 1]), 2: np.array([1])})
    inst = _BucketTopK(qref, bq_ref, k=3)

    def batch(bucket, n=6):
        return pa.table({
            "vec_id": pa.array(np.arange(n, dtype=np.int64) + bucket * 10),
            "embedding": pa.array([rng.normal(size=8).tolist()] * n),
            "bucket": pa.array([bucket] * n, pa.int32())})

    out0 = inst(batch(0))
    assert set(out0["query_id"].to_pylist()) == {100, 101}
    out1 = inst(batch(1))  # nobody probes bucket 1
    assert out1.num_rows == 0
    assert inst.stats["buckets_skipped"] == 1
    out2 = inst(batch(2))  # only query 101 probes bucket 2
    assert set(out2["query_id"].to_pylist()) == {101}
    # matmul rows: 2 (bucket 0) + 1 (bucket 2); bucket 1 contributed 0
    assert inst.stats["matmul_query_rows"] == 3


def test_ivf_centroid_count_scales():
    from kafka_delta_rs_ray.ops.similarity import (TARGET_BUCKET_ROWS,
                                                   n_centroids_for)

    assert n_centroids_for(100) == 16          # floor at test scale
    assert n_centroids_for(10**6) == 20        # 1e6/50k
    big = n_centroids_for(10**9)
    assert big * TARGET_BUCKET_ROWS >= 10**9   # buckets stay bounded
    assert big >= 20_000


def test_embedding_near_dup_scaled_centroids(ray_session):
    """Planted duplicates still found when the centroid count is
    computed from the corpus (default path) rather than fixed."""
    from kafka_delta_rs_ray.ops.dedup import embedding_near_dup

    out = embedding_near_dup(_emb_ds(), threshold=0.99).to_pandas()
    pairs = set(map(tuple, out[["vec_a", "vec_b"]].itertuples(index=False)))
    assert (0, 1) in pairs


def test_heavy_hitters_mg_truncation_exact(ray_session):
    """The Misra-Gries compression path (per-batch cardinality >> k)
    must still yield EXACT heavy-hitter counts: skewed synthetic keys
    with 2 true heavy hitters among 3000 cold keys, phi=0.1 → k=20
    counters, 500-row batches each holding ~hundreds of distinct keys,
    so every batch truncates."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from kafka_delta_rs_ray.ops.queries import heavy_hitters

    rng = np.random.default_rng(7)
    keys = np.concatenate([
        np.full(3000, 1, dtype=np.int64),          # 30%
        np.full(1500, 2, dtype=np.int64),          # 15%
        rng.integers(100, 3100, size=5500),        # cold tail
    ])
    rng.shuffle(keys)
    n = len(keys)
    ds = rd.from_pandas(pd.DataFrame({"user_id": keys})).repartition(20)
    out = heavy_hitters(ds, phi=0.1).to_pandas()
    truth = pd.Series(keys).value_counts()
    expect = truth[truth > 0.1 * n]
    got = dict(zip(out["user_id"], out["n"]))
    assert got == {int(k): int(v) for k, v in expect.items()}
    assert set(got) == {1, 2}


def test_cc_min_labels_components(ray_session):
    """Distributed min-label connected components: a 6-node chain
    (needs multiple propagation rounds), a clique, and an isolated
    pair all resolve to their component minimum; driver state is O(1)
    by construction (only the changed count crosses back)."""
    import ray.data as rd

    from kafka_delta_rs_ray.ops.dedup import cc_min_labels

    chain = [(i, i + 1) for i in range(10, 15)]           # 10..15
    clique = [(a, b) for a in (2, 5, 7) for b in (2, 5, 7) if a < b]
    iso = [(100, 90)]
    pairs = rd.from_items([{"doc_a": a, "doc_b": b}
                           for a, b in chain + clique + iso])
    lab = {r["node"]: r["label"]
           for r in cc_min_labels(pairs).take_all()}
    assert {n: lab[n] for n in range(10, 16)} == {n: 10
                                                  for n in range(10, 16)}
    assert lab[2] == lab[5] == lab[7] == 2
    assert lab[90] == lab[100] == 90

    # empty pair set → empty labels, no hang
    empty = rd.from_arrow(pa.table({"doc_a": pa.array([], pa.int64()),
                                    "doc_b": pa.array([], pa.int64())}))
    assert cc_min_labels(empty).count() == 0


def test_doc_dedup_pipeline_distributed_cc_matches_driver(
        ray_session, monkeypatch):
    """Forcing the pair-count threshold to 0 routes doc_dedup_pipeline
    through distributed components + bucketed anti-join; survivors are
    identical to the driver union-find path."""
    import kafka_delta_rs_ray.ops.queries as q

    sf = "/root/testdata/sf0.001"
    driver = sorted(r["doc_id"]
                    for r in q.doc_dedup_pipeline(sf).take_all())
    monkeypatch.setattr(q, "CC_PAIRS_DRIVER_MAX", -1)
    dist = sorted(r["doc_id"]
                  for r in q.doc_dedup_pipeline(sf).take_all())
    assert dist == driver and len(driver) > 0


def test_image_dedup_distributed_cc_matches_driver(
        ray_session, monkeypatch):
    """The image twin of the doc pipeline's regime pin: threshold-0
    routes image_dedup_pipeline through numeric-id min-label
    components + bucketed anti-join; survivors identical to the
    driver union-find path."""
    import kafka_delta_rs_ray.ops.queries as q

    driver = sorted(r["image_id"]
                    for r in q.image_dedup_pipeline("unused").take_all())
    monkeypatch.setattr(q, "CC_PAIRS_DRIVER_MAX", -1)
    dist = sorted(r["image_id"]
                  for r in q.image_dedup_pipeline("unused").take_all())
    assert dist == driver and len(driver) > 0


def test_train_centroids_delegates_to_distributed_kmeans(
        ray_session, monkeypatch):
    """Past DISTRIBUTED_TRAIN_C centroids, train_centroids must swap to
    the full-data distributed k-means automatically (the docstring's
    promise is now code) — and knn_ivf through that path keeps its
    recall bound vs brute force."""
    import kafka_delta_rs_ray.ops.clustering as cl
    import kafka_delta_rs_ray.ops.similarity as sim

    monkeypatch.setattr(sim, "DISTRIBUTED_TRAIN_C", 8)
    calls = {"n": 0}
    real = cl.kmeans

    def spy(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(cl, "kmeans", spy)

    ds = _emb_ds(n=120)
    exact = sim.knn_bruteforce(ds, n_queries=5, k=5).to_pandas()
    approx = sim.knn_ivf(ds, n_queries=5, k=5, n_centroids=12,
                         nprobe=6).to_pandas()
    assert calls["n"] == 1  # large-C path actually taken
    hits = tot = 0
    for q in exact["query_id"].unique():
        e = set(exact[exact["query_id"] == q]["neighbor_id"])
        a = set(approx[approx["query_id"] == q]["neighbor_id"])
        hits += len(e & a)
        tot += len(e)
    assert hits / tot >= 0.8, f"distributed-train IVF recall {hits/tot:.2f}"


def test_knn_graph_exact_and_ivf_recall(ray_session):
    """knn_graph returns each vector's exact top-k (spot-checked
    against a local all-pairs matmul); knn_graph_ivf covers EVERY
    vector with >= 0.8 mean recall vs the exact graph and never emits
    more than k neighbors per vector."""
    from kafka_delta_rs_ray.ops.similarity import knn_graph, knn_graph_ivf

    ds = _emb_ds(n=120)
    exact = knn_graph(ds, k=5).to_pandas()
    assert set(exact["query_id"]) == set(range(120))
    assert exact.groupby("query_id").size().max() == 5

    m = np.stack([np.asarray(r["embedding"]) for r in ds.take_all()]
                 ).astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    for q in (0, 57, 119):
        sims = np.round(m @ m[q], 6)
        order = sorted((int(i) for i in range(len(m)) if i != q),
                       key=lambda i: (-sims[i], i))[:5]
        got = exact[exact["query_id"] == q].sort_values("rank")[
            "neighbor_id"].tolist()
        assert got == order, q

    approx = knn_graph_ivf(ds, k=5, n_centroids=8, nprobe=3).to_pandas()
    assert set(approx["query_id"]) == set(range(120))
    assert approx.groupby("query_id").size().max() <= 5
    hits = tot = 0
    for q in range(120):
        e = set(exact[exact["query_id"] == q]["neighbor_id"])
        a = set(approx[approx["query_id"] == q]["neighbor_id"])
        hits += len(e & a)
        tot += len(e)
    assert hits / tot >= 0.8, f"graph IVF recall {hits/tot:.2f}"


def test_distributed_kmeans_matches_local(ray_session):
    """The distributed Lloyd loop (per-batch partial sums + C-row
    reduce per iteration) computes the SAME centroids as a local numpy
    k-means run from the same seeded init — distribution must not
    change the math. Assignment is a streaming stage."""
    from kafka_delta_rs_ray.ops.clustering import kmeans
    from kafka_delta_rs_ray.ops.similarity import _normalize

    ds = _emb_ds(n=160)
    cent, assign = kmeans(ds, n_centroids=6, iters=8, tol=0.0)

    # local reference with identical init
    rows = ds.limit(max(8 * 6, 1024)).take_all()
    m0 = _normalize(np.stack([np.asarray(r["embedding"]) for r in rows])
                    .astype(np.float64))
    rng = np.random.default_rng(7)
    ref = m0[rng.choice(len(m0), size=6, replace=False)]
    allrows = ds.take_all()
    m = _normalize(np.stack([np.asarray(r["embedding"]) for r in allrows])
                   .astype(np.float64))
    for _ in range(8):
        a = np.argmax(m @ ref.T, axis=1)
        new = ref.copy()
        for c in range(6):
            if (a == c).any():
                new[c] = m[a == c].mean(axis=0)
        ref = _normalize(new)
    assert np.allclose(cent, ref, atol=1e-9)

    out = ds.map_batches(assign, batch_format="pyarrow",
                         batch_size=64).to_pandas()
    assert set(out["cluster"]) <= set(range(6))
    assert len(out) == 160
    # assignment agrees with the local argmax
    local = np.argmax(m @ ref.T, axis=1)
    got = out.sort_values("vec_id")["cluster"].to_numpy()
    assert (got == local).all()


def test_parse_json_lines_schema_first():
    """Reference P1/P2 parity: schema drives extraction (missing field
    dead-letters), extras project away, {} silently drops, bad JSON /
    bad base64 dead-letter with the reason — and the two reference
    bugs are NOT replicated: timestamps convert to micros exactly once
    and date32 round-trips."""
    import base64
    import datetime as dt

    import pyarrow as pa

    from kafka_delta_rs_ray.sources.readers import parse_json_lines

    schema = pa.schema([("image_id", pa.string()),
                        ("bytes", pa.large_binary()),
                        ("seq", pa.int64())])
    payload = base64.b64encode(b"\x01\x02").decode()
    lines = "\n".join([
        f'{{"image_id": "a", "bytes": "{payload}", "seq": 1, "extra": 9}}',
        "{}",
        '{"image_id": "b", "seq": 2}',                      # missing bytes
        "not json at all",
        f'{{"image_id": "c", "bytes": "@@@", "seq": 3}}',   # bad base64
        f'{{"image_id": "d", "bytes": "{payload}", "seq": "x"}}',  # bad type
    ])
    rows, errs = parse_json_lines(lines, schema)
    assert rows.num_rows == 1
    assert rows["image_id"][0].as_py() == "a"
    assert rows["bytes"][0].as_py() == b"\x01\x02"
    assert "extra" not in rows.column_names                  # projection
    assert errs.num_rows == 4
    msgs = errs["error"].to_pylist()
    assert any("missing field 'bytes'" in m for m in msgs)
    assert any("base64" in m for m in msgs)
    assert any("expected integer" in m for m in msgs)

    # timestamp converts to micros ONCE (reference divides twice:
    # src/utils/mod.rs:58-63 + 246-255); date32 round-trips (the
    # reference's builder factory panics on date schemas)
    ts_schema = pa.schema([("ts", pa.timestamp("us")),
                           ("d", pa.date32())])
    r2, e2 = parse_json_lines(
        '{"ts": "2026-01-02T03:04:05.000006+00:00", "d": "2026-01-02"}',
        ts_schema)
    assert e2.num_rows == 0
    expect = dt.datetime(2026, 1, 2, 3, 4, 5, 6, tzinfo=dt.timezone.utc)
    assert r2["ts"][0].as_py().replace(tzinfo=dt.timezone.utc) == expect
    assert r2["d"][0].as_py() == dt.date(2026, 1, 2)


def test_parse_arrow_ipc_schema_first():
    """The second wire format (reference's parse_grpc_object seam,
    src/utils/mod.rs:158-164, a todo!()): an Arrow IPC stream of
    micro-batches through the SAME schema-first projection — extras
    dropped, castable cast, missing column dead-letters the batch,
    empty batch drops, corrupt bytes dead-letter with the reason."""
    import io

    import pyarrow as pa

    from kafka_delta_rs_ray.sources.readers import parse_arrow_ipc

    schema = pa.schema([("image_id", pa.string()),
                        ("bytes", pa.large_binary()),
                        ("seq", pa.int64())])

    def ipc(*tables):
        buf = io.BytesIO()
        with pa.ipc.new_stream(buf, tables[0].schema) as w:
            for t in tables:
                w.write_table(t)
        return buf.getvalue()

    good = pa.table({"image_id": ["a", "b"],
                     "bytes": pa.array([b"\x01", b"\x02"], pa.binary()),
                     "seq": pa.array([1, 2], pa.int32()),   # castable
                     "extra": [9, 9]})                      # projected away
    empty = good.slice(0, 0)
    rows, errs = parse_arrow_ipc(ipc(good, empty), schema)
    assert rows.num_rows == 2 and errs.num_rows == 0
    assert rows.schema == schema                  # cast + projection
    assert rows["bytes"][0].as_py() == b"\x01"
    assert rows["seq"].to_pylist() == [1, 2]

    # missing required column → the batch dead-letters, others survive
    missing = pa.table({"image_id": ["c"], "seq": [3]})
    r2, e2 = parse_arrow_ipc(ipc(missing), schema)
    assert r2.num_rows == 0 and e2.num_rows == 1
    assert "missing required column 'bytes'" in e2["error"][0].as_py()

    # corrupt bytes → one dead-letter row, no raise
    r3, e3 = parse_arrow_ipc(b"\x00\x01not an ipc stream", schema)
    assert r3.num_rows == 0 and e3.num_rows == 1
    assert "bad IPC stream" in e3["error"][0].as_py()

    # torn stream (valid prefix, truncated tail) → good prefix kept
    whole = ipc(good)
    r4, e4 = parse_arrow_ipc(whole[:len(whole) - 7], schema)
    assert e4.num_rows == 1
    assert "IPC" in e4["error"][0].as_py()


def test_stream_cli_arrow_ipc_format(tmp_path, ray_session):
    """End-to-end: the stream CLI consumes Arrow IPC micro-batch files
    under message_format: arrow-ipc, corrupt files dead-letter to
    quarantine, good rows commit."""
    import io

    import pyarrow as pa

    from kafka_delta_rs_ray.config import MaintenanceConfig
    from kafka_delta_rs_ray.run import run
    from kafka_delta_rs_ray.tablefmt import IMAGE_SCHEMA, Table
    from kafka_delta_rs_ray.tablefmt.schema import CHANGESET_SCHEMA

    from test_parity import _chrow

    t = Table.create(str(tmp_path / "t"), IMAGE_SCHEMA)
    feed = tmp_path / "feed"
    feed.mkdir()

    def write_ipc(path, rows):
        tb = pa.Table.from_pylist(rows, schema=CHANGESET_SCHEMA)
        buf = io.BytesIO()
        with pa.ipc.new_stream(buf, tb.schema) as w:
            w.write_table(tb)
        path.write_bytes(buf.getvalue())

    write_ipc(feed / "000.arrows", [_chrow("a1", 1, "x"),
                                    _chrow("a2", 2, "y")])
    write_ipc(feed / "001.arrows", [_chrow("a3", 3, "z")])
    (feed / "002.arrows").write_bytes(b"corrupt!")

    cfgp = tmp_path / "job.yaml"
    cfgp.write_text(
        f"table_root: {t.root}\njob: stream\napp_id: ipcstream\n"
        f"changeset_path: '{feed}/*.arrows'\nmessage_format: arrow-ipc\n"
        "max_buffer_rows: 2\nrun_id: ipcrun\n")
    out = run(MaintenanceConfig.load(str(cfgp)))
    assert out["files"] == 3 and out["parse_errors"] == 1
    ds = t.snapshot().dataset(columns=["image_id"])
    got = sorted(r["image_id"] for r in ds.take_all())
    assert got == ["a1", "a2", "a3"]
    from kafka_delta_rs_ray.stages.validate import quarantine_report

    rep = quarantine_report(t.root)
    assert any("IPC" in e for e in rep["errors"])


def test_word_gram_hashes_respect_doc_boundaries():
    """No gram may span two documents, per-doc gram counts follow
    max(len - n + 1, 0), and identical word windows hash identically
    across different docs/batches (the decontamination invariant)."""
    from kafka_delta_rs_ray.ops.queries import _word_gram_hashes

    texts = pd.Series(["a b c d", "x y", "c d a b c"])
    g, didx = _word_gram_hashes(texts, 3)
    # doc0: 2 grams, doc1 (2 words < n): 0, doc2: 3 grams
    assert np.bincount(didx, minlength=3).tolist() == [2, 0, 3]
    # "b c d" (doc0 pos1) != "c d a" (doc2 pos0); "a b c" appears in
    # doc0 pos0 AND doc2 pos2 -> same hash
    assert g[0] == g[4] and g[1] != g[2]
    g2, _ = _word_gram_hashes(pd.Series(["a b c"]), 3)
    assert g2[0] == g[0]  # cross-batch determinism


def test_decontaminate_eval_guard():
    """A corpus-sized eval side must raise, not silently broadcast."""
    import kafka_delta_rs_ray.ops.queries as q

    old = q.DECON_MAX_EVAL_GRAMS
    q.DECON_MAX_EVAL_GRAMS = 2
    try:
        with pytest.raises(ValueError, match="benchmark-sized"):
            q.doc_decontaminate("/root/testdata/sf0.001")
    finally:
        q.DECON_MAX_EVAL_GRAMS = old


def test_repetition_kernel_planted_runs(ray_session):
    """max_run/top_count distinguish a spam run from scattered
    repeats; single-word docs count as one word (split semantics)."""
    import ray.data as rd

    from kafka_delta_rs_ray.ops.queries import doc_repetition

    df = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["spam spam spam ok spam", "a b a b a", ""]})
    import kafka_delta_rs_ray.ops.queries as q
    orig = q._read
    q._read = lambda sf, name, cols=None, split=None: rd.from_pandas(df)
    try:
        out = (doc_repetition("unused").to_pandas()
               .set_index("doc_id").sort_index())
    finally:
        q._read = orig
    assert out.loc[0].tolist() == [5, 2, 4, 3]   # words,distinct,top,run
    assert out.loc[1].tolist() == [5, 2, 3, 1]
    assert out.loc[2].tolist() == [1, 1, 1, 1]   # "" splits to [""]


def test_source_cap_k_bounded(ray_session):
    """Every source keeps exactly its first K docs by doc_id."""
    from kafka_delta_rs_ray.ops.queries import SOURCE_CAP_K, doc_source_cap

    out = doc_source_cap("/root/testdata/sf0.001").to_pandas()
    assert (out.groupby("source").size() <= SOURCE_CAP_K).all()
    import pyarrow.parquet as pq
    full = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "source"]).to_pandas()
    exp = (full.sort_values("doc_id").groupby("source")
           .head(SOURCE_CAP_K))
    assert set(out["doc_id"]) == set(exp["doc_id"])


def test_pack_sequences_matches_reference_greedy(ray_session):
    """Distributed token-budget packing must equal a local greedy
    reference run per bucket span: same sequence count, same per-seq
    doc/token totals, oversized docs isolated, determinism across
    runs."""
    import ray.data as rd

    from kafka_delta_rs_ray.ops.packing import (SEQ_NAMESPACE, pack_greedy,
                                                pack_sequences)

    rng = np.random.default_rng(5)
    n = 3000
    toks = rng.integers(10, 400, n).astype(np.int64)
    toks[7] = 5000          # oversized doc → its own overflow sequence
    ids = np.arange(n, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"doc_id": ids, "n_tokens": toks}))
    span = 1000
    out = pack_sequences(ds, budget=2048,
                         docs_per_bucket=span).to_pandas()

    # local reference: greedy per contiguous bucket, same namespacing
    ref = {}
    for b in np.unique(ids // span):
        m = (ids // span) == b
        seq = pack_greedy(toks[m], 2048)
        for s in np.unique(seq):
            key = int(b) * SEQ_NAMESPACE + int(s)
            sel = toks[m][seq == s]
            ref[key] = (len(sel), int(sel.sum()))
    got = {int(r.seq_id): (int(r.n_docs), int(r.n_tokens))
           for r in out.itertuples()}
    assert got == ref
    # invariants: no sequence over budget except single oversized docs
    over = out[out["n_tokens"] > 2048]
    assert (over["n_docs"] == 1).all()
    assert (out.loc[out["n_docs"] > 1, "n_tokens"] <= 2048).all()
    out2 = pack_sequences(ds, budget=2048,
                          docs_per_bucket=span).to_pandas()
    assert got == {int(r.seq_id): (int(r.n_docs), int(r.n_tokens))
                   for r in out2.itertuples()}


def test_topk_kernel_deterministic_tie_break():
    """Exact sim ties at the selection boundary resolve by lowest
    neighbor_id (the oracle's ORDER BY sim DESC, neighbor_id ASC) —
    the vectorized kernel's rare slow path."""
    from kafka_delta_rs_ray.ops.similarity import _normalize, _topk_rows

    rng = np.random.default_rng(0)
    base = _normalize(rng.normal(size=(4, 8)))
    m = np.repeat(base, 6, axis=0)  # 24 vectors, heavy exact ties
    ids = np.arange(24)
    t = _topk_rows(np.array([100]), base[0:1], ids, m, 5)
    assert t["neighbor_id"].to_pylist() == [0, 1, 2, 3, 4]
    t2 = _topk_rows(np.array([2]), m[2:3], ids, m, 5)  # self excluded
    assert t2["neighbor_id"].to_pylist() == [0, 1, 3, 4, 5]


def test_topk_boundary_tie_within_rounding():
    """Raw sims that differ by <1e-6 but round equal at the selection
    boundary must resolve like the oracle (rounded sim DESC, id ASC):
    the re-selection triggers on rounding distance, not exact raw
    equality, and selects on rounded sims."""
    from kafka_delta_rs_ray.ops.similarity import _topk_rows

    def vec(s):
        return [s, float(np.sqrt(1.0 - s * s))]

    # ids 7 and 2 both round to sim 0.8; raw id-7 sim is 4e-7 higher.
    # Oracle top-2 for the unit-x query: id 1 (0.9), then id 2 (0.8,
    # lower id among the round-equal pair).
    m = np.array([vec(0.9), vec(0.8 + 4e-7), vec(0.8)])
    ids = np.array([1, 7, 2])
    t = _topk_rows(np.array([100]), np.array([[1.0, 0.0]]), ids, m, 2)
    assert t["neighbor_id"].to_pylist() == [1, 2]
    assert t["sim"].to_pylist() == [0.9, 0.8]


def test_heavy_hitters_string_key_and_n_total_hint(ray_session):
    """Non-integer keys keep their native dtype end-to-end, and a
    transformed input with an n_total hint doesn't re-execute the
    upstream pipeline for the count."""
    import pandas as pd
    import ray.data as rd

    from kafka_delta_rs_ray.ops.queries import heavy_hitters

    rng = np.random.default_rng(11)
    keys = (["hot-a"] * 400 + ["hot-b"] * 300
            + [f"cold-{i}" for i in rng.integers(0, 500, size=300)])
    rng.shuffle(keys)
    base = rd.from_pandas(pd.DataFrame({"k": keys})).repartition(8)
    # a transformed dataset: count() here would re-run the map
    ds = base.map_batches(lambda b: b, batch_format="pyarrow")
    out = heavy_hitters(ds, phi=0.2, key="k", n_total=len(keys)).to_pandas()
    got = dict(zip(out["k"], out["n"]))
    assert got == {"hot-a": 400, "hot-b": 300}


def test_semdedup_prunes_planted_duplicates(ray_session):
    """SemDeDup drops planted near-duplicates (keeping the lowest
    vec_id of each near-set) and keeps everything at threshold > 1;
    output is deterministic and covers every vector exactly once."""
    import ray.data as rd

    from kafka_delta_rs_ray.ops.clustering import semdedup

    rng = np.random.default_rng(5)
    base = rng.normal(size=(40, 16))
    rows = []
    for i, v in enumerate(base):
        rows.append({"vec_id": i, "embedding": v.tolist()})
    # plant near-dups of vectors 0..9 at ids 100..109 (tiny noise)
    for i in range(10):
        rows.append({"vec_id": 100 + i,
                     "embedding": (base[i]
                                   + rng.normal(scale=1e-4, size=16))
                     .tolist()})
    ds = rd.from_items(rows)

    out = semdedup(ds, threshold=0.95, n_centroids=4).to_pandas()
    assert len(out) == 50
    assert out["vec_id"].is_unique
    dup_rows = out[out["vec_id"] >= 100]
    assert not dup_rows["kept"].any()       # every planted dup dropped
    orig = out[out["vec_id"] < 100]
    assert orig["kept"].sum() >= 35         # originals mostly kept

    out2 = semdedup(ds, threshold=1.01, n_centroids=4).to_pandas()
    assert out2["kept"].all()               # nothing exceeds sim > 1


def test_perplexity_matches_local_reference(ray_session):
    """Distributed bigram-LM training + reduceat scoring must equal a
    plain per-document Python reference (same smoothing, same byte
    bigrams) — pins both passes of the CCNet-style filter."""
    import math

    import ray.data as rd

    from kafka_delta_rs_ray.ops.textops import (PerplexityScore,
                                                train_bigram_lm)

    texts = ["the quick brown fox jumps over the lazy dog",
             "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
             "\x7f\x01\x02\x03 binary-ish junk \x05\x06",
             "une phrase en francais avec des mots",
             "", "x"]
    docs = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ds = rd.from_pandas(docs).repartition(3)

    bits = train_bigram_lm(ds)
    out = (ds.map_batches(PerplexityScore(bits), batch_format="pandas")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    # local reference: count bigrams, add-one smoothed conditional
    counts = {}
    for t in texts:
        b = t.encode("utf-8")
        for i in range(len(b) - 1):
            counts[(b[i], b[i + 1])] = counts.get((b[i], b[i + 1]), 0) + 1
    row_tot = {}
    for (b0, _), n in counts.items():
        row_tot[b0] = row_tot.get(b0, 0) + n
    for i, t in enumerate(texts):
        b = t.encode("utf-8")
        n_big = max(len(b) - 1, 0)
        assert int(out.loc[i, "n_bigrams"]) == n_big
        if n_big == 0:
            assert out.loc[i, "bits_per_bigram"] == 0.0
            continue
        tot = 0.0
        for j in range(n_big):
            p = (counts.get((b[j], b[j + 1]), 0) + 1.0) / \
                (row_tot.get(b[j], 0) + 256.0)
            tot += -math.log2(p)
        assert abs(out.loc[i, "bits_per_bigram"] - tot / n_big) < 1e-6, i
    # the repetitive and binary docs should score differently from prose
    assert out.loc[1, "bits_per_bigram"] < out.loc[0, "bits_per_bigram"]


def test_pagerank_matches_local_reference(ray_session):
    """Distributed PageRank (two bucketed exchanges per round, sorted
    deterministic summation) equals the plain numpy power iteration on
    the same edge set, including nodes with no in-edges; ranks sum to
    ~1 and reruns are bit-identical."""
    import random

    import ray.data as rd

    from kafka_delta_rs_ray.ops.graph import pagerank, pagerank_local

    rng = random.Random(11)
    edges = {(rng.randrange(60), rng.randrange(60)) for _ in range(400)}
    # a dangling sink (9999 has no out-edges) and a negative node id:
    # dangling mass must redistribute, ids must stay unrestricted
    edges |= {(3, 9999), (7, 9999), (-5, 3), (4, -5)}
    edges = sorted(e for e in edges if e[0] != e[1])
    ds = rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges], pa.int64()),
        "dst": pa.array([e[1] for e in edges], pa.int64())}))

    out = pagerank(ds, iters=6).to_pandas().set_index("node")["rank"]
    ref = pagerank_local(edges, iters=6)
    assert set(out.index) == set(ref)
    for n, r in ref.items():
        assert abs(out[n] - r) < 1e-9, (n, out[n], r)
    assert abs(out.sum() - 1.0) < 1e-6

    out2 = pagerank(ds, iters=6).to_pandas().set_index("node")["rank"]
    assert (out.sort_index() == out2.sort_index()).all()


def test_triangle_count_matches_local_reference(ray_session):
    """Distributed node-iterator++ triangle count (degree-oriented
    wedges, pair-key semi-join) equals the brute-force adjacency-set
    reference on a graph with a HUB (high in-degree node — the shape
    id-orientation would blow up on), duplicate directed edges in
    both directions, self-loops, and negative ids."""
    import random

    import ray.data as rd

    from kafka_delta_rs_ray.ops.graph import (triangle_count,
                                              triangle_count_local)

    rng = random.Random(23)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(300)]
    edges += [(h, 999) for h in range(30)]        # hub: in-degree 30
    edges += [(999, 0), (999, 1), (0, 1)]         # triangles via hub
    edges += [(5, 5), (7, 7)]                     # self-loops dropped
    edges += [(-3, 2), (2, -4), (-4, -3)]         # negative-id triangle
    edges += [(d, s) for s, d in edges[:50]]      # reversed duplicates
    ds = rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges], pa.int64()),
        "dst": pa.array([e[1] for e in edges], pa.int64())}))

    out = triangle_count(ds).to_pandas()
    n_edges, n_tri = triangle_count_local(edges)
    assert int(out["n_edges"][0]) == n_edges
    assert int(out["n_triangles"][0]) == n_tri
    assert n_tri > 0  # the fixture actually contains triangles
