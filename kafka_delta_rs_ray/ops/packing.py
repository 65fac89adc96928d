"""Training-sequence packing: assign documents to fixed token-budget
sequences (the pre-tokenization packing step of LLM training-data
pipelines — fill each context window as full as possible without
splitting documents).

Semantics (deterministic): documents are taken in ``doc_id`` order;
greedy sequential packing — a new sequence starts when adding the next
doc would exceed ``budget``; a doc alone larger than ``budget`` gets its
own (overflowing) sequence, mirroring how oversized docs are either
truncated or isolated downstream.

Scale shape: a truly GLOBAL greedy pack is inherently serial, so packing
runs independently inside contiguous ``doc_id``-range buckets (each
bucket holds ~TARGET_GROUP_ROWS docs; sequence ids are namespaced by
bucket, and only the slim (doc_id, n_tokens) projection is exchanged).
The partitioning assumption: fill quality is unaffected except at the
one seam per bucket (≤ one under-filled sequence per ~50k docs), and
determinism is preserved for any fixed bucket span — the documented
trade for parallel packing.

The per-bucket kernel loops over SEQUENCES, not rows: one prefix sum,
then each iteration closes a whole sequence with a searchsorted jump —
O(n_sequences · log n) per bucket, no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

SEQ_NAMESPACE = 1 << 32  # bucket-local seq ids stay below this


def pack_greedy(tokens: np.ndarray, budget: int) -> np.ndarray:
    """Greedy sequential pack of per-doc token counts (already in doc
    order) → 0-based local sequence index per doc."""
    n = len(tokens)
    seq = np.empty(n, dtype=np.int64)
    prefix = np.cumsum(tokens, dtype=np.int64)
    p = 0
    s = 0
    while p < n:
        base = prefix[p - 1] if p else 0
        q = int(np.searchsorted(prefix, base + budget, side="right"))
        if q == p:  # single doc exceeds the budget → its own sequence
            q = p + 1
        seq[p:q] = s
        s += 1
        p = q
    return seq


def pack_sequences(docs_ds, budget: int = 2048,
                   id_col: str = "doc_id", token_col: str = "n_tokens",
                   docs_per_bucket: int = 50_000):
    """Dataset of (id_col, token_col) → per-sequence summary Dataset
    (seq_id, n_docs, n_tokens, fill): greedy token-budget packing in
    contiguous id-range buckets. ``fill`` = n_tokens / budget (may
    exceed 1.0 only for single oversized docs)."""
    def bucketize(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: b[id_col], token_col: b[token_col],
            "bucket": pa.array((ids // docs_per_bucket).astype(np.int64))})

    def pack_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        toks = g[token_col].to_numpy(dtype=np.int64)
        local = pack_greedy(toks, budget)
        seq_id = int(g["bucket"].iloc[0]) * SEQ_NAMESPACE + local
        out = pd.DataFrame({"seq_id": seq_id, "n_tokens": toks})
        agg = (out.groupby("seq_id", as_index=False)
               .agg(n_docs=("n_tokens", "size"),
                    n_tokens=("n_tokens", "sum")))
        agg["fill"] = (agg["n_tokens"] / budget).round(6)
        return agg[["seq_id", "n_docs", "n_tokens", "fill"]]

    return (docs_ds.map_batches(bucketize, batch_format="pyarrow",
                                batch_size=None)
            .groupby("bucket").map_groups(pack_bucket,
                                          batch_format="pandas"))
