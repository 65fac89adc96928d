"""Text-analysis stages for a training-data pipeline over the
``documents`` table: token counting, quality scoring, language ID,
document fingerprinting. All are vectorized map_batches stages; regexes
and language models are compiled once per actor in ``__init__``.

Where the semantics are SQL-expressible the matching DuckDB oracle
lives in ``kafka_delta_rs_ray.ops.queries`` (driver correctness gate);
language-ID and fingerprinting get rows-only checks.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

TOKEN_RE = r"[A-Za-z0-9]+"
WORD_RE = r"\S+"


class TokenCount:
    """doc_id, n_tokens (alnum runs), n_words (whitespace runs),
    n_chars. Oracle: len(regexp_extract_all(...)). Vectorized pandas
    .str ops; regex compiled once per actor."""

    def __init__(self):
        self.token_re = re.compile(TOKEN_RE)
        self.word_re = re.compile(WORD_RE)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "n_tokens": batch["text"].str.count(self.token_re).astype("int64"),
            "n_words": batch["text"].str.count(self.word_re).astype("int64"),
            "n_chars": batch["text"].str.len().astype("int64"),
        })


class VocabPartial:
    """Per-batch token-frequency partials — the map-side combiner for
    the corpus vocabulary groupby: tokenize (lowercased alnum runs,
    same lexer as TokenCount/the DuckDB oracle), explode and count
    WITHIN the batch, so the exchange carries (token, n) rows bounded
    by the batch's distinct tokens, never its token instances. At
    corpus scale the shuffle is vocabulary-sized (Zipf: distinct
    tokens grow ~sublinearly) while the text never leaves the map
    stage."""

    def __init__(self):
        self.token_re = re.compile(TOKEN_RE)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.lower().str.findall(self.token_re)
        vc = toks.explode().dropna().value_counts()
        return pd.DataFrame({"token": vc.index.astype(str),
                             "n": vc.to_numpy(dtype="int64")})


class QualityScore:
    """Length / punctuation / stopword-ratio quality features
    (the standard web-corpus filters, e.g. C4/Gopher rules)."""

    STOP = ("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")

    def __init__(self):
        self.word_re = re.compile(WORD_RE)
        self.punct_re = re.compile(r"[^\w\s]")
        self.stop_re = re.compile(
            r"\b(?:" + "|".join(self.STOP) + r")\b", re.IGNORECASE)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"]
        n_words = text.str.count(self.word_re).astype("int64")
        n_chars = text.str.len().astype("int64")
        n_stop = text.str.count(self.stop_re).astype("int64")
        n_punct = text.str.count(self.punct_re).astype("int64")
        safe_words = n_words.clip(lower=1)
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "n_words": n_words,
            "mean_word_len": ((n_chars - n_words + 1).clip(lower=0)
                              / safe_words).round(6),
            "stop_ratio": (n_stop / safe_words).round(6),
            "punct_ratio": (n_punct / n_chars.clip(lower=1)).round(6),
            "keep": ((n_words >= 10) & (n_stop > 0)).astype("bool"),
        })


# character-trigram profiles per language, built from tiny public
# stopword lists — a deterministic heuristic, not a trained model
_LANG_MARKERS = {
    "en": ["the", "and", "ing", "ion", "is", "of", "to"],
    "es": ["el", "la", "que", "de", "los", "cion", "es"],
    "de": ["der", "die", "und", "sch", "ein", "ich", "en"],
    "fr": ["le", "les", "des", "que", "est", "tion", "et"],
    "zh": [],  # CJK detected by codepoint range, not markers
}


class LangId:
    """Heuristic language ID: CJK by unicode block, otherwise the
    language whose marker-word hits are most frequent; 'und' when no
    evidence. Deterministic; rows-only driver check."""

    def __init__(self):
        self.markers = {
            lang: re.compile(r"\b(?:" + "|".join(ms) + r")\b", re.IGNORECASE)
            for lang, ms in _LANG_MARKERS.items() if ms}
        self.cjk = re.compile(r"[一-鿿]")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"]
        scores = {lang: text.str.count(rx) for lang, rx in self.markers.items()}
        df = pd.DataFrame(scores)
        best = df.idxmax(axis=1).where(df.max(axis=1) > 0, "und")
        cjk = text.str.count(self.cjk) > 0
        return pd.DataFrame({"doc_id": batch["doc_id"],
                             "lang_pred": best.mask(cjk, "zh").values})


class Fingerprint:
    """64-bit rolling-hash document fingerprint: polynomial Rabin-Karp
    over word token hashes (order-sensitive — distinguishes permuted
    documents, unlike a bag-of-words hash).

    Two-level pure-polynomial scheme (every piece SQL-expressible, so
    the driver gets a full DuckDB oracle — ``doc_fingerprint_sql``):
      token_hash(t) = fold(h*31 + codepoint) mod 2^32, h0 = 5381
      doc_fp        = fold(h*FNV_PRIME + token_hash) mod 2^64,
                      h0 = FNV_OFFSET
    Equivalently  h0*B^n + sum(x_i * B^(n-1-i)), which is what the
    vectorized path computes: one utf-32 decode of the batch's
    concatenated tokens, weight tables of B^k (wrapping uint32/uint64
    multiplies ARE the modulus), and np.add.reduceat over token and
    document segment boundaries — no per-character or per-token Python
    loop. Deterministic across processes (no PYTHONHASHSEED)."""

    B64 = np.uint64(1099511628211)        # FNV prime as the rolling base
    SEED64 = np.uint64(14695981039346656037)  # FNV offset basis

    def __init__(self):
        self.token_re = re.compile(TOKEN_RE)

    def _fp_batch(self, texts) -> np.ndarray:
        from ..functions.strhash import powers, token_poly_hashes

        tok_h, n_toks = token_poly_hashes(texts, self.token_re)
        flat = tok_h.size > 0
        # doc fp: SEED*B^m + sum(tok_h_j * B^(m-1-j))  (uint64 wrap)
        doc_ends = np.cumsum(n_toks)
        p64 = powers(self.B64, int(n_toks.max(initial=0)) + 1, np.uint64)
        fp = self.SEED64 * p64[n_toks]
        nz = n_toks > 0
        if flat:
            rev_t = (np.repeat(doc_ends - 1, n_toks)
                     - np.arange(tok_h.size, dtype=np.int64))
            starts = np.concatenate(([0], doc_ends[:-1]))[nz]
            fp[nz] += np.add.reduceat(
                tok_h.astype(np.uint64) * p64[rev_t], starts).astype(np.uint64)
        return fp.astype(np.int64)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        with np.errstate(over="ignore"):
            fps = self._fp_batch(batch["text"].tolist())
        return pd.DataFrame({"doc_id": batch["doc_id"],
                             "fingerprint": fps})


class BigramPartial:
    """Map-side combiner for the corpus byte-bigram language model
    (pass 1 of the CCNet-style perplexity filter): each batch's texts
    are concatenated once, UTF-8 byte bigrams computed in one
    vectorized pass (b0*256+b1 → a 65,536-slot space, no hashing
    needed), pairs straddling document boundaries masked out, and the
    batch reduced to its nonzero (bigram, n) rows — the exchange
    carries ≤ 64Ki rows per batch regardless of text volume, and the
    global reduce is one vocabulary-sized groupby sum."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].fillna("").tolist()
        blob = "\x00".join(texts).encode("utf-8", "surrogatepass")
        a = np.frombuffer(blob, dtype=np.uint8)
        if a.size < 2:
            return pd.DataFrame({"bigram": np.array([], dtype=np.int64),
                                 "n": np.array([], dtype=np.int64)})
        big = a[:-1].astype(np.int32) * 256 + a[1:]
        # drop pairs touching the \x00 separators
        keep = (a[:-1] != 0) & (a[1:] != 0)
        counts = np.bincount(big[keep], minlength=65536)
        nz = np.nonzero(counts)[0]
        return pd.DataFrame({"bigram": nz.astype(np.int64),
                             "n": counts[nz].astype(np.int64)})


def train_bigram_lm(ds) -> np.ndarray:
    """Reduce a documents Dataset to a 65,536-entry byte-bigram
    cost table (bits per bigram, add-one smoothed, conditioned on the
    first byte: -log2 p(b1|b0)). The driver holds O(64Ki) state — a
    512 KB table independent of corpus size — and callers broadcast
    it into pass 2 (ray.put on a real cluster; closure capture is
    equivalent single-node)."""
    from ray.data.aggregate import Sum

    parts = (ds.map_batches(BigramPartial(), batch_format="pandas",
                            batch_size=None)
             .groupby("bigram").aggregate(Sum("n", alias_name="n"))
             .to_pandas())  # ≤ 64Ki rows by construction
    counts = np.zeros(65536, dtype=np.float64)
    counts[parts["bigram"].to_numpy()] = parts["n"].to_numpy()
    ctx = counts.reshape(256, 256)
    # p(b1|b0) with add-one smoothing over the 256-way continuation
    denom = ctx.sum(axis=1, keepdims=True) + 256.0
    bits = -np.log2((ctx + 1.0) / denom)
    return bits.reshape(-1)


class PerplexityScore:
    """Pass 2: per-document bits-per-bigram under the broadcast
    corpus model — np.add.reduceat over the batch's concatenated
    bigram costs, no per-document Python loop. Documents scoring far
    above the corpus-typical rate (gibberish, binary junk, wrong
    encoding) are the ones a CCNet-style filter drops; ``keep``
    thresholds at KEEP_BITS bits/bigram."""

    KEEP_BITS = 6.0

    def __init__(self, bits_table: np.ndarray):
        self.bits = np.asarray(bits_table, dtype=np.float64)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].fillna("").tolist()
        enc = [t.encode("utf-8", "surrogatepass") for t in texts]
        lens = np.array([len(b) for b in enc], dtype=np.int64)
        blob = b"\x00".join(enc)
        a = np.frombuffer(blob, dtype=np.uint8)
        n_docs = len(texts)
        n_big = np.maximum(lens - 1, 0)
        if a.size >= 2:
            big = a[:-1].astype(np.int32) * 256 + a[1:]
            cost = self.bits[big]
            cost[(a[:-1] == 0) | (a[1:] == 0)] = 0.0
            # each doc d occupies [off_d, off_d + len_d) in the blob;
            # its bigrams are the first len_d - 1 positions
            offs = np.concatenate(([0], (np.cumsum(lens + 1))[:-1]))
            starts = np.minimum(offs, cost.size - 1)
            totals = np.add.reduceat(cost, starts) if n_docs else np.array([])
            # reduceat includes the doc's own separator-masked tail, which
            # is already zeroed, so totals are exact per-doc sums
        else:
            totals = np.zeros(n_docs)
        bpb = np.divide(totals, n_big, out=np.zeros(n_docs, dtype=np.float64),
                        where=n_big > 0)
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "n_bigrams": n_big,
            "bits_per_bigram": np.round(bpb, 6),
            "keep": bpb <= self.KEEP_BITS,
        })
