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
    documents, unlike a bag-of-words hash). Deterministic across
    processes (crc32-based, no PYTHONHASHSEED)."""

    B = np.uint64(1099511628211)  # FNV prime as the rolling base

    def __init__(self):
        self.token_re = re.compile(TOKEN_RE)

    def _fp(self, text: str) -> int:
        import zlib

        h = np.uint64(14695981039346656037)
        for tok in self.token_re.findall(text.lower()):
            h = h * self.B + np.uint64(zlib.crc32(tok.encode()))
        return int(h.astype(np.int64))

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        with np.errstate(over="ignore"):
            fps = [self._fp(t) for t in batch["text"]]
        return pd.DataFrame({"doc_id": batch["doc_id"],
                             "fingerprint": np.array(fps, dtype=np.int64)})
