"""Text analysis stages for large-scale training-data pipelines.

All stages are actor pools (``map_batches`` with a callable class):
regexes and tables are compiled once per actor in ``__init__``, work is
vectorized per batch. Everything is deterministic so a DuckDB oracle
can reproduce the SQL-expressible subset exactly.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

_WORD_RE = r"\S+"
# A compact BPE-ish token proxy: runs of word chars, or single non-space
# non-word chars (so punctuation counts as its own token).
_BPE_RE = r"[A-Za-z0-9_]+|[^\sA-Za-z0-9_]"

# RE2-compatible whole-word stopword pattern (same in the DuckDB oracle)
_STOP_RE = r"\b(the|and|of|a|to|in|is|it|that|was)\b"
_PUNCT_RE = r"[.,;:!?]"

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "was"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "es", "los"},
    "de": {"der", "die", "das", "und", "ist", "von", "ein", "eine", "zu", "den"},
    "fr": {"le", "la", "de", "et", "est", "un", "une", "les", "des", "que"},
}


class TextMetrics:
    """Per-doc counting / quality metrics (vectorized; SQL-checkable)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word = re.compile(_WORD_RE)
        self.bpe = re.compile(_BPE_RE)
        self.stop = re.compile(_STOP_RE)
        self.punct = re.compile(_PUNCT_RE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch[self.text_col]
        n_chars = pc.cast(pc.utf8_length(text), pa.int64())
        texts = text.to_pylist()
        # whitespace token count == len(str.split()); compiled regex per actor
        ws_tokens = pa.array(
            [len(self.word.findall(s)) for s in texts], pa.int64()
        )
        bpe_tokens = pa.array(
            [len(self.bpe.findall(s)) for s in texts], pa.int64()
        )
        alpha = pa.array(
            [sum(c.isalpha() for c in s) for s in texts], pa.int64()
        )
        stops = pa.array(
            [len(self.stop.findall(s.lower())) for s in texts], pa.int64()
        )
        punct = pa.array(
            [len(self.punct.findall(s)) for s in texts], pa.int64()
        )
        digits = pa.array(
            [sum(c.isdigit() for c in s) for s in texts], pa.int64()
        )
        out = batch.append_column("n_chars_m", n_chars)
        out = out.append_column("n_ws_tokens", ws_tokens)
        out = out.append_column("n_bpe_tokens", bpe_tokens)
        out = out.append_column("n_alpha", alpha)
        out = out.append_column("n_digit", digits)
        out = out.append_column("n_stopwords", stops)
        out = out.append_column("n_punct", punct)
        return out


def text_metrics(ds: "ray.data.Dataset", text_col: str = "text",
                 concurrency: int = 4) -> "ray.data.Dataset":
    return ds.map_batches(
        TextMetrics,
        fn_constructor_kwargs={"text_col": text_col},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency,
        num_cpus=1,
    )


class LanguageId:
    """N-gram/stopword language-ID heuristic (actor pool; model tables
    built once per actor)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word = re.compile(r"[a-zA-Záéíóúüñäöëßàèçê]+")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        langs = []
        scores = []
        for s in batch[self.text_col]:
            words = set(self.word.findall(s.lower()))
            best, best_hits = "unknown", 0
            for lang, sw in _STOPWORDS.items():
                hits = len(words & sw)
                if hits > best_hits:
                    best, best_hits = lang, hits
            langs.append(best)
            scores.append(best_hits / max(1, len(words)))
        batch["lang_pred"] = langs
        batch["lang_score"] = scores
        return batch


def language_id(ds: "ray.data.Dataset", text_col: str = "text",
                concurrency: int = 4) -> "ray.data.Dataset":
    return ds.map_batches(
        LanguageId,
        fn_constructor_kwargs={"text_col": text_col},
        batch_format="pandas",
        batch_size=4096,
        concurrency=concurrency,
        num_cpus=1,
    )


class Fingerprint:
    """Rolling-hash document fingerprint (polynomial rolling hash of the
    whole doc + min rolling hash over windows -- a winnowing-style
    signature; deterministic)."""

    BASE = np.uint64(1099511628211)
    MOD = np.uint64(0xFFFFFFFFFFFFFFFF)

    def __init__(self, text_col: str = "text", window: int = 16):
        self.text_col = text_col
        self.window = window

    def _doc_hash(self, s: str) -> tuple[int, int]:
        b = np.frombuffer(s.encode("utf-8", "ignore"), dtype=np.uint8)
        if len(b) == 0:
            return 0, 0
        with np.errstate(over="ignore"):
            # vectorized polynomial rolling hash via cumulative products
            h = np.uint64(1469598103934665603)
            full = h
            for c in b.astype(np.uint64):  # full-doc FNV-1a style
                full = np.uint64((full ^ c) * self.BASE)
            w = min(self.window, len(b))
            # windowed hashes, vectorized with a stride trick
            if len(b) >= w:
                windows = np.lib.stride_tricks.sliding_window_view(b, w).astype(
                    np.uint64
                )
                pows = self.BASE ** np.arange(w, dtype=np.uint64)
                wh = (windows * pows[::-1]).sum(axis=1)
                wmin = int(wh.min())
            else:
                wmin = int(full)
        return int(full), wmin

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        res = [self._doc_hash(s) for s in batch[self.text_col]]
        batch["doc_hash"] = np.array([r[0] for r in res], dtype=np.uint64).astype(
            "int64"
        )
        batch["min_window_hash"] = np.array(
            [r[1] for r in res], dtype=np.uint64
        ).astype("int64")
        return batch


def fingerprint(ds: "ray.data.Dataset", text_col: str = "text",
                concurrency: int = 4) -> "ray.data.Dataset":
    return ds.map_batches(
        Fingerprint,
        fn_constructor_kwargs={"text_col": text_col},
        batch_format="pandas",
        batch_size=4096,
        concurrency=concurrency,
        num_cpus=1,
    )
