"""Text-analysis stages for a large-scale training-data pipeline
(new scope beyond the reference, mandated by the build brief): language ID,
quality scoring, token counting, document fingerprinting. All are
vectorized ``map_batches`` stages; pattern compilation happens once per
actor (stateful-stage pattern)."""
from __future__ import annotations

import re

import numpy as np
import pandas as pd

from ..utils import splitmix64

_WORD_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)  # BPE-ish: words or single punct

# tiny per-language stopword lexicons for the n-gram/stopword heuristic
_LEXICON = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for", "was", "with"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "für", "von", "zu"},
    "fr": {"le", "la", "les", "et", "de", "un", "une", "est", "pour", "dans", "que", "avec"},
    "es": {"el", "la", "los", "las", "y", "de", "un", "una", "es", "para", "en", "con"},
}


class TokenCount:
    """documents(text) -> +n_tokens_ws (whitespace split; 0 for blank text)
    +n_tokens_re (word-or-punct regex tokens). The whitespace variant is the
    SQL-oracle-comparable one."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].fillna("")
        df["n_tokens_ws"] = [len(t.split()) for t in texts]
        df["n_tokens_re"] = [len(_WORD_RE.findall(t)) for t in texts]
        return df


class QualityStats:
    """documents(text) -> per-doc quality signals: n_chars, n_words,
    n_digits, mean word length, uppercase ratio, stopword ratio, plus a
    composite [0,1] quality score (monotone in 'looks like prose')."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        texts = df["text"].fillna("")
        n_chars = texts.str.len().to_numpy()
        words = [t.split() for t in texts]
        n_words = np.array([len(w) for w in words])
        n_digits = np.array([sum(c.isdigit() for c in t) for t in texts])
        n_upper = np.array([sum(c.isupper() for c in t) for t in texts])
        mean_wl = np.array([np.mean([len(x) for x in w]) if w else 0.0 for w in words])
        stop = np.array(
            [sum(x.lower() in _LEXICON["en"] for x in w) / len(w) if w else 0.0 for w in words]
        )
        out["n_chars"] = n_chars.astype(np.int64)
        out["n_words"] = n_words.astype(np.int64)
        out["n_digits"] = n_digits.astype(np.int64)
        out["mean_word_len"] = mean_wl
        out["upper_ratio"] = np.divide(n_upper, np.maximum(n_chars, 1))
        out["stopword_ratio"] = stop
        # composite: prose-like docs have 3<=mean_wl<=9, low digit/upper share
        wl_term = np.clip(1.0 - np.abs(mean_wl - 5.0) / 5.0, 0, 1)
        digit_term = 1.0 - np.divide(n_digits, np.maximum(n_chars, 1))
        upper_term = 1.0 - out["upper_ratio"].to_numpy()
        out["quality_score"] = (wl_term * digit_term * upper_term).astype(np.float64)
        return out


class LangId:
    """documents(text) -> +lang_pred: stopword-lexicon vote (deterministic;
    'und' when no lexicon hits). A heuristic n-gram identifier — no model
    downloads in this environment."""

    def __init__(self):
        self.lex = {k: frozenset(v) for k, v in _LEXICON.items()}

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        preds = []
        for t in df["text"].fillna(""):
            toks = [w.lower() for w in t.split()]
            best, best_n = "und", 0
            for lang in sorted(self.lex):
                n = sum(tok in self.lex[lang] for tok in toks)
                if n > best_n:
                    best, best_n = lang, n
            preds.append(best)
        df["lang_pred"] = preds
        return df


class Fingerprint:
    """documents(text) -> +fingerprint: 64-bit polynomial rolling hash of
    the whitespace-normalized text (stable across runs/machines)."""

    B = np.uint64(1000003)
    _POW_CACHE = np.cumprod(np.full(1, 1, dtype=np.uint64))  # grown lazily

    @classmethod
    def _pows(cls, n: int) -> np.ndarray:
        if len(cls._POW_CACHE) < n:
            with np.errstate(over="ignore"):
                p = np.empty(max(n, 1 << 16), dtype=np.uint64)
                p[0] = 1
                np.cumprod(np.full(len(p) - 1, cls.B, dtype=np.uint64), out=p[1:])
                # np.cumprod on uint64 wraps mod 2^64 — exactly what we want
                cls._POW_CACHE = p
        return cls._POW_CACHE

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        fps = []
        with np.errstate(over="ignore"):
            for t in df["text"].fillna(""):
                norm = " ".join(t.split()).encode("utf-8")
                arr = np.frombuffer(norm, dtype=np.uint8).astype(np.uint64)
                n = len(arr)
                pows = self._pows(n + 1)
                h = np.uint64(0xCBF29CE484222325) * pows[n] + (arr * pows[:n][::-1]).sum(dtype=np.uint64)
                fps.append(int(splitmix64(np.array([h]))[0]))
        df["fingerprint"] = np.array(fps, dtype=np.uint64)
        return df
