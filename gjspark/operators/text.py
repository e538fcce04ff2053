"""Text-analysis operators for training-data pipelines (graft-cell
requirement; the reference has no text analytics — its string work is
template rendering, SURVEY.md §2.2).

- text_stats      token counts + punctuation/digit/upper/stopword ratios
                  + composite quality score, built ONLY from expressions
                  both Spark and DuckDB can evaluate identically (the
                  driver's SQL-oracle gate)
- language_id     character n-gram + stopword heuristic (pandas UDF);
                  scores a small per-language profile, argmax wins
- doc_fingerprint md5 of whitespace-collapsed lowercase text (SQL-parity)
- winnow_fingerprints  winnowing: k-gram rolling hashes, min per sliding
                  window (Schleimer et al. 2003, public algorithm)
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality stats; every expression has an exact DuckDB twin
    (see __spark_entry__.oracle_sql)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    tokens = F.split(F.trim(t), r"\s+")
    n_tokens = F.size(tokens)
    punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    digits = n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    upper = n_chars - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    n_stop = F.expr(
        f"size(filter(split(trim(lower({text_col})), '\\\\s+'), x -> x in ({stop_list})))"
    )
    avg_tok_len = (F.length(F.regexp_replace(t, r"\s+", "")) / n_tokens)
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(punct / n_chars, 4).alias("punct_ratio"),
        F.round(digits / n_chars, 4).alias("digit_ratio"),
        F.round(upper / n_chars, 4).alias("upper_ratio"),
        F.round(n_stop / n_tokens, 4).alias("stopword_ratio"),
        F.round(avg_tok_len, 4).alias("avg_token_len"),
    )


# GPT-2-style pre-tokenizer shape (contractions, space-prefixed word /
# number / punctuation runs, whitespace runs), restricted to ASCII
# classes so the Java-regex (Spark) and RE2 (DuckDB oracle) engines
# tokenize identically.
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+|\s+"


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token counting two ways (training-data pipeline requirement):
    whitespace tokens and a BPE-ish regex pre-tokenization — both pure
    Column expressions, JVM-side, with exact DuckDB twins."""
    t = F.col(text_col)
    ws = F.size(F.split(F.trim(t), r"\s+")).cast("long")
    bpe = F.size(F.regexp_extract_all(t, F.lit(BPE_ISH_PATTERN), F.lit(0))).cast("long")
    return df.select(
        F.col(id_col),
        ws.alias("n_ws_tokens"),
        bpe.alias("n_bpe_tokens"),
    )


def quality_filter(stats: DataFrame, min_tokens: int = 10, max_punct: float = 0.3) -> DataFrame:
    """Keep docs passing simple quality gates (C4-style heuristics)."""
    return stats.filter(
        (F.col("n_tokens") >= min_tokens) & (F.col("punct_ratio") <= max_punct)
    )


# ---------------------------------------------------------------------------
# Language identification
# ---------------------------------------------------------------------------

# tiny per-language profiles: common function words + characteristic chars
_LANG_PROFILES: dict[str, tuple[set[str], str]] = {
    "en": ({"the", "and", "of", "to", "is", "in", "that", "it", "with"}, ""),
    "de": ({"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für"}, "äöüß"),
    "fr": ({"le", "la", "les", "et", "est", "une", "dans", "que", "pour"}, "éèêàç"),
    "es": ({"el", "la", "los", "y", "es", "una", "en", "que", "por"}, "ñáíóú"),
    "zh": (set(), "一鿿"),  # CJK range handled specially
}

_WORD_RE = re.compile(r"[^\W\d_]+", re.UNICODE)


def detect_language(text: str) -> str:
    """Heuristic language id; deterministic, pure Python/numpy."""
    if not text:
        return "und"
    cjk = sum(1 for ch in text if "一" <= ch <= "鿿")
    if cjk / max(len(text), 1) > 0.2:
        return "zh"
    words = [w.lower() for w in _WORD_RE.findall(text)]
    if not words:
        return "und"
    best, best_score = "und", 0.0
    for lang, (stops, chars) in _LANG_PROFILES.items():
        if lang == "zh":
            continue
        score = sum(1 for w in words if w in stops) / len(words)
        if chars:
            score += 5.0 * sum(1 for ch in text if ch in chars) / max(len(text), 1)
        if score > best_score:
            best, best_score = lang, score
    return best if best_score > 0 else "und"


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    @pandas_udf(T.StringType())
    def _lid(text: pd.Series) -> pd.Series:
        return text.map(detect_language)

    return df.select(F.col(id_col), _lid(F.col(text_col)).alias("lang_pred"))


# ---------------------------------------------------------------------------
# Fingerprinting
# ---------------------------------------------------------------------------


def doc_fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """md5 of lowercase whitespace-collapsed text — SQL-parity normalized
    fingerprint for exact-after-normalization dedup."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    return df.select(
        F.col(id_col), F.md5(norm.cast("binary")).alias("fingerprint")
    )


def _gram_hashes_i64(s: str, k: int) -> np.ndarray:
    """Positional k-gram polynomial hashes (uint64 wraparound, viewed as
    int64) — the same public rolling-hash family as the MinHash shingles,
    chosen because it has a bit-exact DuckDB twin (see __spark_entry__)."""
    from gjspark.operators.dedup import _POLY_BASE

    data = np.frombuffer(s.encode("utf-8"), dtype=np.uint8)
    win = np.lib.stride_tricks.sliding_window_view(data, k).astype(np.uint64)
    powers = np.empty(k, dtype=np.uint64)
    powers[0] = np.uint64(1)
    with np.errstate(over="ignore"):
        for i in range(1, k):
            powers[i] = powers[i - 1] * _POLY_BASE
        h = (win * powers[None, :]).sum(axis=1, dtype=np.uint64)
    return h.view(np.int64)


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints: polynomial k-gram rolling hashes,
    min per sliding window, deduplicated — emits (doc_id, n_fingerprints,
    min_fp, fp_xor); robust to small edits (Schleimer et al. 2003).
    Oracle: full SQL reimplementation in __spark_entry__."""

    @pandas_udf(
        T.StructType(
            [
                T.StructField("n_fingerprints", T.IntegerType()),
                T.StructField("min_fp", T.LongType()),
                T.StructField("fp_xor", T.LongType()),
            ]
        )
    )
    def _win(text: pd.Series) -> pd.DataFrame:
        ns, mins, xors = [], [], []
        for t in text:
            s = re.sub(r"\s+", " ", (t or "").lower()).strip()
            if len(s) < k:
                s = s.ljust(k, "_")
            hashes = _gram_hashes_i64(s, k)
            if len(hashes) >= window:
                win = np.lib.stride_tricks.sliding_window_view(hashes, window)
                picks = np.unique(win.min(axis=1))
            else:
                picks = np.unique(hashes)
            ns.append(len(picks))
            mins.append(int(picks.min()))
            xors.append(int(np.bitwise_xor.reduce(picks)))
        return pd.DataFrame({"n_fingerprints": ns, "min_fp": mins, "fp_xor": xors})

    out = df.select(F.col(id_col), _win(F.col(text_col)).alias("w"))
    return out.select(
        id_col,
        F.col("w.n_fingerprints").alias("n_fingerprints"),
        F.col("w.min_fp").alias("min_fp"),
        F.col("w.fp_xor").alias("fp_xor"),
    )
