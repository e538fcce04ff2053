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


def ngram_counts(
    df: DataFrame,
    text_col: str = "text",
    n: int = 2,
    min_count: int = 2,
) -> DataFrame:
    """Corpus n-gram statistics (the LM-corpus counting step): lowercase
    whitespace tokens -> sliding word n-grams -> global counts above a
    support threshold. Pure Column expressions (split / sequence /
    transform / slice / explode) — JVM-side end to end; the explode fans
    out map-side and the single shuffle carries partially-aggregated
    (ngram, count) rows, which the min_count filter then prunes. At
    10^12 rows the support threshold is what keeps the result bounded
    (the classic Google n-gram pipeline shape)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return (
        df.filter(F.size(toks) >= n)
        .select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_count)
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


def _ranges(counts: np.ndarray) -> np.ndarray:
    """Concatenated aranges: [0..c0), [0..c1), ... — vectorized."""
    total = int(counts.sum())
    reps = np.repeat(np.concatenate(([0], np.cumsum(counts)[:-1])), counts)
    return np.arange(total) - reps


_LANG_ORDER = [lang for lang in _LANG_PROFILES if lang != "zh"]
_STOP_MAXLEN = 8


def _pack_word_codes(words: set[str]) -> np.ndarray:
    out = []
    for wd in words:
        try:
            b = wd.encode("ascii")
        except UnicodeEncodeError:
            continue  # non-ASCII stopword can never occur in an ASCII batch
        if len(b) <= _STOP_MAXLEN:
            code = 0
            for i, byte in enumerate(b):
                code |= byte << (8 * i)
            out.append(code)
    return np.array(sorted(out), dtype=np.uint64)


_STOP_CODES = {lang: _pack_word_codes(_LANG_PROFILES[lang][0]) for lang in _LANG_ORDER}


def _langid_ascii_batch(texts: list[str]) -> list[str] | None:
    """Vectorized language-id for an all-ASCII batch (the common corpus
    case) — bit-identical to :func:`detect_language`: same [A-Za-z]+ word
    extraction (equals the unicode word regex on ASCII), same stopword
    ratios, same first-wins strictly-greater argmax. Returns None when the
    batch contains any non-ASCII byte (callers fall back per-doc).

    One concatenated byte buffer; word runs, per-doc word counts, and
    stopword membership (words packed into uint64, exact comparison) are
    all single numpy passes — no per-document Python loop.
    """
    n = len(texts)
    joined = "\n".join(texts)
    raw = joined.encode("utf-8")
    if len(raw) != len(joined):  # non-ASCII present
        return None
    buf = np.frombuffer(raw, dtype=np.uint8)
    lens = np.array([len(t) for t in texts], dtype=np.int64)
    offs = np.concatenate(([0], np.cumsum(lens + 1)))  # +1 for '\n' sep
    lower = buf | 0x20
    letter = (lower >= 0x61) & (lower <= 0x7A)
    prev = np.concatenate(([False], letter[:-1]))
    nxt = np.concatenate((letter[1:], [False]))
    ws_pos = np.flatnonzero(letter & ~prev)
    we_pos = np.flatnonzero(letter & ~nxt) + 1
    word_doc = np.searchsorted(offs, ws_pos, side="right") - 1
    nw = np.bincount(word_doc, minlength=n).astype(np.float64)
    wlen = we_pos - ws_pos
    # stopword membership: pack each short word's lowercased bytes into a
    # uint64 (injective for len<=8) and compare exactly
    cand = np.flatnonzero(wlen <= _STOP_MAXLEN)
    scores = np.zeros((len(_LANG_ORDER), n))
    if len(cand):
        idx = ws_pos[cand, None] + np.arange(_STOP_MAXLEN)[None, :]
        valid = idx < we_pos[cand, None]
        chars = lower[np.minimum(idx, len(buf) - 1)] * valid
        # shift-accumulate (uint64 matmul has no BLAS path and is ~100x
        # slower than eight vectorized shifts)
        codes = np.zeros(len(cand), dtype=np.uint64)
        for i in range(_STOP_MAXLEN):
            codes |= chars[:, i].astype(np.uint64) << np.uint64(8 * i)
        cdoc = word_doc[cand]
        for li, lang in enumerate(_LANG_ORDER):
            match = np.isin(codes, _STOP_CODES[lang])
            hits = np.bincount(cdoc[match], minlength=n)
            with np.errstate(invalid="ignore", divide="ignore"):
                scores[li] = np.where(nw > 0, hits / np.maximum(nw, 1), 0.0)
    # first-wins strictly-greater argmax, exactly like the per-doc loop
    best = np.zeros(n, dtype=np.int64) - 1
    best_score = np.zeros(n)
    for li in range(len(_LANG_ORDER)):
        upd = scores[li] > best_score
        best[upd] = li
        best_score[upd] = scores[li][upd]
    out = []
    for d in range(n):
        if lens[d] == 0 or nw[d] == 0 or best[d] < 0:
            out.append("und")
        else:
            out.append(_LANG_ORDER[best[d]])
    return out


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    @pandas_udf(T.StringType())
    def _lid(text: pd.Series) -> pd.Series:
        texts = ["" if t is None else t for t in text]
        fast = _langid_ascii_batch(texts)
        if fast is not None:
            return pd.Series(fast)
        return pd.Series([detect_language(t) for t in texts])

    from gjspark.operators.partitioning import spread_degenerate_scan

    # r6: spread 1-2-split corpora before the Python kernel (see the
    # partitioning module docstring); no-op on real lake tables
    df = spread_degenerate_scan(df.select(id_col, text_col))
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


_WS_LUT = np.zeros(256, dtype=bool)
for _c in (9, 10, 11, 12, 13, 32):
    _WS_LUT[_c] = True
_UPPER_LUT = np.arange(256, dtype=np.uint8)
_UPPER_LUT[65:91] += 32  # A-Z -> a-z; nothing else moves


def _normalize_ascii_batch(texts: list[str], k: int):
    """Vectorized twin of ``re.sub(r"\\s+", " ", t.lower()).strip()`` plus
    right-padding to ``k`` — for all-ASCII batches, on one concatenated
    byte buffer. Returns (buf, offs) or None for non-ASCII input.

    Bit-identical on ASCII: ``str.lower`` only moves A-Z, ``\\s`` matches
    exactly {tab, nl, vtab, ff, cr, space}, and after run-collapapse each
    doc has at most one leading/trailing space, so single-char trims
    realize ``strip``.
    """
    joined = "".join(texts)
    raw = joined.encode("utf-8")
    if len(raw) != len(joined):
        return None
    buf0 = np.frombuffer(raw, dtype=np.uint8)
    lens0 = np.array([len(t) for t in texts], dtype=np.int64)
    offs0 = np.concatenate(([0], np.cumsum(lens0)))
    low = _UPPER_LUT[buf0]
    ws = _WS_LUT[low]
    low = np.where(ws, np.uint8(32), low)
    prev = np.concatenate(([False], ws[:-1]))
    if len(prev):
        # Reset the run-collapse carry at each doc boundary. A trailing
        # empty doc puts len(buf) in offs0[:-1]; that boundary has no byte
        # to reset, so drop it (clipping it would wrongly clear the carry
        # on the buffer's LAST byte and leave a trailing run uncollapsed).
        idx = offs0[:-1]
        prev[idx[idx < len(prev)]] = False
    keep = ~(ws & prev)
    buf1 = low[keep]
    csum = np.concatenate(([0], np.cumsum(keep)))
    kept = csum[offs0[1:]] - csum[offs0[:-1]]
    offs1 = np.concatenate(([0], np.cumsum(kept)))
    # strip: at most one leading + one trailing space remain per doc
    starts = offs1[:-1].copy()
    ends = offs1[1:].copy()
    if len(buf1):
        has = ends > starts
        lead = has & (buf1[np.minimum(starts, len(buf1) - 1)] == 32)
        starts[lead] += 1
        has = ends > starts
        trail = has & (buf1[np.maximum(ends - 1, 0)] == 32)
        ends[trail] -= 1
    tlen = ends - starts
    flen = np.maximum(tlen, k)  # right-pad short docs with '_'
    offs2 = np.concatenate(([0], np.cumsum(flen)))
    buf2 = np.full(int(offs2[-1]), ord("_"), dtype=np.uint8)
    src = np.repeat(starts, tlen) + _ranges(tlen)
    dst = np.repeat(offs2[:-1], tlen) + _ranges(tlen)
    buf2[dst] = buf1[src]
    return buf2, offs2


def _winnow_batch(text: pd.Series, k: int, window: int) -> pd.DataFrame:
    """Winnowing for a whole batch in single numpy passes: one concatenated
    byte buffer for ALL k-gram hashes and sliding-window minima (windows
    crossing a doc boundary are never selected), then per-doc dedup +
    aggregates via lexsort + segmented reductions. Bit-identical to the
    per-document formulation (regression-tested)."""
    from gjspark.operators.dedup import _POLY_BASE

    if not len(text):
        return pd.DataFrame(
            {"n_fingerprints": [], "min_fp": [], "fp_xor": []}
        ).astype({"n_fingerprints": np.int32, "min_fp": np.int64, "fp_xor": np.int64})
    n = len(text)
    texts = ["" if t is None else t for t in text]
    norm = _normalize_ascii_batch(texts, k)  # vectorized ASCII fast path
    if norm is not None:
        buf, offs = norm
        lens = np.diff(offs)
    else:  # non-ASCII batch: C-level pandas string ops per doc
        s = (
            text.fillna("")
            .str.lower()
            .str.replace(r"\s+", " ", regex=True)
            .str.strip()
            .str.pad(k, side="right", fillchar="_")
        )
        docs = [t.encode("utf-8") for t in s]
        lens = np.array([len(b) for b in docs], dtype=np.int64)
        buf = np.frombuffer(b"".join(docs), dtype=np.uint8)
        offs = np.concatenate(([0], np.cumsum(lens)))
    # Horner evaluation of sum_i b_i * BASE^i over k vectorized passes —
    # no (N, k) temporary; identical uint64 wraparound arithmetic
    ngrams = len(buf) - k + 1
    h64 = np.zeros(ngrams, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(k - 1, -1, -1):
            h64 *= _POLY_BASE
            h64 += buf[i : i + ngrams]
    h = h64.view(np.int64)
    m = lens - k + 1  # per-doc gram count (>=1: padded to k)
    # signed sliding-window minima over the whole buffer at once
    if len(h) >= window:
        gmin = np.lib.stride_tricks.sliding_window_view(h, window).min(axis=1)
    else:
        gmin = h[:0]
    long_doc = m >= window
    # gather the winnow picks doc by doc IN ORDER (long docs take their
    # window-min range, short docs their raw grams), so docix comes out
    # non-decreasing and no global sort is ever needed
    counts = np.where(long_doc, m - window + 1, m)
    pos = np.repeat(offs[:-1], counts) + _ranges(counts)
    from_min = np.repeat(long_doc, counts)
    if len(gmin):
        vals = np.where(from_min, gmin[np.minimum(pos, len(gmin) - 1)], h[pos])
    else:  # no doc is long enough for a full window
        vals = h[pos]
    docix = np.repeat(np.arange(n), counts)
    # winnowing repeats the same minimum across consecutive windows
    # (~60% of picks at window=4): drop consecutive duplicates first —
    # a strict subset of the full dedup below, so harmless
    keep = np.concatenate(
        ([True], (vals[1:] != vals[:-1]) | (docix[1:] != docix[:-1]))
    )
    vals, docix = vals[keep], docix[keep]
    # full per-doc dedup by hashing (order-preserving, O(n) — beats a
    # lexsort), then segmented reductions; min/xor are order-independent
    uniq = ~pd.DataFrame({"d": docix, "v": vals}).duplicated().to_numpy()
    dv, vv = docix[uniq], vals[uniq]
    bounds = np.flatnonzero(np.concatenate(([True], dv[1:] != dv[:-1])))
    ns = np.diff(np.concatenate((bounds, [len(dv)])))
    mins = np.minimum.reduceat(vv, bounds)
    xors = np.bitwise_xor.reduceat(vv, bounds)
    return pd.DataFrame(
        {
            "n_fingerprints": ns.astype(np.int32),
            "min_fp": mins,
            "fp_xor": xors,
        }
    )


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
        return _winnow_batch(text, k, window)

    from gjspark.operators.partitioning import spread_degenerate_scan

    # r6: spread 1-2-split corpora before the Python kernel
    df = spread_degenerate_scan(df.select(id_col, text_col))
    out = df.select(F.col(id_col), _win(F.col(text_col)).alias("w"))
    return out.select(
        id_col,
        F.col("w.n_fingerprints").alias("n_fingerprints"),
        F.col("w.min_fp").alias("min_fp"),
        F.col("w.fp_xor").alias("fp_xor"),
    )
