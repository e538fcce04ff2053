"""Training-data pipeline ops: dedup (exact/MinHash/SimHash/embedding),
ANN (brute + IVF recall), text analysis — with planted ground truth."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gjspark.operators.ann import brute_force_topk, ivf_topk
from gjspark.operators.dedup import (
    embedding_near_dup,
    exact_dedup,
    minhash_lsh_pairs,
    simhash_pairs,
)
from gjspark.operators.text import (
    detect_language,
    doc_fingerprint,
    language_id,
    quality_filter,
    text_stats,
    winnow_fingerprints,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm windowsill in the afternoon sun and everyone is happy"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact duplicate of 0
        (2, BASE.replace("lazy", "sleepy")),  # near-dup of 0
        (3, "completely different content about spark partitions and shuffles"),
        (4, "another unrelated text mentioning geometry and polygons only"),
        (5, BASE + " extra tail words appended here"),  # near-dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestDedup:
    def test_exact(self, docs):
        out = {r["keeper_id"]: r["n_dups"] for r in exact_dedup(docs).collect()}
        assert out[0] == 2  # docs 0 and 1 collapse
        assert len(out) == 5

    def test_minhash_finds_near_dups(self, docs):
        pairs = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in minhash_lsh_pairs(docs, jaccard_threshold=0.5).collect()
        }
        assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
        assert (0, 2) in pairs and pairs[(0, 2)] >= 0.5
        assert (0, 5) in pairs
        assert not any({a, b} == {3, 4} for a, b in pairs)

    def test_simhash_near_dups(self, docs):
        pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_pairs(docs, max_hamming=6).collect()}
        assert (0, 1) in pairs and pairs[(0, 1)] == 0
        assert (0, 2) in pairs
        assert (3, 4) not in pairs

    def test_embedding_near_dup(self, spark):
        rng = np.random.default_rng(42)
        base = rng.normal(size=32)
        rows = []
        for i in range(20):
            v = rng.normal(size=32)
            rows.append((i, [float(x) for x in v]))
        rows.append((100, [float(x) for x in base]))
        rows.append((101, [float(x) for x in base + rng.normal(0, 0.01, 32)]))
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        pairs = {(r["id_a"], r["id_b"]) for r in embedding_near_dup(df, threshold=0.98).collect()}
        assert (100, 101) in pairs
        assert all(a >= 100 for a, b in pairs)  # random pairs don't hit 0.98


class TestConnectedComponents:
    """dedup.connected_components (large-star/small-star) — the
    transitive-closure step over near-dup pairs."""

    @staticmethod
    def _cc(spark, edges):
        from gjspark.operators.dedup import connected_components

        df = spark.createDataFrame(edges, "id_a long, id_b long")
        return {
            r["id"]: r["component"] for r in connected_components(df).collect()
        }

    def test_chain_is_one_component(self, spark):
        # a path 1-2-3-...-8: pair-finders never compared 1 with 8
        out = self._cc(spark, [(i, i + 1) for i in range(1, 8)])
        assert out == {i: 1 for i in range(1, 9)}

    def test_two_components_and_reversed_edges(self, spark):
        out = self._cc(spark, [(5, 3), (3, 9), (20, 10), (10, 30)])
        assert out == {3: 3, 5: 3, 9: 3, 10: 10, 20: 10, 30: 10}

    def test_self_loops_dropped_empty_ok(self, spark):
        from gjspark.operators.dedup import connected_components

        df = spark.createDataFrame([(7, 7)], "id_a long, id_b long")
        assert connected_components(df).count() == 0

    def test_random_graph_vs_union_find(self, spark):
        rng = np.random.default_rng(7)
        n = 300
        edges = [
            (int(a), int(b))
            for a, b in rng.integers(0, n, size=(250, 2))
            if a != b
        ]
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        touched = {v for e in edges for v in e}
        # canonicalize: representative = min id in component
        comp_min: dict[int, int] = {}
        for v in touched:
            r = find(v)
            comp_min[r] = min(comp_min.get(r, v), v)
        expected = {v: comp_min[find(v)] for v in touched}
        out = self._cc(spark, edges)
        assert out == expected

    def test_long_path_converges_in_log_rounds(self, spark):
        # a 64-node path is the worst diameter per edge count; the
        # alternating-star iteration must collapse it in O(log n) rounds
        # (max_iter=12 << 63 plain-propagation rounds)
        from gjspark.operators.dedup import connected_components

        df = spark.createDataFrame(
            [(i, i + 1) for i in range(64)], "id_a long, id_b long"
        )
        out = {
            r["id"]: r["component"]
            for r in connected_components(df, max_iter=12).collect()
        }
        assert out == {i: 0 for i in range(65)}

    def test_cluster_sizes(self, spark):
        from gjspark.operators.dedup import dedup_clusters

        df = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
        )
        rows = {
            r["id"]: (r["cluster_id"], r["cluster_size"])
            for r in dedup_clusters(df).collect()
        }
        assert rows == {
            1: (1, 3), 2: (1, 3), 3: (1, 3), 10: (10, 2), 11: (10, 2)
        }

    def test_string_ids(self, spark):
        from gjspark.operators.dedup import connected_components

        df = spark.createDataFrame(
            [("img_b", "img_a"), ("img_b", "img_c")], "id_a string, id_b string"
        )
        out = {
            r["id"]: r["component"] for r in connected_components(df).collect()
        }
        assert out == {
            "img_a": "img_a", "img_b": "img_a", "img_c": "img_a"
        }


class TestANN:
    @pytest.fixture(scope="class")
    def vecs(self, spark, fixtures_dir):
        return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").cache()

    def test_brute_force_matches_numpy(self, vecs):
        got = brute_force_topk(vecs, k=5).toPandas()
        pdf = vecs.toPandas().sort_values("vec_id").reset_index(drop=True)
        mat = np.stack(pdf["embedding"].map(np.asarray)).astype(np.float64)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = mat @ mat.T
        np.fill_diagonal(sims, -np.inf)
        ids = pdf["vec_id"].to_numpy()
        for qpos in (0, 17, 211):
            top = np.argsort(-sims[qpos])[:5]
            exp = set(ids[top])
            g = set(
                got[got.vec_id == ids[qpos]].sort_values("cosine", ascending=False)[
                    "neighbor_id"
                ]
            )
            assert g == exp
        assert (got.groupby("vec_id").size() == 5).all()

    def test_ivf_recall(self, vecs):
        brute = brute_force_topk(vecs, k=5).toPandas()
        ivf = ivf_topk(vecs, k=5, n_list=16, n_probe=12).toPandas()
        bs = set(zip(brute.vec_id, brute.neighbor_id))
        vs = set(zip(ivf.vec_id, ivf.neighbor_id))
        recall = len(bs & vs) / len(bs)
        assert recall > 0.9, recall


class TestText:
    def test_stats_and_quality(self, docs):
        st = text_stats(docs).toPandas().set_index("doc_id")
        assert st.loc[0, "n_tokens"] == len(BASE.split())
        assert 0 <= st.loc[0, "punct_ratio"] < 0.1
        assert st.loc[0, "stopword_ratio"] > 0.1
        kept = quality_filter(text_stats(docs), min_tokens=10).count()
        assert kept == 4  # docs 3,4 are shorter than 10 tokens? -> recompute
        # n.b. assertion adjusted below if counts differ

    def test_language_id(self, spark):
        rows = [
            (0, "the cat and the dog are in the house and it is warm"),
            (1, "der Hund und die Katze sind nicht in der Stadt für immer"),
            (2, "le chat est dans la maison et les enfants sont pour une fois"),
            (3, "el perro y el gato es una historia en la casa por ahora"),
            (4, "这是一个简单的中文测试文本用来验证语言识别"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r["lang_pred"] for r in language_id(df).collect()}
        assert got == {0: "en", 1: "de", 2: "fr", 3: "es", 4: "zh"}
        assert detect_language("") == "und"

    def test_fingerprints(self, spark, docs):
        fp = doc_fingerprint(docs).toPandas().set_index("doc_id")
        assert fp.loc[0, "fingerprint"] == fp.loc[1, "fingerprint"]
        assert fp.loc[0, "fingerprint"] != fp.loc[3, "fingerprint"]
        # normalization: case/whitespace-insensitive
        df2 = spark.createDataFrame(
            [(10, BASE.upper()), (11, "  " + BASE.replace(" ", "   ") + " ")],
            "doc_id long, text string",
        )
        fp2 = doc_fingerprint(df2).toPandas().set_index("doc_id")
        assert fp2.loc[10, "fingerprint"] == fp.loc[0, "fingerprint"]
        assert fp2.loc[11, "fingerprint"] == fp.loc[0, "fingerprint"]

    def test_winnowing_robust_to_small_edits(self, docs):
        w = winnow_fingerprints(docs).toPandas().set_index("doc_id")
        assert w.loc[0, "fp_xor"] == w.loc[1, "fp_xor"]  # identical docs
        assert w.loc[0, "n_fingerprints"] > 5
        # near-dup shares most fingerprints -> far fewer than 2x distinct
        assert w.loc[2, "n_fingerprints"] == pytest.approx(
            w.loc[0, "n_fingerprints"], rel=0.2
        )


def test_ngram_counts(spark):
    from gjspark.operators.text import ngram_counts

    df = spark.createDataFrame(
        [
            (0, "a b c a b"),
            (1, "A  B c"),   # case/whitespace normalize -> 'a b', 'b c'
            (2, "solo"),     # shorter than n -> contributes nothing
        ],
        "doc_id long, text string",
    )
    out = {r["ngram"]: r["n"] for r in ngram_counts(df, n=2, min_count=1).collect()}
    assert out == {"a b": 3, "b c": 2, "c a": 1}
    top = {r["ngram"] for r in ngram_counts(df, n=2, min_count=2).collect()}
    assert top == {"a b", "b c"}
    tri = {r["ngram"]: r["n"] for r in ngram_counts(df, n=3, min_count=1).collect()}
    assert tri == {"a b c": 2, "b c a": 1, "c a b": 1}
    import pytest as _pt

    with _pt.raises(ValueError):
        ngram_counts(df, n=0)


def test_token_counts_bpe_ish(spark):
    from gjspark.operators.text import token_counts

    df = spark.createDataFrame(
        [(0, "I don't like rainy-days, 42 of them!"), (1, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_ws_tokens"], r["n_bpe_tokens"]) for r in token_counts(df).collect()}
    # "I don't like rainy-days, 42 of them!" ->
    # [I][ don]['t][ like][ rainy][-][days][,][ 42][ of][ them][!] = 12
    assert got[0] == (7, 12)


def test_video_frame_sampling(spark):
    """Frame-sample plumbing with the deterministic rawvid codec; real
    container formats raise like the image stubs (multimodal.py)."""
    import struct

    import numpy as np

    from gjspark.operators.multimodal import sample_frames

    def rawvid(w, h, n, seed):
        frames = [
            (np.full((h, w, 3), (seed + i) % 256, dtype=np.uint8)).tobytes()
            for i in range(n)
        ]
        return b"RAWV" + struct.pack("<HHH", w, h, n) + b"".join(frames)

    rows = [
        ("v10", rawvid(4, 3, 10, 7), "rawvid"),   # 10 frames -> sample 4
        ("v2", rawvid(2, 2, 2, 1), "rawvid"),     # fewer than n -> all
        ("vmp4", b"\x00\x01", "mp4"),             # stubbed codec -> skipped
    ]
    df = spark.createDataFrame(rows, "video_id string, bytes binary, fmt string")
    out = sample_frames(df, n_frames=4).toPandas()
    g = out[out.video_id == "v10"].sort_values("frame_idx")
    assert list(g["frame_idx"]) == [0, 3, 6, 9]   # even coverage incl. ends
    assert (g["n_frames_total"] == 10).all()
    # pixel payloads come from the right frames (value = seed + idx)
    for idx, p in zip(g["frame_idx"], g["pixels"]):
        assert bytes(p) == bytes(np.full((3, 4, 3), (7 + idx) % 256, dtype=np.uint8))
    assert list(out[out.video_id == "v2"]["frame_idx"].sort_values()) == [0, 1]
    assert "vmp4" not in set(out["video_id"])


def test_audio_features(spark):
    import struct

    import numpy as np

    from gjspark.operators.multimodal import audio_features

    rate = 8000
    t = np.arange(rate, dtype=np.float64) / rate
    sine = (np.sin(2 * np.pi * 100 * t) * 32767 * 0.5).astype("<i2")  # 100 Hz, 1 s
    blob = b"RAWA" + struct.pack("<II", rate, sine.size) + sine.tobytes()
    df = spark.createDataFrame(
        [("a1", blob, "rawpcm"), ("bad", b"\x00", "mp3")],
        "audio_id string, bytes binary, fmt string",
    )
    out = audio_features(df).toPandas()
    assert list(out["audio_id"]) == ["a1"]
    r = out.iloc[0]
    assert r["sample_rate"] == rate and r["n_samples"] == rate
    assert abs(r["duration_s"] - 1.0) < 1e-9
    assert abs(r["rms"] - 0.5 / np.sqrt(2)) < 0.01   # sine RMS = A/sqrt(2)
    assert abs(r["peak"] - 0.5) < 0.01
    # 100 Hz sine crosses zero 200x per second -> zcr ~ 200/8000
    assert abs(r["zero_cross_rate"] - 200 / rate) < 0.005


class TestVectorizedTextKernels:
    """The batched langid / winnow kernels must be bit-identical to the
    per-document formulations they replaced (they are pure vectorizations,
    not approximations)."""

    def test_langid_batch_matches_per_doc(self):
        import numpy as np
        from gjspark.operators import text as TX

        rng = np.random.default_rng(99)
        words = ["the", "and", "der", "und", "nicht", "le", "pour", "el",
                 "una", "data", "x", "Z", "123", "spark"]
        docs = [" ".join(rng.choice(words, rng.integers(0, 40))) for _ in range(300)]
        docs[0], docs[1] = "", "   "
        fast = TX._langid_ascii_batch(docs)
        assert fast == [TX.detect_language(t) for t in docs]

    def test_langid_non_ascii_falls_back(self):
        from gjspark.operators import text as TX

        assert TX._langid_ascii_batch(["das ist ein häuschen"]) is None

    def test_winnow_batch_matches_per_doc(self):
        import re

        import numpy as np
        import pandas as pd
        from gjspark.operators import text as TX

        rng = np.random.default_rng(17)
        docs = ["".join(rng.choice(list("abcdef \t"), rng.integers(0, 120)))
                for _ in range(200)]
        docs[:3] = ["", "ab", "abcdefgh"]
        got = TX._winnow_batch(pd.Series(docs), 8, 4)
        for i, d in enumerate(docs):
            s = re.sub(r"\s+", " ", d.lower()).strip()
            if len(s) < 8:
                s = s.ljust(8, "_")
            h = TX._gram_hashes_i64(s, 8)
            if len(h) >= 4:
                win = np.lib.stride_tricks.sliding_window_view(h, 4)
                p = np.unique(win.min(axis=1))
            else:
                p = np.unique(h)
            assert got["n_fingerprints"][i] == len(p)
            assert got["min_fp"][i] == int(p.min())
            assert got["fp_xor"][i] == int(np.bitwise_xor.reduce(p))

    def test_winnow_batch_trailing_empty_doc_after_trailing_ws(self):
        """Regression: a trailing EMPTY doc puts len(buf) in the boundary
        index list; clipping it onto the buffer's last byte used to cancel
        the run-collapse of a preceding doc's trailing whitespace run, so
        the same document fingerprinted differently depending on batch
        composition (partitioning-dependent dedup)."""
        import pandas as pd
        from gjspark.operators import text as TX

        doc = "the quick brown fox  "  # >=2 trailing whitespace chars
        alone = TX._winnow_batch(pd.Series([doc]), 5, 4)
        batched = TX._winnow_batch(pd.Series([doc, ""]), 5, 4)
        for col in ("n_fingerprints", "min_fp", "fp_xor"):
            assert batched[col][0] == alone[col][0]
        # and several empty/whitespace-only trailers, mixed positions
        docs = [doc, "", "   ", "", "x  ", ""]
        got = TX._winnow_batch(pd.Series(docs), 5, 4)
        for i, d in enumerate(docs):
            solo = TX._winnow_batch(pd.Series([d]), 5, 4)
            for col in ("n_fingerprints", "min_fp", "fp_xor"):
                assert got[col][i] == solo[col][0], (i, d, col)


def test_phash_neardup_pairs(spark):
    """Banded perceptual near-dup: pigeonhole completeness vs a numpy
    brute force on a synthetic set with known Hamming structure."""
    import numpy as np

    from gjspark.operators.dedup import phash_neardup_pairs

    rng = np.random.default_rng(11)
    base = rng.integers(0, 1 << 63, 40, dtype=np.int64)
    rows = [(f"id-{i:03d}", int(v)) for i, v in enumerate(base)]
    # plant near-dups at known distances 1..7 and one at 9 (excluded)
    for k, d in enumerate([1, 3, 5, 7, 9]):
        v = int(base[k])
        for bit in rng.choice(64, d, replace=False):
            v ^= 1 << int(bit)
        if v >= 1 << 63:  # wrap to signed int64
            v -= 1 << 64
        rows.append((f"dup-{k}-{d:02d}", v))
    df = spark.createDataFrame(rows, "image_id string, phash long")
    out = phash_neardup_pairs(df).toPandas()
    got = {(r.id_a, r.id_b, r.hamming) for r in out.itertuples()}

    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    exp = set()
    vals = dict(rows)
    for a in vals:
        for b in vals:
            if a < b and ham(vals[a], vals[b]) <= 7:
                exp.add((a, b, ham(vals[a], vals[b])))
    assert got == exp
    assert ("dup-0-01" in {p[1] for p in got}) or ("dup-0-01" in {p[0] for p in got})
    assert not any("dup-4-09" in (p[0], p[1]) for p in got)


def test_phash_neardup_rejects_bad_params(spark):
    from gjspark.operators.dedup import phash_neardup_pairs

    df = spark.createDataFrame([("a", 1)], "image_id string, phash long")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        phash_neardup_pairs(df, max_hamming=8, n_bands=8)


def test_planted_neardups_exist_in_unit_corpus(fixtures_dir):
    """The e2e/unit corpora plant brightness+8 near-dups; at least one
    planted pair must land within Hamming<=7 of its base class."""
    import numpy as np
    import pyarrow.parquet as pq

    from gjspark.functions import codecs as C

    t = pq.read_table(
        f"{fixtures_dir}/images_sf_unit.parquet", columns=["phash", "fmt"]
    ).to_pandas()
    ph = np.unique(t.phash[t.fmt.isin(sorted(C.LOSSLESS))].to_numpy().astype(np.uint64))
    x = ph[:, None] ^ ph[None, :]
    ham = np.zeros(x.shape, dtype=np.int64)
    v = x.copy()
    for _ in range(64):
        ham += (v & np.uint64(1)).astype(np.int64)
        v >>= np.uint64(1)
    iu = np.triu_indices(len(ph), 1)
    close = ham[iu]
    assert ((close >= 1) & (close <= 7)).sum() >= 1
