"""t1 behavioral oracles for the engine-specific (non-SQL-expressible)
operators: approx sketches, sampling, MinHash/SimHash mirrors, ANN
recall, multimodal fake featurizer, vector functions vs numpy."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyspark.sql.functions as F
import pytest

from sparkflow_spark.catalog import Tables
from sparkflow_spark.queries import load_all

REGISTRY = load_all()


def test_q15_approx_count_distinct_within_5pct(spark, oracle_sf_dir):
    approx = REGISTRY["q15_approx_count_distinct"].fn(spark, oracle_sf_dir).first()["u"]
    exact = REGISTRY["q14_count_distinct"].fn(spark, oracle_sf_dir).first()["u"]
    assert abs(approx - exact) / exact <= 0.05, (approx, exact)


def test_q33_sampling_binomial_bounds_and_determinism(spark, oracle_sf_dir):
    q = REGISTRY["q33_sampling"].fn
    n1 = q(spark, oracle_sf_dir).count()
    n2 = q(spark, oracle_sf_dir).count()
    assert n1 == n2, "same seed must give identical sample"
    total = Tables(spark, oracle_sf_dir).lineitem.count()
    p = 0.1
    sd = math.sqrt(total * p * (1 - p))
    assert abs(n1 - total * p) < 6 * sd, (n1, total)


def test_minhash_est_jaccard_tracks_exact(spark, oracle_sf_dir):
    """MinHash estimate within 0.25 of exact Jaccard on every candidate
    pair it surfaces at est >= 0.5 (64 hashes → se ≈ 0.0625)."""
    est = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in REGISTRY["d_minhash_pairs"].fn(spark, oracle_sf_dir).collect()
    }
    exact = {
        (r["id_a"], r["id_b"]): float(r["j"])
        for r in REGISTRY["d_ngram_jaccard_pairs"].fn(spark, oracle_sf_dir).collect()
    }
    assert est, "minhash should surface candidate pairs"
    hits = sum(1 for p in est if p in exact)
    assert hits / len(est) >= 0.8, f"{hits}/{len(est)} minhash pairs confirmed by exact jaccard"
    for pair, e in est.items():
        if pair in exact:
            assert abs(e - exact[pair]) <= 0.25, (pair, e, exact[pair])


def test_minhash_recall_of_exact_near_dups(spark, oracle_sf_dir):
    exact_hi = {
        (r["id_a"], r["id_b"])
        for r in REGISTRY["d_ngram_jaccard_pairs"].fn(spark, oracle_sf_dir).collect()
        if float(r["j"]) >= 0.7
    }
    cand = {
        (r["id_a"], r["id_b"])
        for r in REGISTRY["d_minhash_pairs"].fn(spark, oracle_sf_dir).collect()
    }
    assert exact_hi, "fixture should contain high-jaccard near-dups"
    recall = len(exact_hi & cand) / len(exact_hi)
    assert recall >= 0.9, f"minhash recall {recall} on {len(exact_hi)} true pairs"


def test_simhash_fast_matches_catalyst(spark, sf_dir):
    """simhash64_fast (Arrow numpy path used by the dedup kernel) must
    be bit-identical to the pure-Catalyst simhash64 definition — on the
    fixture corpus and on the edge shapes (empty text, null, < 3
    tokens)."""
    import pyspark.sql.functions as F

    from sparkflow_spark.catalog import cached_table
    from sparkflow_spark.dedup import simhash64_fast
    from sparkflow_spark.functions.text import simhash64

    docs = cached_table(spark, sf_dir, "documents")
    edge = spark.createDataFrame(
        [(10_001, ""), (10_002, None), (10_003, "one"), (10_004, "a b")],
        ["doc_id", "text"],
    )
    both = docs.select("doc_id", "text").unionAll(edge).select(
        simhash64(F.col("text")).alias("a"), simhash64_fast(F.col("text")).alias("b")
    )
    assert both.filter(~F.col("a").eqNullSafe(F.col("b"))).count() == 0


def test_simhash_python_mirror(spark, sf_dir):
    """Spark simhash64 pairs verified against hamming distance computed
    in python over the Spark-produced hashes (structure check: pairs
    reported at <=3 really are <=3 apart, none duplicated)."""
    rows = REGISTRY["d_simhash_pairs"].fn(spark, sf_dir).collect()
    assert len(rows) == len({(r["id_a"], r["id_b"]) for r in rows})
    for r in rows:
        assert 0 <= r["hamming"] <= 3
        assert r["id_a"] < r["id_b"]


def test_lsh_ann_recall_vs_brute_force(spark, oracle_sf_dir):
    brute = {
        r["probe_id"]: r["vec_id"]
        for r in REGISTRY["s_brute_force_top1"].fn(spark, oracle_sf_dir).collect()
    }
    ann = {
        r["probe_id"]: r["vec_id"]
        for r in REGISTRY["s_lsh_ann_top1"].fn(spark, oracle_sf_dir).collect()
    }
    assert set(ann) == set(brute)
    recall = sum(1 for p in brute if ann.get(p) == brute[p]) / len(brute)
    assert recall >= 0.8, f"ANN top-1 recall {recall}"


def test_vector_functions_vs_numpy(spark):
    from sparkflow_spark.functions.vector import cosine_similarity, dot, l2_norm, normalize

    a = [1.0, -2.0, 3.0, 0.5]
    b = [0.0, 4.0, -1.0, 2.0]
    df = spark.createDataFrame([(a, b)], ["a", "b"])
    row = df.select(
        dot("a", "b").alias("d"),
        l2_norm("a").alias("n"),
        cosine_similarity("a", "b").alias("c"),
        normalize("a").alias("u"),
    ).first()
    na, nb = np.array(a), np.array(b)
    assert row["d"] == pytest.approx(float(na @ nb))
    assert row["n"] == pytest.approx(float(np.linalg.norm(na)))
    assert row["c"] == pytest.approx(float(na @ nb / (np.linalg.norm(na) * np.linalg.norm(nb))))
    assert np.allclose(row["u"], na / np.linalg.norm(na))
    zero = spark.createDataFrame([([0.0, 0.0], [1.0, 1.0])], ["a", "b"])
    zrow = zero.select(cosine_similarity("a", "b").alias("c"), normalize("a").alias("u")).first()
    assert zrow["c"] is None  # NULL-safe on zero norm
    assert zrow["u"] == [0.0, 0.0]


def test_multimodal_featurizer_numpy_oracle(spark, sf_dir):
    from sparkflow_spark.multimodal import fake_featurize_bytes

    rows = REGISTRY["mm_feature_extract"].fn(spark, sf_dir).limit(20).collect()
    texts = {
        r["doc_id"]: r["text"]
        for r in Tables(spark, sf_dir).documents.select("doc_id", "text").limit(200).collect()
    }
    checked = 0
    for r in rows:
        if r["doc_id"] in texts:
            expect = fake_featurize_bytes(texts[r["doc_id"]].encode())
            # driver-canonicalizer-safe CSV form (r12 verdict ask #2):
            # exact float→string, lossless to parse back
            got = [float(x) for x in r["features_csv"].split(",")]
            assert got == pytest.approx(expect)
            checked += 1
    assert checked > 0


def test_multimodal_frame_sampler_python_oracle(spark, sf_dir):
    rows = REGISTRY["mm_frame_sample"].fn(spark, sf_dir).filter(F.col("doc_id") == 0).collect()
    text = (
        Tables(spark, sf_dir).documents.filter(F.col("doc_id") == 0).first()["text"].encode()
    )
    step = max(len(text) // 4, 1)
    for r in rows:
        chunk = text[r["frame_idx"] * step : (r["frame_idx"] + 1) * step]
        assert r["frame_sha"] == hashlib.sha256(chunk).hexdigest()


def test_decode_image_builtin_codecs(spark):
    """decode_image decodes real fixtures through mapInPandas with the
    dependency-free codecs (r9 verdict ask #8): a P6 PPM with a header
    comment, a P5 PGM, a bottom-up 24-bit BMP with row padding (3px
    wide → 3 pad bytes), and an undecodable blob → NULL row."""
    import struct

    import numpy as np

    from sparkflow_spark.multimodal import decode_image

    ppm6 = b"P6\n# a comment\n2 2\n255\n" + bytes(range(12))
    pgm5 = b"P5\n3 1\n255\n" + bytes([0, 128, 255])
    # 3x2 bottom-up BMP, BGR rows padded to 12 bytes
    row_bottom = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90]) + b"\0\0\0"
    row_top = bytes([11, 21, 31, 41, 51, 61, 71, 81, 91]) + b"\0\0\0"
    bmp = (
        b"BM"
        + struct.pack("<IHHI", 54 + 24, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 3, 2, 1, 24, 0, 24, 0, 0, 0, 0)
        + row_bottom
        + row_top
    )
    df = spark.createDataFrame(
        [(1, bytearray(ppm6)), (2, bytearray(pgm5)), (3, bytearray(bmp)),
         (4, bytearray(b"not an image"))],
        "doc_id long, content binary",
    )
    rows = {r["doc_id"]: r for r in decode_image(df).collect()}
    assert (rows[1]["width"], rows[1]["height"], rows[1]["mode"]) == (2, 2, "RGB")
    assert np.allclose(rows[1]["pixels"], np.arange(12) / 255.0, atol=1e-7)
    assert (rows[2]["width"], rows[2]["height"], rows[2]["mode"]) == (3, 1, "L")
    assert np.allclose(rows[2]["pixels"], np.array([0, 128, 255]) / 255.0)
    assert (rows[3]["width"], rows[3]["height"], rows[3]["mode"]) == (3, 2, "RGB")
    # bottom-up flip puts row_top first; BGR → RGB reverses each triple
    expect = np.array(
        [31, 21, 11, 61, 51, 41, 91, 81, 71, 30, 20, 10, 60, 50, 40, 90, 80, 70]
    ) / 255.0
    assert np.allclose(rows[3]["pixels"], expect)
    assert rows[4]["width"] is None and rows[4]["pixels"] is None


def test_lang_id_accuracy(spark, sf_dir):
    """Heuristic language-ID against the fixture's lang ground truth.
    The marker sets are tiny, so demand better-than-chance, not SOTA."""
    df = REGISTRY["t_quality_langid"].fn(spark, sf_dir)
    truth = Tables(spark, sf_dir).documents.select("doc_id", "lang")
    joined = df.join(truth, "doc_id")
    langs = {r["lang"] for r in truth.select("lang").distinct().collect()}
    known = joined.filter(F.col("lang").isin(*[l for l in langs if l in ("en", "de", "fr", "es", "it")]))
    n = known.count()
    if n == 0:
        pytest.skip("no overlapping languages in fixture")
    acc = known.filter(F.col("lang_pred") == F.col("lang")).count() / n
    assert acc > 1.0 / max(len(langs), 2), f"lang-id accuracy {acc} not above chance"


def test_ivf_ann_recall_vs_brute_force(spark, oracle_sf_dir):
    brute = {
        r["probe_id"]: r["vec_id"]
        for r in REGISTRY["s_brute_force_top1"].fn(spark, oracle_sf_dir).collect()
    }
    ivf = {
        r["probe_id"]: r["vec_id"]
        for r in REGISTRY["s_ivf_ann_top1"].fn(spark, oracle_sf_dir).collect()
    }
    assert set(ivf) == set(brute)
    recall = sum(1 for p in brute if ivf.get(p) == brute[p]) / len(brute)
    assert recall >= 0.7, f"IVF top-1 recall {recall}"

def test_minhash_ansi_safe(spark, sf_dir):
    """The (a*x+b) mod p family must not overflow int64 under ANSI mode
    (Spark 4's default on a bare session): p = 2^31-1 with pre-reduced
    base hashes keeps every product < 2^62. Round-1's p = 2^61-1 threw
    ARITHMETIC_OVERFLOW here (r2 verdict #2)."""
    from sparkflow_spark import dedup
    from sparkflow_spark.catalog import Tables

    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        docs = Tables(spark, sf_dir).documents.limit(50)
        rows = dedup.minhash_candidate_pairs(docs, num_hashes=16, bands=4).collect()
        for r in rows:
            assert 0.0 <= r["est_jaccard"] <= 1.0
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_detect_lang_tie_goes_to_default(spark):
    """A hit-count tie that includes the default language resolves to the
    default, not the lexicographically greatest code (r2 verdict #3)."""
    from sparkflow_spark.functions.text import detect_lang

    df = spark.createDataFrame(
        [
            ("the il",),          # en=1, it=1 tie -> default 'en'
            ("que",),             # fr=1, es=1 tie, no default -> greatest code 'fr'
            ("xyz qwerty",),      # no hits -> default
            ("il che di x",),     # it=3 outright
        ],
        ["text"],
    )
    got = [r["lang"] for r in df.select(detect_lang("text").alias("lang")).collect()]
    assert got == ["en", "fr", "en", "it"]


def test_embedding_ann_matches_brute_force(spark, oracle_sf_dir):
    """The LSH ANN near-dup path (exact-verified candidates) returns the
    identical pair set as the O(n^2) brute-force oracle path on the
    fixtures — recall loss would show as missing pairs."""
    from sparkflow_spark import dedup
    from sparkflow_spark.catalog import Tables

    emb = Tables(spark, oracle_sf_dir).embeddings
    brute = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_near_duplicates(emb, threshold=0.4).collect()
    }
    ann = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_near_duplicates_ann(emb, threshold=0.4).collect()
    }
    assert ann == brute

def test_stratified_sampling_binomial_bounds(spark, oracle_sf_dir):
    """sampleBy: per-stratum counts within 6 sigma of n_h * f_h, and the
    f=1.0 stratum is kept whole; same seed → identical sample."""
    q = REGISTRY["q33_stratified_sampling"].fn
    s1 = q(spark, oracle_sf_dir).groupBy("o_orderstatus").count().collect()
    s2 = q(spark, oracle_sf_dir).groupBy("o_orderstatus").count().collect()
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))
    totals = {
        r["o_orderstatus"]: r["count"]
        for r in Tables(spark, oracle_sf_dir).orders.groupBy("o_orderstatus").count().collect()
    }
    fractions = {"F": 0.05, "O": 0.2, "P": 1.0}
    got = {r["o_orderstatus"]: r["count"] for r in s1}
    for stratum, f in fractions.items():
        n = totals[stratum]
        if f == 1.0:
            assert got.get(stratum) == n
        else:
            sd = math.sqrt(n * f * (1 - f))
            assert abs(got.get(stratum, 0) - n * f) < 6 * sd, (stratum, got.get(stratum), n * f)

def test_tokens_drop_empties_for_all_whitespace(spark):
    """Edge whitespace that F.trim does not strip (tab/newline) must not
    smuggle empty tokens through tokenization (round-3 review finding:
    trim handles spaces only, while the \\s+ split matches all
    whitespace)."""
    from sparkflow_spark.functions.text import token_count, tokens

    df = spark.createDataFrame(
        [("\thello world ",), ("",), ("  \n ",), ("a\nb\tc",), (None,)], ["text"]
    )
    rows = df.select(tokens("text").alias("t"), token_count("text").alias("n")).collect()
    assert [r["t"] for r in rows] == [["hello", "world"], [], [], ["a", "b", "c"], None]
    assert [r["n"] for r in rows] == [2, 0, 0, 3, None]


def test_pack_sequences_invariants(spark):
    """Packing invariants on constructed docs: bins fill sequentially
    per source, a doc never lands in a later bin than its running
    offset, and an oversized doc anchors to the bin where its offset
    starts (concat-then-chunk semantics)."""
    from sparkflow_spark.queries import load_all

    rows = [
        # source A: 100-token doc fills bin 0, next doc starts bin 0
        # at offset 100 (still < 256), third doc crosses into bin 1
        (1, "w " * 100, "A"),
        (2, "w " * 100, "A"),
        (3, "w " * 100, "A"),
        # source B: an oversized 600-token doc anchors at bin 0; the
        # doc after it starts at offset 600 → bin 2
        (4, "w " * 600, "B"),
        (5, "w " * 10, "B"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        # satisfy Tables for the one table the query touches
        out = {
            r["doc_id"]: (r["n_tok"], r["bin_id"])
            for r in load_all()["p_pack_sequences"].fn(spark, d).collect()
        }
    assert out[1] == (100, 0)
    assert out[2] == (100, 0)   # starts at offset 100, bin 0
    assert out[3] == (100, 0)   # starts at offset 200, bin 0 (crosses into 1)
    assert out[4] == (600, 0)   # oversized doc anchors at its start bin
    assert out[5] == (10, 2)    # next doc starts at offset 600 → bin 2


def test_source_mixture_budget_is_per_source(spark):
    """Each source's kept token mass never exceeds the budget, and
    docs are taken in doc_id order (a prefix per source)."""
    from sparkflow_spark.queries import load_all

    rows = [(i, "w " * 300, "A") for i in range(1, 6)] + [
        (10 + i, "w " * 300, "B") for i in range(1, 6)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        kept = load_all()["p_source_mixture"].fn(spark, d).collect()
    by_source: dict[str, list[int]] = {}
    for r in kept:
        by_source.setdefault(r["source"], []).append(r["doc_id"])
    # 800-token budget / 300-token docs → exactly the first 2 per source
    assert sorted(by_source["A"]) == [1, 2]
    assert sorted(by_source["B"]) == [11, 12]


def test_dedup_kernels_handle_empty_and_tiny_inputs(spark):
    """Empty partitions are routine at scale (filters, skewed splits):
    every dedup kernel must return empty results — not throw — on empty
    and single-row inputs, and the jaccard width heuristic must not
    explode on inputs with unknown plan statistics (a LocalRelation
    reports defaultSizeInBytes=Long.MaxValue; the byte heuristic once
    turned that into 16384 shuffle partitions for ONE row)."""
    from sparkflow_spark import dedup

    empty = spark.createDataFrame([], "doc_id bigint, text string")
    one = spark.createDataFrame([(1, "hello world foo")], "doc_id bigint, text string")
    assert dedup.ngram_jaccard_pairs(empty, threshold=0.5, max_shingle_freq=20).count() == 0
    jac_one = dedup.ngram_jaccard_pairs(one, threshold=0.5, max_shingle_freq=20)
    assert jac_one.count() == 0
    # width guard: unknown-stats input must size by cores, not the cap
    assert jac_one.rdd.getNumPartitions() <= 4 * (
        spark.sparkContext.defaultParallelism + 32
    )
    assert dedup.minhash_candidate_pairs(empty).count() == 0
    assert dedup.simhash_near_duplicates(empty).count() == 0
    assert dedup.exact_dedup(empty).count() == 0
    eemb = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    assert dedup.embedding_near_duplicates(eemb).count() == 0
    assert dedup.embedding_near_duplicates_ann(eemb).count() == 0
    cc = dedup.connected_components(spark.createDataFrame([], "id_a bigint, id_b bigint"))
    assert cc.count() == 0


def test_connected_components_path_graph_converges_in_log_rounds(spark):
    """A 100-node path is the diameter-heavy shape min-label propagation
    alone cannot finish in 20 rounds (it needs O(diameter) = 99); the
    pointer-jumping shortcut makes it O(log d), so the default max_iter
    must suffice and every node must label to the path minimum.
    (r14: the driver union-find fast path is disabled here so this keeps
    pinning the DISTRIBUTED loop, which owns graphs above the bound.)"""
    from sparkflow_spark import dedup

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(100)], "id_a bigint, id_b bigint"
    )
    saved = dedup._CC_DRIVER_EDGE_MAX
    dedup._CC_DRIVER_EDGE_MAX = 0
    try:
        comp = dedup.connected_components(pairs).collect()
    finally:
        dedup._CC_DRIVER_EDGE_MAX = saved
    assert len(comp) == 101
    assert all(r["component"] == 0 for r in comp)


def test_connected_components_loud_on_max_iter_exhaustion(spark):
    """Exhausting max_iter must never silently return partial labels
    (round-4 audit: near_dedup would keep duplicates with no signal).
    (r14: forced onto the distributed loop — the driver union-find path
    cannot exhaust max_iter, which is the point of its guard.)"""
    import warnings

    from sparkflow_spark import dedup

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "id_a bigint, id_b bigint"
    )
    saved = dedup._CC_DRIVER_EDGE_MAX
    dedup._CC_DRIVER_EDGE_MAX = 0
    try:
        with pytest.raises(RuntimeError, match="did not converge"):
            dedup.connected_components(pairs, max_iter=2)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            labels = dedup.connected_components(
                pairs, max_iter=2, on_nonconvergence="warn"
            )
            assert labels.count() == 61  # partial labels still returned
        assert any("did not converge" in str(x.message) for x in w)
    finally:
        dedup._CC_DRIVER_EDGE_MAX = saved


def test_connected_components_driver_path_equals_distributed(spark):
    """r14: the small-graph driver union-find must label EXACTLY like
    the distributed join loop — same (node, component-minimum) set —
    on an adversarial mix of chains, cycles, stars, self-loops and
    singleton edges."""
    import random

    from sparkflow_spark import dedup

    rng = random.Random(7)
    edges = [(i, i + 1) for i in range(50)]  # chain
    edges += [(100 + i, 100 + (i + 1) % 7) for i in range(7)]  # cycle
    edges += [(200, 200 + i) for i in range(1, 9)]  # star
    edges += [(300, 300), (301, 301)]  # self-loops
    edges += [(rng.randrange(400, 440), rng.randrange(400, 440)) for _ in range(60)]
    pairs = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    fast = {
        (r["node"], r["component"])
        for r in dedup.connected_components(pairs).collect()
    }
    saved = dedup._CC_DRIVER_EDGE_MAX
    dedup._CC_DRIVER_EDGE_MAX = 0
    try:
        slow = {
            (r["node"], r["component"])
            for r in dedup.connected_components(pairs).collect()
        }
    finally:
        dedup._CC_DRIVER_EDGE_MAX = saved
    assert fast == slow


def test_lsh_topk_null_first_vector_and_empty_corpus(spark):
    """The dim probe must skip NULL vectors (a NULL physically-first row
    crashed len(first()[0]) — round-4 advice) and an all-NULL corpus
    must yield an empty result, not a TypeError."""
    from sparkflow_spark import similarity

    rows = [(0, None), (1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])]
    corpus = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    probes = spark.createDataFrame(
        [(1, [1.0, 0.0])], "probe_id bigint, embedding array<float>"
    )
    top = similarity.lsh_topk(
        corpus.repartition(1, F.lit(0)),  # pin NULL physically first
        probes, k=2, num_planes=2, num_tables=8,
    )
    got = top.filter(F.col("vec_id") != F.col("probe_id")).first()
    assert got is not None and got["vec_id"] == 2
    empty = spark.createDataFrame([(0, None)], "vec_id bigint, embedding array<float>")
    assert similarity.lsh_topk(empty, probes, k=1).count() == 0


def test_dot_batched_edge_inputs_match_dot_nulls(spark):
    """Ragged pairs and null-element vectors must yield SQL NULL (what
    the Catalyst dot produces) instead of crashing np.stack; a uniform
    batch keeps the einsum fast path (round-4 advice)."""
    from sparkflow_spark.functions.vector import dot, dot_batched

    rows = [
        (1, [1.0, 2.0], [3.0, 4.0]),     # clean → 11.0
        (2, [1.0, 2.0, 9.0], [3.0, 4.0]),  # ragged → NULL
        (3, None, [1.0, 1.0]),            # null vector → NULL
        (4, [1.0, None], [2.0, 2.0]),     # null element → NULL
    ]
    df = spark.createDataFrame(
        rows, "id bigint, a array<double>, b array<double>"
    )
    got = {
        r["id"]: (r["fast"], r["exact"])
        for r in df.select(
            "id",
            dot_batched("a", "b").alias("fast"),
            dot("a", "b").alias("exact"),
        ).collect()
    }
    assert got[1] == (11.0, 11.0)
    for i in (2, 3, 4):
        assert got[i][0] is None and got[i][1] is None, (i, got[i])


def test_ffd_packing_invariants_and_padding_win(spark, oracle_sf_dir):
    """True-FFD packing: no bin over budget (oversized docs alone in
    their bin), deterministic across invocations, and realized padding
    strictly better than arrival-order next-fit — the measured reason
    this operator exists (the pure-expression desc-sort variant was
    measured WORSE than arrival order and rejected)."""
    import pandas as pd

    rows = REGISTRY["p_pack_sequences_ffd"].fn(spark, oracle_sf_dir).collect()
    pdf = pd.DataFrame([r.asDict() for r in rows])
    budget = 256
    fills = (
        pdf.assign(n_cap=pdf["n_tok"].clip(upper=budget))
        .groupby(["source", "bin_id"])["n_cap"]
        .sum()
    )
    assert (fills <= budget).all(), "a bin exceeds the token budget"
    # padding vs arrival-order next-fit over the same docs
    ffd_pad = float((budget - fills).sum() / (budget * len(fills)))
    pads = 0.0
    bins = 0
    for _, grp in pdf.sort_values("doc_id").groupby("source"):
        rem = 0
        for n in grp["n_tok"].clip(upper=budget):
            if n > rem:
                pads += rem
                bins += 1
                rem = budget
            rem -= n
        pads += rem
    nf_pad = pads / (budget * bins)
    assert ffd_pad < nf_pad, (ffd_pad, nf_pad)
    # determinism
    from sparkflow_spark.queries import clear_result_memo

    clear_result_memo()
    again = REGISTRY["p_pack_sequences_ffd"].fn(spark, oracle_sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_edit_distance_join_matches_brute_force(spark):
    """Positional q-gram blocking + levenshtein verify must equal the
    naive all-pairs join — including distance-0 duplicates, a d=2
    configuration, and strings with repeated q-grams (position
    disambiguation)."""
    from sparkflow_spark.dedup import edit_distance_join

    names = [
        "banana split", "banana splat", "banana splits", "bananan split",
        "chocolate cake", "chocolate bake", "chocolat cake",
        "banana split",  # exact duplicate of id 0
        "mississippi", "mississippa", "massissippi",
        "totally unrelated string",
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(names)], "id long, s string"
    )

    def lev(a: str, b: str) -> int:
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[len(b)]

    for d in (1, 2):
        expect = sorted(
            (i, j, lev(a, b))
            for i, a in enumerate(names)
            for j, b in enumerate(names)
            if i < j and lev(a, b) <= d
        )
        got = sorted(
            (r.id_a, r.id_b, r.dist)
            for r in edit_distance_join(df, "s", "id", max_dist=d, q=2).collect()
        )
        assert got == expect, f"d={d}: {got} != {expect}"


def test_edit_distance_join_short_string_contract(spark):
    """Strings below q*(max_dist+1) chars break the count-filter
    guarantee — the kernel must fail loudly at execution, not silently
    miss pairs. NULL strings are dropped, not errors."""
    import pytest
    from py4j.protocol import Py4JJavaError

    from sparkflow_spark.dedup import edit_distance_join

    ok = spark.createDataFrame(
        [(0, "abcd"), (1, "abce"), (2, None)], "id long, s string"
    )
    rows = edit_distance_join(ok, "s", "id", max_dist=1, q=2).collect()
    assert [(r.id_a, r.id_b, r.dist) for r in rows] == [(0, 1, 1)]

    bad = spark.createDataFrame([(0, "abc"), (1, "abcd")], "id long, s string")
    with pytest.raises(Exception) as exc:
        edit_distance_join(bad, "s", "id", max_dist=1, q=2).collect()
    assert "edit_distance_join" in str(exc.value)


def test_pq_ann_recall_vs_brute_force(spark, oracle_sf_dir):
    brute = {
        r["probe_id"]: r["vec_id"]
        for r in REGISTRY["s_brute_force_top1"].fn(spark, oracle_sf_dir).collect()
    }
    pq = {
        r["probe_id"]: r["vec_id"]
        for r in REGISTRY["s_pq_ann_top1"].fn(spark, oracle_sf_dir).collect()
    }
    assert set(pq) == set(brute)
    recall = sum(1 for p in brute if pq.get(p) == brute[p]) / len(brute)
    assert recall >= 0.7, f"PQ top-1 recall {recall}"


def test_pq_exact_in_zero_quantization_error_limit(spark):
    """When every subvector takes at most n_codes distinct values the
    trained codebooks reconstruct vectors exactly, ADC scores equal true
    dot products, and PQ top-k must equal brute force EXACTLY (not just
    at high recall) — pins the ADC lookup arithmetic (1-based
    element_at, per-subspace argmin) end to end. Also pins the refine
    stage returning TRUE cosines."""
    import itertools
    import random

    from sparkflow_spark.similarity import brute_force_topk, pq_topk

    rng = random.Random(7)
    # dim 8, m=4 subspaces of width 2; subvectors drawn from 3 distinct
    # values per subspace → ≤ 9 distinct subvectors < n_codes=16
    vals = [0.0, 1.5, -2.25]
    rows = [
        (i, [rng.choice(vals) for _ in range(8)])
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    probes = df.limit(5).select(F.col("vec_id").alias("probe_id"), "embedding")
    bf = [(r.probe_id, r.vec_id, round(r.cosine, 9)) for r in
          brute_force_topk(df, probes, k=3).collect()]
    pq = [(r.probe_id, r.vec_id, round(r.cosine, 9)) for r in
          pq_topk(df, probes, k=3, m=4, n_codes=16, refine_factor=1).collect()]
    assert pq == bf


def test_frequent_item_pairs_semantics_and_cap_guard(spark):
    """Counts are per-BASKET (duplicate items within a basket collapse),
    confidence = pair/item support each way, and a basket over
    max_basket detonates loudly instead of expanding quadratically."""
    from sparkflow_spark.operators import frequent_item_pairs

    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "b"), (3, "b"),  # duplicate b collapses
        (4, "c"), (4, None),           # NULL item dropped
    ]
    df = spark.createDataFrame(rows, "basket long, item string")
    got = {
        (r.item_a, r.item_b): (r.pair_count, r.count_a, r.count_b,
                               round(r.conf_a_b, 6), round(r.conf_b_a, 6))
        for r in frequent_item_pairs(df, "basket", "item", min_support=2).collect()
    }
    assert got == {("a", "b"): (3, 3, 3, 1.0, 1.0)}

    with pytest.raises(Exception) as exc:
        frequent_item_pairs(df, "basket", "item", min_support=1, max_basket=2).collect()
    assert "max_basket" in str(exc.value)
