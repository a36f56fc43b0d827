"""Behavioral tests for the round-6 operators (repetition scoring,
BPE pair mining, containment dedup, deterministic k-means) — semantics
the cross-engine hash check can't express as pointedly."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_repetition_score_semantics(spark):
    from sparkflow_spark.queries import load_all  # noqa: F401 — registry import side effect

    # direct expression-level check through the registered fn is clumsy;
    # replicate the kernel contract on crafted docs via SQL over a temp view
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),       # one distinct 3-gram
            (2, "the quick brown fox jumps high"),      # all distinct
            (3, "hi there"),                            # < 3 tokens -> 0.0
        ],
        "doc_id long, text string",
    )
    toks = F.filter(F.split(F.lower(F.trim("text")), r"\s+"), lambda x: x != "")
    n = F.size(toks)
    docs = df.select("doc_id", toks.alias("_t"), n.alias("_n"))
    grams = F.when(
        F.col("_n") >= 3,
        F.transform(
            F.sequence(F.lit(1), F.col("_n") - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(F.col("_t"), i),
                F.element_at(F.col("_t"), i + 1),
                F.element_at(F.col("_t"), i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    out = {
        r["doc_id"]: (r["ng"], r["nd"])
        for r in docs.select(
            "doc_id",
            F.size(grams).alias("ng"),
            F.size(F.array_distinct(grams)).alias("nd"),
        ).collect()
    }
    assert out[1] == (4, 1)   # 6 tokens -> 4 trigrams, all "spam spam spam"
    assert out[2] == (4, 4)   # all distinct
    assert out[3] == (0, 0)   # too short


def test_containment_finds_excerpt_jaccard_misses(spark):
    """A short doc fully quoted inside a long one: containment fires
    in the short→long direction; Jaccard at the same threshold does
    not (the size-ratio asymmetry)."""
    from sparkflow_spark.dedup import ngram_containment_pairs, ngram_jaccard_pairs

    quote = "alpha bravo charlie delta echo foxtrot golf hotel"
    filler = " ".join(f"word{i} token{i} item{i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, quote), (2, filler + " " + quote + " " + filler.upper().lower())],
        "doc_id long, text string",
    )
    cont = {
        (r["src_id"], r["dst_id"]): r["containment"]
        for r in ngram_containment_pairs(df, threshold=0.8, max_shingle_freq=None).collect()
    }
    assert (1, 2) in cont and cont[(1, 2)] == 1.0
    assert (2, 1) not in cont  # big doc is NOT contained in the quote
    jac = ngram_jaccard_pairs(df, threshold=0.8, max_shingle_freq=None).collect()
    assert jac == []  # symmetric similarity misses the excerpt entirely


def test_containment_respects_frequency_cap(spark):
    from sparkflow_spark.dedup import ngram_containment_pairs

    # every doc shares one boilerplate phrase; cap excludes it so no
    # pair reaches the threshold on boilerplate alone
    rows = [(i, f"unique{i} only{i} here{i} shared boiler plate text") for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = ngram_containment_pairs(df, threshold=0.5, max_shingle_freq=3).collect()
    assert out == []


def test_kmeans_separates_blobs_and_is_deterministic(spark):
    import numpy as np

    from sparkflow_spark.similarity import kmeans_clusters

    rng = np.random.default_rng(3)
    rows = [(i, (rng.normal(0, 0.05, 8) + (0.0 if i % 2 == 0 else 5.0)).tolist())
            for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a = {r["vec_id"]: r["cluster"] for r in kmeans_clusters(df, k=2, iters=4).collect()}
    b = {r["vec_id"]: r["cluster"] for r in
         kmeans_clusters(df.repartition(7), k=2, iters=4).collect()}
    assert a == b, "assignment must not depend on partition layout"
    evens = {a[i] for i in range(0, 60, 2)}
    odds = {a[i] for i in range(1, 60, 2)}
    assert len(evens) == 1 and len(odds) == 1 and evens != odds


def test_kmeans_raises_under_k_vectors(spark):
    import pytest

    from sparkflow_spark.similarity import kmeans_clusters

    df = spark.createDataFrame([(1, [0.0, 1.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="at least k"):
        kmeans_clusters(df, k=4)


def test_bpe_pair_counts_manual(spark):
    from sparkflow_spark.queries import load_all

    reg = load_all()
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(1, "abab cd"), (2, "abab")], "doc_id long, text string"
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = {r["pair"]: r["n"] for r in reg["t_bpe_pair_counts"].fn(spark, d).collect()}
    # "abab" x2: pairs ab,ba,ab each; "cd" x1
    assert out == {"ab": 4, "ba": 2, "cd": 1}


def _ref_bpe(word_freq: dict, n_merges: int, min_pair_count: int = 2):
    """Pure-python reference BPE (count desc, left asc, right asc)."""
    vocab = {w: [list(w), f] for w, f in word_freq.items()}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for syms, f in vocab.values():
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                counts[k] = counts.get(k, 0) + f
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair_count:
            break
        merges.append((a, b, cnt))
        for w, (syms, f) in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = [out, f]
    return merges


def test_bpe_learn_matches_python_reference(spark):
    from sparkflow_spark.bpe import learn_bpe_merges

    corpus = [
        (1, "low lower lowest low low"),
        (2, "new newer newest new lower"),
        (3, "wide wider widest new low"),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = learn_bpe_merges(df, n_merges=6)

    freq: dict = {}
    for _, text in corpus:
        for w in text.lower().split():
            freq[w] = freq.get(w, 0) + 1
    want = _ref_bpe(freq, 6)
    assert got == want and len(got) == 6


rows_text = [(1, "banana bandana banana"), (2, "banana banal bananas")]


def test_bpe_apply_preserves_text_and_compresses(spark):
    from sparkflow_spark.bpe import apply_bpe_merges, learn_bpe_merges
    import pyspark.sql.functions as F

    df = spark.createDataFrame(rows_text, "doc_id long, text string")
    merges = learn_bpe_merges(df, n_merges=4)
    assert merges, "expected at least one merge on this corpus"
    out = apply_bpe_merges(df, merges)
    rows = out.select(
        "doc_id",
        F.concat_ws("", "bpe_tokens").alias("joined"),
        F.size("bpe_tokens").alias("n_syms"),
        F.length(F.regexp_replace(F.lower("text"), r"\s+", "")).alias("n_chars"),
    ).collect()
    for r in rows:
        # lossless: symbols concatenate back to the whitespace-stripped text
        assert r["joined"] == "".join(
            dict(rows_text)[r["doc_id"]].lower().split()
        )
        # compression: merges reduced symbol count below character count
        assert r["n_syms"] < r["n_chars"]


def test_semantic_dedup_scale_path_exact_within_buckets(spark):
    """The derived-k operator: every emitted pair is same-cluster with
    cosine ≥ t, and it finds exactly the brute-force ≥ t pairs whose
    endpoints share a cluster (cross-cluster misses are the declared
    approximation). Exercises the large-k Arrow path (k > 8)."""
    import numpy as np

    from sparkflow_spark.similarity import semantic_dedup_pairs

    rng = np.random.default_rng(11)
    # 12 well-separated blob centers, 10 points each + planted exact dups
    base = rng.normal(0, 1, (12, 16)) * 10
    rows = []
    vid = 0
    for c in range(12):
        for _ in range(10):
            rows.append((vid, (base[c] + rng.normal(0, 0.01, 16)).tolist()))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    out = semantic_dedup_pairs(
        df, threshold=0.999, cell_size=10, iters=3
    )
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert got, "expected near-dup pairs inside blobs"

    # brute force reference (python)
    X = np.asarray([r[1] for r in rows])
    norms = np.linalg.norm(X, axis=1)
    cos = (X @ X.T) / np.outer(norms, norms)
    brute = {
        (i, j)
        for i in range(len(rows))
        for j in range(i + 1, len(rows))
        if cos[i, j] >= 0.999
    }
    # every found pair is a true near-dup pair
    assert got <= brute
    # blobs are separated by >> threshold, so same-blob pairs are the
    # whole brute set; with cell_size=blob size the clustering should
    # recover (almost) all of them — require ≥ 90% recall
    assert len(got) >= 0.9 * len(brute)


def test_semantic_dedup_small_and_large_k_agree_on_threshold(spark):
    import numpy as np

    from sparkflow_spark.similarity import semantic_dedup_pairs

    rng = np.random.default_rng(5)
    rows = [(i, rng.normal(0, 1, 8).tolist()) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # n_clusters=1 → every pair considered → equals brute force exactly
    out = semantic_dedup_pairs(df, threshold=0.5, n_clusters=1)
    got = {(r["id_a"], r["id_b"]): round(r["cosine"], 6) for r in out.collect()}
    X = np.asarray([r[1] for r in rows])
    norms = np.linalg.norm(X, axis=1)
    cos = (X @ X.T) / np.outer(norms, norms)
    want = {
        (i, j): round(cos[i, j], 6)
        for i in range(40)
        for j in range(i + 1, 40)
        if cos[i, j] >= 0.5
    }
    assert set(got) == set(want)
    for k in got:
        assert abs(got[k] - want[k]) < 1e-9


def test_near_dedup_keep_best_prefers_longest(spark):
    """keep_best must keep the LONGEST member (not the min id) and
    break length ties on min id; unclustered rows survive."""
    from sparkflow_spark import dedup

    docs = spark.createDataFrame(
        [
            (1, "short copy", 10),
            (2, "the long canonical copy", 23),   # same cluster as 1, longer
            (5, "tie a", 5),
            (6, "tie b", 5),                      # tied length -> min id (5) wins
            (9, "unclustered survivor", 20),
        ],
        "doc_id long, text string, n_chars long",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (5, 6)], "id_a long, id_b long"
    )
    kept = sorted(
        r["doc_id"]
        for r in dedup.near_dedup_keep_best(docs, pairs).select("doc_id").collect()
    )
    assert kept == [2, 5, 9]
    # contrast: min-id rule keeps 1, not 2
    kept_min = sorted(
        r["doc_id"] for r in dedup.near_dedup(docs, pairs).select("doc_id").collect()
    )
    assert kept_min == [1, 5, 9]


def test_char_entropy_hand_values(spark):
    """Entropy kernel on crafted docs: single-char -> 0 bits; uniform
    two-char ("abab") -> 1 bit; empty alphabet hit -> 0 with n_alpha=0."""
    import math

    from sparkflow_spark.queries import load_all

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "????"), (4, "ab")],
        "doc_id long, text string",
    )
    # drive the registered fn on a scratch parquet sf-dir
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "documents.parquet"))
        fn = load_all()["t_char_entropy"].fn
        out = {
            r["doc_id"]: (r["n_alpha"], r["entropy_bits"])
            for r in fn(spark, td).collect()
        }
    assert out[1] == (4, 0.0)
    assert out[2] == (4, 1.0)
    assert out[3] == (0, 0.0)          # '?' outside alphabet
    assert out[4] == (2, 1.0)
    assert math.isclose(out[2][1], 1.0)


def test_repeated_spans_hand_case(spark):
    """Docs sharing a 3-gram get it flagged as shared; unique docs score 0."""
    import os
    import tempfile

    from sparkflow_spark.queries import load_all

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),    # shares 'alpha beta gamma' with 2
            (2, "alpha beta gamma epsilon"),
            (3, "zeta eta theta iota"),       # fully unique
        ],
        "doc_id long, text string",
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "documents.parquet"))
        fn = load_all()["d_repeated_spans"].fn
        out = {
            r["doc_id"]: (r["n_shingles"], r["n_shared"], r["shared_ratio"])
            for r in fn(spark, td).collect()
        }
    assert out[1] == (2, 1, 0.5)
    assert out[2] == (2, 1, 0.5)
    assert out[3] == (2, 0, 0.0)


def test_bpe_codepoint_safe_on_astral_chars(spark):
    """Astral-plane characters must stay ONE symbol (code point), never
    two surrogate halves — parity with the pure-python reference."""
    from sparkflow_spark.bpe import apply_bpe_merges, learn_bpe_merges

    df = spark.createDataFrame(
        [(1, "\U0001D11Ex \U0001D11Ex \U0001D11Ex")], "doc_id long, text string"
    )
    merges = learn_bpe_merges(df, n_merges=1, min_pair_count=2)
    assert merges and merges[0][0] == "\U0001D11E" and merges[0][1] == "x"
    out = apply_bpe_merges(df, merges).select("bpe_tokens").first()[0]
    assert out == ["\U0001D11Ex", "\U0001D11Ex", "\U0001D11Ex"]


def test_training_bins_e2e_cross_stage_contracts(spark):
    """The composition contracts the stagewise checks can't see:
    filtered docs produce NO chunks, only the min-id duplicate
    survives into chunking, and bin ids follow the per-source running
    token offset."""
    import os
    import tempfile

    from sparkflow_spark.queries import load_all

    good = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, good, "web"),                      # survives
        (2, good, "web"),                      # exact dup of 1 -> dropped
        (3, "!!!! ???? ....", "web"),          # junk -> filtered
        (4, good + " plus unique tail words here", "books"),  # survives
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "documents.parquet"))
        fn = load_all()["p_training_bins_e2e"].fn
        out = fn(spark, td).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {1, 4}          # dup 2 and junk 3 gone
    assert all(r["source"] == "web" for r in by_doc[1])
    # 13 tokens -> one 13-token chunk starting at offset 0 -> bin 0
    assert [(r["chunk_id"], r["n_tokens"], r["bin_id"]) for r in by_doc[1]] == [
        (0, 13, 0)
    ]
    assert [(r["chunk_id"], r["bin_id"]) for r in by_doc[4]] == [(0, 0)]


def test_training_bins_e2e_plan_shape(spark, sf_dir):
    """Two data exchanges end-to-end (dedup fingerprint + packing
    window) plus the single-partition final sort; no cartesian."""
    from sparkflow_spark.queries import load_all

    df = load_all()["p_training_bins_e2e"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # data shuffles: fingerprint agg (ids only) + source packing window,
    # plus the single-partition final sort; the dedup winners come BACK
    # as a BroadcastExchange semi-join, so the payload crosses once
    assert plan.count("Exchange hashpartitioning") <= 2, plan[:1500]
    assert plan.count("Exchange SinglePartition") <= 1
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_minhash_md5_recall_and_est_bounds(spark):
    """Planted near-dups must surface through the md5 band join, and
    the estimate must be monotone-ish with true Jaccard: identical
    docs estimate 1.0, disjoint docs never pair."""
    from sparkflow_spark.dedup import minhash_md5_band_pairs

    base = " ".join(f"tok{i}" for i in range(40))
    near = " ".join(f"tok{i}" for i in range(38)) + " other words"
    other = " ".join(f"zzz{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, near), (4, other)],
        "doc_id long, text string",
    )
    rows = {
        (r["id_a"], r["id_b"]): r["est"]
        for r in minhash_md5_band_pairs(df, threshold=0.0).collect()
    }
    assert rows[(1, 2)] == 1.0  # identical docs: every permutation min agrees
    assert (1, 4) not in rows and (2, 4) not in rows and (3, 4) not in rows
    assert rows.get((1, 3), 0.0) > 0.0  # near-dup shares most shingle mins


def test_minhash_md5_rejects_bad_band_split(spark):
    import pytest

    from sparkflow_spark.dedup import minhash_md5_band_pairs

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="not divisible"):
        minhash_md5_band_pairs(df, num_hashes=8, bands=3)


def test_event_debounce_hand_case(spark):
    """First fire of each burst kept; repeats inside the 10-min TTL of
    the previous RAW event suppressed; different event types never
    debounce each other."""
    from sparkflow_spark.queries import REGISTRY, load_all

    load_all()
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 10, "click"),
            (2, "2024-01-01 00:05:00", 10, "click"),   # +5m  -> suppressed
            (3, "2024-01-01 00:09:00", 10, "click"),   # +4m after RAW #2 -> suppressed
            (4, "2024-01-01 00:30:00", 10, "click"),   # +21m -> kept
            (5, "2024-01-01 00:05:30", 10, "view"),    # other type -> kept
            (6, "2024-01-01 00:05:00", 11, "click"),   # other user -> kept
        ],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.to_timestamp("ts"))
    import pyspark.sql.functions as FF
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    g = df.select(
        "event_type",
        (FF.unix_micros("ts") - FF.unix_micros(FF.lag("ts").over(w))).alias("gap_us"),
    )
    ttl = 600_000_000
    out = {
        r["event_type"]: (r["n_kept"], r["n_suppressed"])
        for r in g.groupBy("event_type")
        .agg(
            FF.sum(
                FF.when(FF.col("gap_us").isNull() | (FF.col("gap_us") >= ttl), 1).otherwise(0)
            ).alias("n_kept"),
            FF.sum(FF.when(FF.col("gap_us") < ttl, 1).otherwise(0)).alias("n_suppressed"),
        )
        .collect()
    }
    assert out["click"] == (3, 2)  # events 1,4,6 kept; 2,3 suppressed
    assert out["view"] == (1, 0)


def test_quantize_int8_roundtrip_error_bound(spark):
    """Dequantized q*scale must sit within scale/2 of the original
    component (the rounding bound), q in [-127,127], and the zero
    vector must survive with scale 1.0."""
    import numpy as np

    vecs = [
        (1, [0.5, -1.0, 0.25, 0.0]),
        (2, [100.0, -3.5, 0.0, 0.0001]),
        (3, [0.0, 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    arr = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    maxabs = F.array_max(F.transform(arr, F.abs))
    scale = F.when(maxabs.isNull() | (maxabs == 0), F.lit(1.0)).otherwise(maxabs / F.lit(127.0))
    out = df.select(
        "vec_id",
        "embedding",
        scale.alias("scale"),
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") / scale + F.lit(0.5)).cast("int"),
        ).alias("q"),
    ).collect()
    for r in out:
        s = r["scale"]
        for orig, q in zip(r["embedding"], r["q"]):
            assert -127 <= q <= 127
            assert abs(q * s - float(orig)) <= s / 2 + 1e-12
    assert next(r for r in out if r["vec_id"] == 3)["scale"] == 1.0


def test_simhash_md5_sign_convention_and_duplicates(spark):
    """Identical texts share a signature; the signature is invariant to
    token ORDER (bag-of-words weighting) and depends only on counts."""
    from sparkflow_spark.queries import REGISTRY, load_all

    load_all()
    import pyspark.sql.functions as FF
    from pyspark.sql import Window

    from sparkflow_spark.functions.text import with_tokens

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "delta gamma beta alpha"),   # same bag -> same sig
            (3, "alpha alpha beta"),          # different counts
        ],
        "doc_id long, text string",
    )
    tc = (
        with_tokens(df)
        .select("doc_id", FF.explode("_toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(FF.count(FF.lit(1)).alias("c"))
        .withColumn("_h", FF.md5("tok"))
    )
    nib = tc.select(
        "doc_id", "c",
        *[(FF.expr(f"instr('0123456789abcdef', substr(_h, {k+1}, 1))") - FF.lit(1)).alias(f"n{k}") for k in range(4)],
    )
    sums = nib.groupBy("doc_id").agg(
        *[FF.sum(FF.col("c") * (FF.shiftright(FF.col(f"n{j//4}"), 3 - j % 4).bitwiseAND(FF.lit(1)) * FF.lit(2) - FF.lit(1))).alias(f"s{j}") for j in range(16)]
    )
    sig = sum(FF.when(FF.col(f"s{j}") >= 0, FF.lit(1 << j)).otherwise(FF.lit(0)) for j in range(16))
    out = {r["doc_id"]: r["sig"] for r in sums.select("doc_id", sig.alias("sig")).collect()}
    assert out[1] == out[2]
    assert 0 <= out[1] < (1 << 16)


def test_tfidf_cosine_weighting_and_cap(spark):
    """Frequency weighting separates TF-IDF cosine from set Jaccard:
    a doc repeating a rare shared phrase scores higher against the
    repeat-heavy twin than against the single-mention one; terms above
    the df cap contribute nothing."""
    from sparkflow_spark.dedup import tfidf_cosine_pairs

    rare = "quantum entangled widget"
    filler = ["altpha bravo", "charlie delta", "echo foxtrot", "golf hotel"]
    docs = [
        (1, f"{rare} {rare} {rare} common one common two"),
        (2, f"{rare} {rare} {rare} common one common two"),   # identical -> cos 1.0
        (3, f"{rare} {filler[0]} {filler[1]} unique threeish"),
        (4, f"{filler[2]} {filler[3]} nothing shared here at all"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in tfidf_cosine_pairs(df, threshold=0.0, max_df=3).collect()
    }
    assert out[(1, 2)] == 1.0
    assert out.get((1, 3), 0.0) < out[(1, 2)]
    assert (1, 4) not in out and (2, 4) not in out
    # cap: with max_df=1 every shared term is dropped -> no pairs at all
    assert tfidf_cosine_pairs(df, threshold=0.0, min_df=2, max_df=1).count() == 0


def test_heavy_hitters_mg_guarantee_many_keys(spark):
    """With key cardinality far above the sketch capacity, every true
    heavy hitter (count > n/k) must surface with its EXACT count, and
    nothing below threshold may appear."""
    import random

    from sparkflow_spark.operators import heavy_hitters

    rng = random.Random(7)
    rows = []
    # 3 planted heavies on a long tail of ~500 distinct keys
    for i in range(3000):
        rows.append((i, f"hot{i % 3}"))
    for i in range(3000):
        rows.append((10_000 + i, f"tail{rng.randrange(500)}"))
    df = spark.createDataFrame(rows, "id long, key string").repartition(8)
    out = {r["key"]: r["cnt"] for r in heavy_hitters(df, "key", k=5).collect()}
    # n=6000, threshold n/5=1200; each hot key has exactly 1000 -> NOT heavy
    assert out == {}
    out = {r["key"]: r["cnt"] for r in heavy_hitters(df, "key", k=10).collect()}
    # threshold 600: the three hot keys (1000 each) qualify, tails (~12) never
    assert out == {"hot0": 1000, "hot1": 1000, "hot2": 1000}


def test_heavy_hitters_mg_rejects_k1(spark):
    import pytest

    from sparkflow_spark.operators import heavy_hitters

    df = spark.createDataFrame([(1, "a")], "id long, key string")
    with pytest.raises(ValueError, match="k must be"):
        heavy_hitters(df, "key", k=1)


def test_dq_audit_single_scan_and_injected_violations(spark, sf_dir):
    """All seven rules ride ONE scan; injected bad rows are counted by
    the right rule."""
    from sparkflow_spark.queries import REGISTRY, load_all

    load_all()
    q = REGISTRY["q103_dq_audit"]
    plan = (
        q.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("FileScan parquet") + plan.count("Scan parquet") <= 2  # AQE may print twice

    import pyspark.sql.functions as FF

    from sparkflow_spark.queries.pipeline_suite import _DQ_RULES

    bad = spark.createDataFrame(
        [
            (None, 1, 1, 1, -2.0, 100.0, 0.05, 0.0, "A", "O", "1996-06-01"),  # null key + bad qty
            (2, 1, 1, 1, 10.0, -5.0, 0.5, -0.1, "X", "O", "1995-06-01"),      # price/discount/tax/enum/stale
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate string",
    ).withColumn("l_shipdate", FF.to_timestamp("l_shipdate"))
    counts = {
        name: bad.filter(FF.expr(cond)).count() for name, cond in _DQ_RULES
    }
    assert counts == {
        "null_key": 1,
        "qty_out_of_range": 1,
        "discount_out_of_range": 1,
        "tax_negative": 1,
        "returnflag_not_in_enum": 1,
        "price_nonpositive": 1,
        "shipdate_stale_pre_1996": 1,
    }


def test_global_rank_matches_single_window_and_avoids_it(spark):
    """global_rank must equal row_number over the naive global window
    on a total order, while its plan contains no empty-PARTITION BY
    window over the ranked data (the per-partition window partitions by
    _pid; the only global window runs over the |partitions|-row offset
    table)."""
    import pyspark.sql.functions as FF
    from pyspark.sql import Window

    from sparkflow_spark.operators import global_rank

    df = spark.range(0, 5000).select(
        (FF.col("id") % 97).alias("v"), FF.col("id").alias("k")
    ).repartition(16)
    got = global_rank(df, ["v", "k"], rank_col="r")
    naive = df.withColumn("r", FF.row_number().over(Window.orderBy("v", "k")))
    assert got.select("v", "k", "r").exceptAll(naive.select("v", "k", "r")).count() == 0
    assert naive.select("v", "k", "r").exceptAll(got.select("v", "k", "r")).count() == 0
    # ranks are a permutation of 1..n
    assert got.agg(FF.min("r"), FF.max("r"), FF.count_distinct("r")).collect()[0] == (1, 5000, 5000)


def test_global_rank_rejects_empty_order(spark):
    import pytest

    from sparkflow_spark.operators import global_rank

    with pytest.raises(ValueError, match="non-empty"):
        global_rank(spark.range(3), [])


def test_grouped_global_rank_matches_partitioned_window(spark):
    """group_cols mode must equal row_number OVER (PARTITION BY g
    ORDER BY ...) even when one group dominates (the low-cardinality
    regime the operator exists for)."""
    import pyspark.sql.functions as FF
    from pyspark.sql import Window

    from sparkflow_spark.operators import global_rank

    df = spark.range(0, 4000).select(
        FF.when(FF.col("id") % 10 < 8, "hot").otherwise(FF.concat(FF.lit("g"), (FF.col("id") % 3).cast("string"))).alias("g"),
        (FF.col("id") % 53).alias("v"),
        FF.col("id").alias("k"),
    ).repartition(16)
    got = global_rank(df, ["v", "k"], rank_col="r", group_cols=["g"])
    naive = df.withColumn("r", FF.row_number().over(Window.partitionBy("g").orderBy("v", "k")))
    assert got.select("g", "v", "k", "r").exceptAll(naive.select("g", "v", "k", "r")).count() == 0
    assert naive.select("g", "v", "k", "r").exceptAll(got.select("g", "v", "k", "r")).count() == 0


def test_join_key_skew_matches_python(spark, sf_dir):
    """q104's one-row skew report equals a direct python computation of
    the same statistics on the same key column."""
    import math
    from collections import Counter

    from sparkflow_spark.queries import REGISTRY, load_all

    load_all()
    row = REGISTRY["q104_join_key_skew"].fn(spark, sf_dir).collect()[0]

    keys = [
        r["o_custkey"]
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_custkey")
        .collect()
    ]
    c = Counter(keys)
    n, k = float(len(keys)), float(len(c))
    mean = n / k
    h = -sum((v / n) * math.log(v / n) for v in c.values())
    assert row["n_rows"] == len(keys)
    assert row["n_keys"] == len(c)
    assert row["max_freq"] == max(c.values())
    assert abs(row["skew_ratio"] - max(c.values()) / mean) < 1e-3
    assert row["hot_keys"] == sum(1 for v in c.values() if v > 2.0 * mean)
    assert abs(row["entropy_norm"] - h / math.log(k)) < 1e-5
    assert 0.0 <= row["entropy_norm"] <= 1.0 and row["skew_ratio"] >= 1.0


def test_spearman_matches_python(spark, sf_dir):
    """q105's per-group rho equals a direct average-rank Spearman
    computed in python (scipy-style tie handling) on the same rows."""
    from collections import defaultdict

    from sparkflow_spark.queries import REGISTRY, load_all

    load_all()
    out = {
        r["l_returnflag"]: (r["n"], r["spearman_rho"])
        for r in REGISTRY["q105_spearman_corr"].fn(spark, sf_dir).collect()
    }

    rows = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .collect()
    )
    groups = defaultdict(list)
    for r in rows:
        groups[r["l_returnflag"]].append((r["l_quantity"], r["l_extendedprice"]))

    def avg_ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            r = (i + j) / 2.0 + 1.0
            for t in range(i, j + 1):
                ranks[order[t]] = r
            i = j + 1
        return ranks

    def pearson(xs, ys):
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
        sxx = sum((x - mx) ** 2 for x in xs)
        syy = sum((y - my) ** 2 for y in ys)
        return sxy / (sxx * syy) ** 0.5

    for g, pairs in groups.items():
        rq = avg_ranks([p[0] for p in pairs])
        rp = avg_ranks([p[1] for p in pairs])
        n, rho = out[g]
        assert n == len(pairs)
        assert abs(rho - pearson(rq, rp)) < 1e-5, g


def test_negative_pairs_properties(spark, sf_dir):
    """Cyclic-shift negative sampling: exactly k=2 distinct negatives
    per anchor, never self-paired, and — the derangement property —
    every doc serves as a negative exactly k times."""
    from collections import Counter

    from sparkflow_spark.queries import REGISTRY, load_all

    load_all()
    rows = REGISTRY["p_negative_pairs"].fn(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    assert len(rows) == 2 * n_docs
    per_anchor = Counter(r["anchor_id"] for r in rows)
    assert set(per_anchor.values()) == {2}
    for r in rows:
        assert r["neg_id"] != r["anchor_id"]
    negs: dict[int, set[int]] = {}
    for r in rows:
        negs.setdefault(r["anchor_id"], set()).add(r["neg_id"])
    assert all(len(s) == 2 for s in negs.values())
    as_negative = Counter(r["neg_id"] for r in rows)
    assert set(as_negative.values()) == {2}


def test_rolling_zscore_matches_python(spark, sf_dir):
    """q106's flagged anomalies equal a direct trailing-window z-score
    computed in python over the same (ts, event_id) order."""
    import statistics
    from collections import defaultdict

    from sparkflow_spark.queries import REGISTRY, load_all

    load_all()
    got = {
        (r["user_id"], r["event_id"]): r["zscore"]
        for r in REGISTRY["q106_rolling_zscore"].fn(spark, sf_dir).collect()
    }

    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "event_id", "ts", "value")
        .collect()
    )
    series = defaultdict(list)
    for r in sorted(rows, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        series[r["user_id"]].append((r["event_id"], r["value"]))

    expected = {}
    for uid, evs in series.items():
        for i, (eid, v) in enumerate(evs):
            frame = [x[1] for x in evs[max(0, i - 19): i + 1]]
            if len(frame) < 10:
                continue
            sd = statistics.stdev(frame)
            if sd <= 0:
                continue
            z = (v - statistics.fmean(frame)) / sd
            if abs(z) > 2.0:
                expected[(uid, eid)] = z
    assert set(got) == set(expected)
    for k, z in expected.items():
        assert abs(got[k] - z) < 1e-3, k


def test_link_prediction_matches_python(spark, sf_dir):
    """g_link_prediction's jaccard scores equal a direct python
    common-neighbor computation on the same edge set (hub cap + min
    common + non-edge filter included)."""
    from collections import defaultdict
    from itertools import combinations

    import pyspark.sql.functions as FF

    from sparkflow_spark.operators import frequent_item_pairs
    from sparkflow_spark.queries import REGISTRY, load_all

    load_all()
    got = {
        (r["node_a"], r["node_b"]): (r["common"], r["degree_a"], r["degree_b"])
        for r in REGISTRY["g_link_prediction"].fn(spark, sf_dir).collect()
    }

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    edges = {
        (min(r["item_a"], r["item_b"]), max(r["item_a"], r["item_b"]))
        for r in frequent_item_pairs(
            li.select(FF.col("l_orderkey").alias("basket"), FF.col("l_partkey").alias("item")),
            "basket", "item", min_support=2, max_basket=1000,
        ).select("item_a", "item_b").collect()
    }
    nbrs = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    expected = {}
    # wedges through non-hub centers only (degree cap 50)
    pair_common = defaultdict(int)
    for z, ns in nbrs.items():
        if len(ns) > 50:
            continue
        for x, y in combinations(sorted(ns), 2):
            pair_common[(x, y)] += 1
    for (x, y), c in pair_common.items():
        if c >= 2 and (x, y) not in edges:
            expected[(x, y)] = (c, len(nbrs[x]), len(nbrs[y]))
    assert got == expected


def test_sorted_neighborhood_window_and_verify(spark, sf_dir):
    """SNM blocking properties: every emitted pair is within the rank
    window of the sort order AND passes the jaccard threshold; planted
    near-identical docs (whitespace-normalized twins) are found."""
    from sparkflow_spark.queries import REGISTRY, load_all

    load_all()
    pairs = REGISTRY["d_sorted_neighborhood_pairs"].fn(spark, sf_dir).collect()
    assert pairs, "fixture plants duplicate docs; SNM must surface some"
    for r in pairs:
        assert r["doc_a"] < r["doc_b"]
        assert r["jaccard"] >= 0.4

    # rank-window property: recompute the sort order and check distance
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    def key(text):
        toks = [x for x in text.strip().lower().split() if x]
        return " ".join(toks[:3])
    order = sorted(((key(d["text"]), d["doc_id"]) for d in docs))
    rank = {doc_id: i for i, (_, doc_id) in enumerate(order)}
    for r in pairs:
        assert abs(rank[r["doc_a"]] - rank[r["doc_b"]]) <= 5, r


def test_hard_negative_is_nearest_other_label(spark, sf_dir):
    """Every mined hard negative has a different label than its anchor
    and is the true cosine-nearest among other-label vectors (numpy
    argmax parity on a sample of anchors)."""
    import numpy as np

    from sparkflow_spark.queries import REGISTRY, load_all

    load_all()
    rows = REGISTRY["s_hard_negative_top1"].fn(spark, sf_dir).collect()
    emb = {
        r["vec_id"]: (np.array(r["embedding"], dtype=np.float64), r["label"])
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    assert len(rows) == sum(
        1 for _, lbl in emb.values()
        if any(l2 != lbl for _, l2 in emb.values())
    )
    by_anchor = {r["anchor_id"]: r for r in rows}
    for aid in sorted(by_anchor)[:25]:
        r = by_anchor[aid]
        assert r["neg_label"] != r["anchor_label"]
        av, albl = emb[aid]
        best = None
        for vid, (bv, blbl) in emb.items():
            if vid == aid or blbl == albl or blbl is None or albl is None:
                continue
            cos = float(av @ bv / (np.linalg.norm(av) * np.linalg.norm(bv)))
            cand = (-cos, vid)
            if best is None or cand < best:
                best = cand
        assert r["hard_neg_id"] == best[1], (aid, r["hard_neg_id"], best)


def test_mmr_rerank_matches_python_greedy(spark, sf_dir):
    """s_mmr_rerank equals an exact python greedy MMR over the same
    top-20 candidate pools (lambda=0.7, ties by ascending vec_id)."""
    import numpy as np

    from sparkflow_spark.queries import REGISTRY, load_all

    load_all()
    got = [
        (r["probe_id"], r["mmr_rank"], r["vec_id"], r["mmr_score"])
        for r in REGISTRY["s_mmr_rerank"].fn(spark, sf_dir).collect()
    ]

    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    probes = sorted(emb)[:10]

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na == 0 or nb == 0:
            return 0.0
        return float(a @ b / (na * nb))

    expected = []
    for pid in probes:
        pool = sorted(
            ((cos(emb[pid], emb[v]), v) for v in emb if v != pid),
            key=lambda t: (-t[0], t[1]),
        )[:20]
        rel = {v: c for c, v in pool}
        cand = sorted(rel)
        picked = []
        for rank in range(5):
            best = None
            for v in cand:
                if v in picked:
                    continue
                div = max((cos(emb[v], emb[u]) for u in picked), default=0.0)
                score = 0.7 * rel[v] - 0.3 * div
                if best is None or score > best[0]:
                    best = (score, v)
            picked.append(best[1])
            expected.append((pid, rank + 1, best[1], best[0]))

    assert len(got) == len(expected)
    for g, e in zip(sorted(got), sorted(expected)):
        assert g[:3] == e[:3], (g, e)
        assert abs(g[3] - e[3]) < 1e-9


def test_mmr_diversifies_vs_plain_topk(spark, sf_dir):
    """With lambda<1 the MMR top-5 must not simply equal the plain
    cosine top-5 for every probe on a corpus with planted near-dups
    (if it did, the diversity term would be dead code)."""
    from sparkflow_spark.queries import REGISTRY, load_all

    load_all()
    mmr = REGISTRY["s_mmr_rerank"].fn(spark, sf_dir)
    plain = REGISTRY["s_brute_force_top1"].fn(spark, sf_dir)
    mmr_top = {
        (r["probe_id"], r["mmr_rank"]): r["vec_id"] for r in mmr.collect()
    }
    # rank-1 MMR pick IS the plain top-1 (empty picked set -> pure relevance)
    for r in plain.collect():
        assert mmr_top[(r["probe_id"], 1)] == r["vec_id"]


def test_bpe_encode_matches_python_reference(spark, sf_dir):
    """t_bpe_encode's per-doc BPE token counts equal a pure-python BPE
    encoder applying the same learned merges in rank order."""
    from sparkflow_spark.bpe import learn_bpe_merges
    from sparkflow_spark.queries import REGISTRY, load_all

    load_all()
    got = {
        r["doc_id"]: (r["n_bpe_tokens"], r["n_symbols"])
        for r in REGISTRY["t_bpe_encode"].fn(spark, sf_dir).collect()
    }

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    merges = [
        (m[0], m[1])
        for m in learn_bpe_merges(
            spark.read.parquet(f"{sf_dir}/documents.parquet"), n_merges=8
        )
    ]

    def encode(word):
        syms = list(word)
        for a, b in merges:
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    for d in docs:
        toks = [w for w in d["text"].strip().lower().split() if w]
        n_bpe = sum(len(encode(w)) for w in toks)
        n_sym = sum(len(w) for w in toks)
        assert got[d["doc_id"]] == (n_bpe, n_sym), d["doc_id"]
