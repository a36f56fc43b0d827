"""Byte-pair-encoding merge learning as distributed DataFrame jobs.

The t_bpe_pair_counts registry entry checks the STATISTIC the first BPE
merge maximizes; this module runs the actual training loop: repeatedly
find the highest-count adjacent symbol pair and merge it corpus-wide.

Scale design (the reason this is a word-frequency algorithm, not a
corpus-scan algorithm): BPE's working set is the VOCABULARY — the
corpus collapses to (word, freq) once up front (one shuffle over ~|V|
keys, |V| ≪ corpus at 100 TB), and every merge iteration then touches
|V| rows: one weighted pair count (map-side combined) + one argmax
collect (a single row) + one in-place symbol-array rewrite (a fold
expression, no shuffle). Lineage is truncated per iteration, exactly
like the graph fixpoints. n_merges Spark jobs total — the same
driver-coordinated/data-distributed split as graph.pagerank.

Determinism: ties break by (count desc, left asc, right asc), so the
merge sequence is a pure function of the corpus — pinned against a
pure-python reference in tests/test_round6_ops.py.

Reference parity note: the reference engine (lifeomic/sparkflow) has no
tokenizer surface; this comes from the north-star brief's LLM-pipeline
inventory.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from sparkflow_spark.functions.text import lower_tokens


def _codepoint_chars(w):
    """Split a string column into CODE POINTS, not UTF-16 units.
    ``split(w, '(?!$)')`` breaks astral-plane characters (emoji,
    CJK-ext) into two unpaired surrogate halves, silently diverging
    from the pure-python (code-point) reference BPE the tests pin
    (round-6 review finding); ``regexp_extract_all`` matches `.` per
    code point. Also yields [] for the empty string (split yields
    [''])."""
    return F.regexp_extract_all(w, F.lit("(?s)."), F.lit(0))


def _merge_pair_expr(syms, a: str, b: str):
    """Fold the ``syms`` array column left-to-right, replacing
    non-overlapping adjacent (a, b) with a+b — the standard BPE
    application order. ``syms`` may be a named column or a HOF lambda
    variable (apply_bpe_merges folds per word inside a transform); the
    ONE definition serves learn and apply so the merge rule cannot
    drift between them (round-6 review finding)."""
    empty = F.array().cast("array<string>")
    null_s = F.lit(None).cast("string")
    return F.aggregate(
        syms,
        F.struct(empty.alias("out"), null_s.alias("prev")),
        lambda acc, x: F.when(
            acc["prev"].isNull(), F.struct(acc["out"].alias("out"), x.alias("prev"))
        )
        .when(
            (acc["prev"] == F.lit(a)) & (x == F.lit(b)),
            F.struct(
                F.concat(acc["out"], F.array(F.lit(a + b))).alias("out"),
                null_s.alias("prev"),
            ),
        )
        .otherwise(
            F.struct(
                F.concat(acc["out"], F.array(acc["prev"])).alias("out"),
                x.alias("prev"),
            )
        ),
        lambda acc: F.when(acc["prev"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["prev"]))
        ),
    )


def learn_bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    min_pair_count: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn up to ``n_merges`` BPE merges → [(left, right, count), …]
    in merge order. Stops early when the best remaining pair occurs
    fewer than ``min_pair_count`` times (weighted by word frequency).
    """
    vocab = (
        df.select(F.explode(lower_tokens(F.col(text_col))).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(_codepoint_chars(F.col("word")).alias("syms"), "freq")
    )
    # r13: size the checkpointed vocab's partition count from optimizer
    # stats instead of inheriting the session shuffle width — every one
    # of the n_merges iteration jobs re-reads the checkpoint, so a
    # 21k-row vocab spread over 32 partitions paid 8 × 32 task launches
    # for 8 × ~1 MB of work; at real |V| the byte-derived count grows
    # with the data (guide §2.2: fewer, larger partitions)
    from sparkflow_spark.catalog import write_partitions

    n_parts = write_partitions(vocab, per_file_bytes=32 << 20)
    if n_parts is not None:
        vocab = vocab.repartition(n_parts)
    vocab = vocab.localCheckpoint(eager=False)
    merges: list[tuple[str, str, int]] = []
    pair_structs = F.transform(
        F.sequence(F.lit(1), F.size("syms") - 1),
        lambda i: F.struct(
            F.element_at(F.col("syms"), i).alias("a"),
            F.element_at(F.col("syms"), i + 1).alias("b"),
        ),
    )
    for _ in range(n_merges):
        best = (
            vocab.where(F.size("syms") >= 2)
            .select(F.explode(pair_structs).alias("p"), "freq")
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_pair_count:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
        merges.append((a, b, cnt))
        vocab = vocab.select(
            _merge_pair_expr(F.col("syms"), a, b).alias("syms"), "freq"
        ).localCheckpoint(eager=False)
    return merges


def _sql_merge_round(prev: str, best: str, carry: str = "freq") -> str:
    """One DuckDB vocab-rewrite round: apply the round's best (a, b)
    merge to every symbol array with the exact greedy-leftmost
    non-overlapping semantics of :func:`_merge_pair_expr`. For a ≠ b
    adjacent matches can never overlap, so ALL matches merge; for
    a == b a maximal run of a's merges at every other position from
    the run start (parity via the last non-a position before i).
    Validated case-for-case against the python fold (incl. 'aaaa',
    'aaa', run-after-run) before wiring."""
    return f"""(
  SELECT list_filter(
    list_transform(range(1, len(syms) + 1), i ->
      CASE WHEN list_contains(tkn, i) THEN a || b
           WHEN list_contains(tkn, i - 1) THEN NULL
           ELSE syms[i] END), x -> x IS NOT NULL) AS syms, {carry}
  FROM (
    SELECT syms, {carry}, a, b,
      CASE WHEN a != b THEN mt
           ELSE list_filter(mt, i ->
             ((i - COALESCE(list_max(list_filter(range(1, i),
                 j -> syms[j] != a)), 0) - 1) % 2) = 0)
      END AS tkn
    FROM (
      SELECT v.syms, v.{carry}, q.a, q.b,
             list_filter(range(1, len(v.syms)),
                 i -> v.syms[i] = q.a AND v.syms[i+1] = q.b) AS mt
      FROM {prev} v, {best} q)))"""


def learn_oracle_sql(n_merges: int = 8, min_pair_count: int = 2) -> str:
    """DuckDB replay of :func:`learn_bpe_merges` — the full iterative
    trainer unrolled (the X85 k-means / X132 LSH-lifecycle pattern):
    per round, a weighted adjacent-pair count, the (cnt DESC, a, b)
    argmax, and the greedy vocab rewrite. Early stop replays
    structurally: a round whose best count falls below
    ``min_pair_count`` yields an EMPTY b{{r}} row, the cross-joined
    vocab goes empty, and every later round contributes no output row
    — exactly the trainer's break. Output: (merge_rank, left, right,
    pair_count), hash-comparable with t_bpe_learn_merges."""
    parts = [
        """
        WITH w AS (
            SELECT word, COUNT(*) AS freq FROM (
                SELECT unnest(list_filter(
                    string_split_regex(lower(trim(text)), '\\s+'),
                    x -> x != '')) AS word
                FROM documents)
            WHERE length(word) > 0 GROUP BY word),
        v0 AS (SELECT regexp_extract_all(word, '(?s).') AS syms, freq FROM w)"""
    ]
    for r in range(1, n_merges + 1):
        parts.append(
            f""",
        p{r} AS (
            SELECT p.a AS a, p.b AS b, SUM(freq) AS cnt FROM (
                SELECT unnest(list_transform(range(1, len(syms)),
                    i -> {{'a': syms[i], 'b': syms[i+1]}})) AS p, freq
                FROM v{r - 1}) GROUP BY p.a, p.b),
        b{r} AS (SELECT a, b, cnt FROM p{r}
                 WHERE cnt >= {min_pair_count}
                 ORDER BY cnt DESC, a, b LIMIT 1),
        v{r} AS {_sql_merge_round(f"v{r - 1}", f"b{r}")}"""
        )
    union = "\n            UNION ALL ".join(
        f"SELECT CAST({r - 1} AS INT) AS merge_rank, a AS \"left\", "
        f"b AS \"right\", CAST(cnt AS BIGINT) AS pair_count FROM b{r}"
        for r in range(1, n_merges + 1)
    )
    parts.append(f"\n        SELECT * FROM ({union}) ORDER BY merge_rank")
    return "".join(parts)


def encode_oracle_sql(n_merges: int = 8, min_pair_count: int = 2) -> str:
    """DuckDB replay of the learn-then-encode pipeline (t_bpe_encode):
    reuses :func:`learn_oracle_sql`'s CTE chain to re-derive the merge
    table, then applies the same ``n_merges`` greedy rewrites to each
    DISTINCT word (cheaper than per-occurrence, identical result) and
    sums token/symbol counts per document. Early stop replays exactly:
    when a round's b{{r}} is empty (best pair count below
    ``min_pair_count``) the cross-joined rewrite yields no rows, and a
    NOT EXISTS(b{{r}})-guarded pass-through keeps e{{r}} = e{{r-1}} —
    so the replay encodes with precisely the merges the trainer kept,
    at any scale, instead of emptying every later round."""
    learn = learn_oracle_sql(n_merges, min_pair_count)
    # strip the learn oracle's final SELECT — keep its WITH chain
    base = learn[: learn.rindex("\n        SELECT * FROM (")]
    parts = [
        base,
        """,
        dw AS (
            SELECT doc_id, unnest(list_filter(
                string_split_regex(lower(trim(text)), '\\s+'),
                x -> x != '')) AS word
            FROM documents),
        e0 AS (
            SELECT word, regexp_extract_all(word, '(?s).') AS syms
            FROM (SELECT DISTINCT word FROM dw WHERE length(word) > 0))""",
    ]
    for r in range(1, n_merges + 1):
        # fall back to e{r-1} when b{r} is empty (trainer early-stopped):
        # the cross-joined rewrite contributes zero rows then, and the
        # NOT EXISTS pass-through carries the previous state forward so
        # the replay tracks the ACTUAL merge count, not the requested one
        parts.append(
            f""",
        e{r} AS (
          SELECT * FROM {_sql_merge_round(f"e{r - 1}", f"b{r}", carry="word")} _m{r}
          UNION ALL
          SELECT syms, word FROM e{r - 1}
          WHERE NOT EXISTS (SELECT 1 FROM b{r}))"""
        )
    parts.append(
        f"""
        , wsum AS (
            SELECT dw.doc_id,
                   CAST(SUM(len(e.syms)) AS BIGINT) AS n_bpe_tokens,
                   CAST(SUM(length(dw.word)) AS BIGINT) AS n_symbols
            FROM dw JOIN e{n_merges} e USING (word)
            GROUP BY dw.doc_id)
        SELECT d.doc_id,
               COALESCE(s.n_bpe_tokens, 0) AS n_bpe_tokens,
               COALESCE(s.n_symbols, 0) AS n_symbols,
               CASE WHEN s.n_bpe_tokens > 0
                    THEN CAST(ROUND(CAST(s.n_symbols AS DOUBLE)
                                    / s.n_bpe_tokens, 4) AS DOUBLE) + 0.0
               END AS chars_per_token
        FROM documents d LEFT JOIN wsum s USING (doc_id)
        ORDER BY d.doc_id"""
    )
    return "".join(parts)


def apply_bpe_merges(
    df: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge list → ``out_col``
    (array<string> of BPE symbols, document order preserved). Each
    merge is one fold expression over the per-word symbol arrays —
    |merges| chained Catalyst expressions, zero Python, no shuffle; at
    real vocabulary sizes swap in a pandas_udf encoder with a trie, the
    semantics here are the contract."""
    words = F.transform(
        lower_tokens(F.col(text_col)), _codepoint_chars
    )
    out = df.withColumn("_words", words)
    # closure factory, not default-arg capture: F.transform reads the
    # lambda's ARITY to pick the (x) vs (x, i) form, so extra default
    # parameters break it — and the factory pins a/b at build time
    # anyway (expressions are constructed eagerly per loop iteration)
    def _fold(a: str, b: str):
        return lambda syms: _merge_pair_expr(syms, a, b)

    for m in merges:
        out = out.withColumn(
            "_words", F.transform(F.col("_words"), _fold(m[0], m[1]))
        )
    return out.withColumn(out_col, F.flatten(F.col("_words"))).drop("_words")
