"""Composite relational operators Spark lacks as built-ins.

Each is a *composition* of DataFrame primitives (SURVEY.md custom-
operator policy: composition first, Pandas-UDF only when semantics
demand it), so Catalyst still owns the physical plan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    value_cols: list[str],
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for every left row, attach the value columns of the
    matching right row within the same ``by`` group — the most recent
    right.on <= left.on (``direction="backward"``, the default; pandas
    ``merge_asof`` / DuckDB ``ASOF JOIN`` semantics), the next
    right.on >= left.on (``"forward"``), or whichever of the two is
    closer in time (``"nearest"``, ties to the backward match —
    pandas' tie rule). Equality matches in every direction.

    Implementation: tag + union both sides, one window pass per
    direction ordered by (on, side) — side 0 (right) sorts before the
    left row at equal ``on`` so ``last(..., ignorenulls=True)`` carries
    an equal-timestamp right match in both traversals — then filter
    back to left rows. Each right row is carried as ONE struct
    ``(_t, value_cols…)`` per direction, so the timestamp used for the
    nearest |Δt| decision and the attached values always come from the
    same matched right row (a per-column carry would skip past a NULL
    value to an older row — pandas attaches the matched row's NULL).
    ``nearest`` compares |Δt| on an exact integer ordinal —
    ``unix_micros`` for timestamps, ``unix_date`` for dates, ``long``
    for integrals — never a double-cast timestamp: at epoch magnitude
    doubles space ~0.24 µs apart and can flip a near-tie that integer
    µs arithmetic (the oracle's, and pandas') resolves exactly.

    Scale shape: ONE shuffle on the ``by`` key and one sorted pass per
    needed direction (``nearest`` = two sorts over the same exchange) —
    the same cost as a window aggregate, with no range-join blowup and
    no per-group driver logic. Skewed groups fall under AQE like any
    other window partition.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    lcols = left.columns
    tagged_r = right.select(
        *[F.col(c) for c in by],
        F.col(on).alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(
            F.col(on).alias("_t"), *[F.col(c).alias(c) for c in value_cols]
        ).alias("_pack"),
        *[F.lit(None).alias(f"_l_{c}") for c in lcols],
    )
    pack_type = tagged_r.schema["_pack"].dataType
    tagged_l = left.select(
        *[F.col(c) for c in by],
        F.col(on).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(pack_type).alias("_pack"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    unioned = tagged_r.unionByName(tagged_l)
    wb = (
        Window.partitionBy(*by)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*by)
        .orderBy(F.col("_t").desc(), "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pack_b = F.last("_pack", ignorenulls=True).over(wb)
    pack_f = F.last("_pack", ignorenulls=True).over(wf)
    if direction == "backward":
        sel = pack_b
    elif direction == "forward":
        sel = pack_f
    else:  # nearest
        ordinal = _asof_ordinal(right.schema[on].dataType)
        lt = ordinal(F.col("_t"))
        bt = ordinal(pack_b["_t"])
        ft = ordinal(pack_f["_t"])
        choose_back = ft.isNull() | (bt.isNotNull() & ((lt - bt) <= (ft - lt)))
        sel = F.when(choose_back, pack_b).otherwise(pack_f)
    carried = unioned.select(
        "*",
        *[sel[c].alias(f"{c}{suffix}") for c in value_cols],
    )
    return carried.filter(F.col("_side") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        *[F.col(f"{c}{suffix}") for c in value_cols],
    )


def _asof_ordinal(dtype):
    """Exact comparison ordinal for the as-of ``on`` column: integers
    wherever the type allows (timestamps → µs, dates → days, integrals
    → long), double only for genuinely fractional types."""
    import pyspark.sql.types as T

    if isinstance(dtype, T.TimestampType):
        return F.unix_micros
    if isinstance(dtype, T.TimestampNTZType):
        return lambda c: F.unix_micros(c.cast("timestamp"))
    if isinstance(dtype, T.DateType):
        return F.unix_date
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return lambda c: c.cast("long")
    return lambda c: c.cast("double")


def pivot_agg(
    df: DataFrame,
    group_col: str,
    pivot_col: str,
    values: list[str],
    agg: Column,
) -> DataFrame:
    """Pivot with an explicit value list (never let the engine scan for
    distinct pivot values at scale — that is an extra full pass)."""
    return df.groupBy(group_col).pivot(pivot_col, values).agg(agg)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Skew-buster join: spread a hot key across ``salt`` sub-keys.

    The big (skewed) side gets a random salt per row; the small side is
    replicated ``salt``× with every salt value, so each (key, salt)
    bucket holds ~1/salt of the hot key's rows. For ``inner`` and
    ``left`` (big side preserved) the result is identical to a plain
    join — the salt is join-internal. Other join types are REJECTED:
    replication breaks right/full outer (each unmatched small-side row
    would surface ``salt`` times) and inverts semi/anti semantics
    (r2 verdict #4). Prefer AQE skew-join when it fires; salting is the
    explicit tool for when it does not (e.g. pre-AQE stages, or
    aggregations-then-join patterns).
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' (big side preserved); got {how!r}. "
            "Replicating the small side salt× breaks right/full-outer and semi/anti joins."
        )
    salted_big = big.withColumn("_salt", (F.rand(seed) * salt).cast("int"))
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return salted_big.join(salted_small, [on, "_salt"], how).drop("_salt")


def top_k_per_group(
    df: DataFrame, group_cols: list[str], order_by: list[Column], k: int
) -> DataFrame:
    """Per-group top-k via row_number + WindowGroupLimit (each map task
    pre-prunes to k rows per group before the shuffle — see SCALE.md)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return df.withColumn("_rnk", F.row_number().over(w)).filter(F.col("_rnk") <= k).drop("_rnk")


def observe_metrics(df: DataFrame, name: str, *metrics: Column):
    """Attach named aggregate metrics that are computed FOR FREE during
    the next action on ``df`` — no second pass over the data.

    Returns ``(df_with_observation, observation)``; read
    ``observation.get`` after an action runs. This is the idiomatic
    100 TB replacement for the "run the pipeline, then run COUNT/SUM
    validation queries" pattern, which re-scans the input: Spark's
    ``Dataset.observe`` accumulates the metric expressions inside the
    existing job's tasks (constraint: only aggregate expressions over
    the observed plan's output — no distinct, no subqueries).

    Example::

        kept, obs = observe_metrics(clean_docs, "quality",
                                    F.count(F.lit(1)).alias("rows"),
                                    F.sum("n_tok").alias("tokens"))
        kept.write.parquet(out)        # one job
        obs.get                        # {'rows': ..., 'tokens': ...}
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *metrics), obs


def profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Single-pass column profiling → one row per column:
    (column, n_rows, n_nulls, n_distinct, min_d, max_d, mean_d).

    Data-quality triage over a raw 100 TB drop: ONE scan computes every
    per-column metric. All metrics for all columns go into a single
    ``agg`` — Catalyst plans the multi-column COUNT(DISTINCT) set as one
    Expand + two-phase aggregate (partial map-side combine, no
    per-column re-scan) — and the wide 1-row result is unpivoted to the
    tall layout driver-side via ``stack`` (p×7 scalars; free).

    Numeric stats use ``try_cast`` so string columns profile as NULL
    min/max/mean instead of throwing under ANSI mode. ``mean_d`` is
    order-dependent in its last float bits (parallel SUM); consumers
    comparing cross-engine should round.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        d = F.col(c).try_cast("double")
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(d).alias(f"{c}__min"),
            F.max(d).alias(f"{c}__max"),
            F.avg(d).alias(f"{c}__mean"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `{c}__nulls`, `{c}__distinct`, `{c}__min`, `{c}__max`, `{c}__mean`"
        for c in cols
    )
    return wide.selectExpr(
        "__n AS n_rows",
        f"stack({len(cols)}, {stack_args}) AS "
        "(column_name, n_nulls, n_distinct, min_d, max_d, mean_d)",
    ).select("column_name", "n_rows", "n_nulls", "n_distinct", "min_d", "max_d", "mean_d")


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    delete_col: str | None = None,
) -> DataFrame:
    """Batch MERGE (upsert): source rows replace matching target rows on
    ``keys``, unmatched source rows insert, unmatched target rows are
    kept; rows whose ``delete_col`` is true are dropped (MERGE's WHEN
    MATCHED THEN DELETE).

    Formulated as LEFT-ANTI(target, source keys) ∪ source — NOT as a
    full-outer join + per-column coalesce. The anti-join's build side is
    only the source KEY SET (column-pruned), so with a typical
    small-delta source it broadcasts and the 100 TB target never
    shuffles: one map-side filter + union, versus the full-outer form
    shuffling every target byte. Deterministic: requires ``keys`` unique
    within source (duplicate source keys would make MERGE ambiguous;
    Delta/Iceberg raise here too — dedupe upstream).
    """
    cols = target.columns
    live = source.filter(~F.coalesce(F.col(delete_col), F.lit(False))) if delete_col else source
    # the anti-join key set includes DELETE-marked keys: their target
    # rows drop here and their source rows are filtered from `live`,
    # which is exactly WHEN MATCHED THEN DELETE
    kept = target.join(F.broadcast(source.select(*keys).distinct()), keys, "left_anti")
    out = kept.select(*cols).unionByName(live.select(*cols))
    return out


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Batch sessionization: split each user's event stream into
    sessions separated by > ``gap_minutes`` of inactivity →
    (user, session_id, session_start, session_end, n_events).

    One shuffle total: both windows (the lag that marks session
    boundaries and the running sum that numbers them) share the same
    (user) partitioning / (ts) ordering, so Catalyst plans a single
    exchange + sort and evaluates both frames in one Window operator;
    the final per-session rollup reuses the same hash partitioning.
    This is the batch twin of the streaming session window
    (streaming/windows.py session_counts).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col)
    # exact integer microseconds (unix_micros), not a seconds cast:
    # sub-second gaps compare exactly, and the boundary predicate is
    # integer arithmetic — bit-identical across engines/architectures
    prev = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    is_new = (
        F.when(prev.isNull(), 1)
        .when(
            F.unix_micros(F.col(ts_col)) - prev > gap_minutes * 60 * 1_000_000,
            1,
        )
        .otherwise(0)
    )
    with_sid = events.withColumn("_new", is_new).withColumn(
        "session_id", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return with_sid.groupBy(user_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


def gap_fill_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
) -> DataFrame:
    """Regularize a per-key time series onto a dense ``step`` grid and
    forward-fill gaps → (key, grid_ts, value) with no missing ticks.

    Three stages, each shuffle-aligned on the key:
    1. per-key bounds (min/max bucket) — a tiny agg;
    2. grid expansion via ``sequence`` + ``explode`` — generated
       key-locally, so the dense grid never crosses the network;
    3. left join actuals + ``last(value, ignorenulls=True)`` over a
       running frame for the forward fill.
    The bounds agg, the join, and the window all hash-partition on the
    key, so AQE collapses them onto one exchange of the (sparse) input.
    Grid density is bounded per key by (max-min)/step — at 100 TB keep
    ``step`` coarse enough that rows-per-key stays in the millions, or
    pre-split hot keys by range.
    """
    unit = {"1 minute": "minute", "1 hour": "hour", "1 day": "day"}.get(step)
    if unit is None:
        raise ValueError(f"step must be one of '1 minute'/'1 hour'/'1 day'; got {step!r}")
    bucket = F.date_trunc(unit, F.col(ts_col))
    actual = df.groupBy(F.col(key_col), bucket.alias("_grid_ts")).agg(
        F.sum(value_col).alias("_v")
    )
    bounds = actual.groupBy(key_col).agg(
        F.min("_grid_ts").alias("_mn"), F.max("_grid_ts").alias("_mx")
    )
    grid = bounds.select(
        key_col,
        F.explode(F.expr(f"sequence(_mn, _mx, interval {step})")).alias("_grid_ts"),
    )
    joined = grid.join(actual, [key_col, "_grid_ts"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("_grid_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        F.col(key_col),
        F.col("_grid_ts").alias("grid_ts"),
        F.last("_v", ignorenulls=True).over(w).alias(value_col),
    )


def merge_agg_states(
    states: list[DataFrame],
    keys: list[str],
    sum_cols: list[str],
    count_col: str | None = None,
) -> DataFrame:
    """Incremental aggregate maintenance: combine partial aggregate
    states (e.g. yesterday's persisted rollup + today's delta rollup)
    into the up-to-date rollup WITHOUT rescanning history.

    Works for algebraic aggregates — each ``sum_cols`` entry and the
    optional ``count_col`` merge by summation, and avg/variance derive
    from (sum, count, sum-of-squares) columns the caller carries. At
    100 TB this is the difference between an O(delta) daily job and an
    O(history) one; correctness (merge-of-partials == full recompute)
    is pinned by the q63 oracle query.
    """
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    cols = sum_cols + ([count_col] if count_col else [])
    return merged.groupBy(*keys).agg(*[F.sum(c).alias(c) for c in cols])


def frequent_item_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket: int | None = None,
) -> DataFrame:
    """Market-basket mining: item pairs co-occurring in at least
    ``min_support`` baskets, with association confidence both ways →
    (item_a, item_b, pair_count, count_a, count_b, conf_a_b, conf_b_a),
    item_a < item_b.

    The A-Priori candidate space for PAIRS needs no tree structure: each
    basket contributes C(|basket|,2) pairs, so the kernel collects the
    DISTINCT items of a basket into one bounded array and expands pairs
    with the same slice/transform HOF the dedup kernels use — work is
    Σ C(b_i, 2), linear in baskets when basket size is bounded. Item
    supports come from the same pre-pair stage (one extra map-side-
    combined agg) and join back onto the (already min_support-filtered,
    hence small) pair table via broadcast-eligible joins.

    ``max_basket`` is the skew guard: a basket larger than the cap
    raises at execution time (raise_error rides the expansion — a
    pathological mega-basket at 100 TB would otherwise expand
    quadratically inside one row). None disables the check.
    """
    b = F.col(basket_col)
    items = (
        df.select(b.alias("_basket"), F.col(item_col).alias("_item"))
        .where(F.col("_item").isNotNull() & F.col("_basket").isNotNull())
        .distinct()
    )
    supports = items.groupBy("_item").agg(F.count(F.lit(1)).alias("_support"))
    baskets = items.groupBy("_basket").agg(
        F.array_sort(F.collect_list("_item")).alias("_items")
    )
    arr = F.col("_items")
    # The skew guard rides the SCALAR size expression (raise_error casts
    # cleanly to int; casting it to the array type trips analysis-time
    # type checks), so the slice length itself detonates on a
    # cap-violating basket before any pair is built.
    n = F.size(arr)
    if max_basket is not None:
        n = F.when(
            n > max_basket,
            F.raise_error(
                F.concat(
                    F.lit(
                        f"frequent_item_pairs: basket exceeds max_basket={max_basket} "
                        "items (quadratic pair expansion guard): "
                    ),
                    F.col("_basket").cast("string"),
                )
            ).cast("int"),
        ).otherwise(n)
    pair = F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + F.lit(2), n),
                lambda y: F.struct(x.alias("item_a"), y.alias("item_b")),
            ),
        )
    )
    pairs = (
        baskets.select(F.explode(pair).alias("_p"))
        .select("_p.item_a", "_p.item_b")
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .filter(F.col("pair_count") >= min_support)
    )
    sa = supports.select(F.col("_item").alias("item_a"), F.col("_support").alias("count_a"))
    sb = supports.select(F.col("_item").alias("item_b"), F.col("_support").alias("count_b"))
    return (
        pairs.join(sa, "item_a")
        .join(sb, "item_b")
        .select(
            "item_a",
            "item_b",
            "pair_count",
            "count_a",
            "count_b",
            (F.col("pair_count") / F.col("count_a")).alias("conf_a_b"),
            (F.col("pair_count") / F.col("count_b")).alias("conf_b_a"),
        )
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    stride: int = 48,
    preserve_case: bool = False,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap →
    (doc_id, chunk_id, n_tokens, chunk_text). The core pre-training /
    RAG chunking op: ``chunk_tokens``-token windows starting every
    ``stride`` tokens (overlap = chunk_tokens - stride), last window
    ragged, empty docs dropped.

    ``preserve_case=False`` (default) LOWERCASES the text before
    tokenizing — chunk_text is case-folded relative to the source
    document (the dedup/normalization posture, and what the registry
    oracle pins). Pass ``preserve_case=True`` for RAG/display chunking
    where the original casing must survive; token boundaries are
    whitespace either way, so chunk counts and offsets are identical
    between the two modes.

    ``carry_cols`` names columns to pass through unchanged onto every
    chunk row (e.g. ``("source",)`` so a downstream per-source packer
    needs no re-join against the document table).

    Spark shape: tokenize once (whitespace split), derive the chunk
    count as a pure expression, ``explode(sequence(...))`` the chunk
    index, then ``slice`` the token array per index — all Catalyst
    expressions, zero Python per row, and the explode multiplies rows
    only by ~n/stride (bounded fan-out, unlike shingle explodes). At
    100 TB the stage is embarrassingly parallel: no shuffle at all
    until a downstream consumer asks for one.
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    text = F.trim(F.col(text_col))
    if not preserve_case:
        text = F.lower(text)
    toks = F.filter(F.split(text, r"\s+"), lambda x: x != "")
    n = F.size(toks)
    base = df.select(
        F.col(id_col).alias("doc_id"),
        *carry_cols,
        toks.alias("_toks"),
        n.alias("_n"),
    ).where(n > 0)
    # windows start at 0, stride, 2*stride, ... while start < n
    nn = F.col("_n")
    n_chunks = F.when(nn <= chunk_tokens, F.lit(1)).otherwise(
        F.ceil((nn - chunk_tokens) / F.lit(stride)).cast("int") + 1
    )
    chunk = F.slice(
        F.col("_toks"), F.col("chunk_id") * stride + 1, F.lit(chunk_tokens)
    )
    return (
        base.withColumn("_n_chunks", n_chunks)
        .select(
            "doc_id",
            *carry_cols,
            "_toks",
            F.explode(F.sequence(F.lit(0), F.col("_n_chunks") - 1)).alias("chunk_id"),
        )
        .select(
            "doc_id",
            *carry_cols,
            "chunk_id",
            F.size(chunk).alias("n_tokens"),
            F.concat_ws(" ", chunk).alias("chunk_text"),
        )
        # gapped sampling (stride > chunk_tokens) can place the last
        # start exactly at n, yielding an empty slice — drop it; for
        # stride <= chunk_tokens the predicate is always true (the last
        # start is provably < n), so the overlap path is unchanged
        .where(F.col("n_tokens") > 0)
    )


def table_diff(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Snapshot reconciliation: classify every key as ``added`` (source
    only), ``removed`` (target only), ``changed`` (both, any compare
    column differs NULL-safely) or drop it when identical → key columns
    + ``diff_kind`` + per-column ``changed_<col>`` flags.

    The CDC-validation twin of :func:`merge_upsert`: run it after a
    MERGE to prove the sink converged, or between two table versions to
    audit drift. Spark shape: one full outer join on the key (the only
    shuffle — both sides hash-partition by key; AQE handles skew), all
    comparisons NULL-safe ``eqNullSafe`` expressions, identical rows
    filtered before anything wide is materialized. At 100 TB the
    output is proportional to the DRIFT, not the table.
    """
    if compare_cols is None:
        compare_cols = [c for c in target.columns if c not in keys]
    if not compare_cols:
        raise ValueError(
            "table_diff needs at least one compare column (all columns are keys); "
            "a keys-only diff is a semi/anti-join question, not a change audit"
        )
    # explicit presence markers, NOT key-column nullity: the join below
    # deliberately matches NULL keys via eqNullSafe, so a row whose key
    # IS NULL would otherwise read as "absent" on its own side and be
    # misclassified (NULL-key row only in target → 'added' instead of
    # 'removed'; identical NULL-key rows in both → 'added' instead of
    # dropped). Markers are added BEFORE the alias so t.<col> refs hold.
    t = target.select(
        *keys, *compare_cols, F.lit(True).alias("_t_present")
    ).alias("t")
    s = source.select(
        *keys, *compare_cols, F.lit(True).alias("_s_present")
    ).alias("s")
    cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys]
    j = t.join(s, cond, "full_outer")
    t_present = F.col("t._t_present").isNotNull()
    s_present = F.col("s._s_present").isNotNull()
    changed_flags = [
        (~F.col(f"t.{c}").eqNullSafe(F.col(f"s.{c}"))).alias(f"changed_{c}")
        for c in compare_cols
    ]
    any_changed = None
    for c in compare_cols:
        e = ~F.col(f"t.{c}").eqNullSafe(F.col(f"s.{c}"))
        any_changed = e if any_changed is None else (any_changed | e)
    kind = (
        F.when(~t_present, F.lit("added"))
        .when(~s_present, F.lit("removed"))
        .when(any_changed, F.lit("changed"))
    )
    key_cols = [F.coalesce(F.col(f"s.{k}"), F.col(f"t.{k}")).alias(k) for k in keys]
    return (
        j.select(*key_cols, kind.alias("diff_kind"), *changed_flags)
        .where(F.col("diff_kind").isNotNull())
    )


def scd2_from_changes(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Build a slowly-changing-dimension type-2 history from a change
    log → (key, attr value, valid_from, valid_to, is_current): one row
    per distinct consecutive attribute value per key, valid until the
    next change (NULL valid_to = current).

    Spark shape: one window partitioned by key ordered by event time —
    ``lag`` detects value changes (NULL-safe so NULL attributes chain
    correctly), a filter keeps change rows only, then ``lead`` on the
    surviving rows closes each interval. Both windows share the same
    partitioning, so the whole op is ONE exchange; at 100 TB it scales
    with per-key history length, never with key count.
    """
    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    changed = F.when(
        F.lag(attr_col).over(w).eqNullSafe(F.col(attr_col))
        & (F.row_number().over(w) > 1),
        F.lit(False),
    ).otherwise(F.lit(True))
    ch = df.select(
        key_col, attr_col, *order, changed.alias("_is_change")
    ).where(F.col("_is_change"))
    w2 = Window.partitionBy(key_col).orderBy(*order)
    return ch.select(
        key_col,
        attr_col,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    )


def sample_k_per_group(
    df: DataFrame,
    group_col: str,
    k: int,
    key_cols: list[str],
    seed: int = 42,
    weight_col: str | None = None,
) -> DataFrame:
    """Exact-k deterministic sample per group (distributed reservoir-
    sampling equivalent): keeps exactly min(k, |group|) rows of every
    group, reproducibly for a given ``seed``.

    Instead of stateful reservoir streams (sequential by construction),
    each row gets a rank key derived from ``xxhash64(key_cols, seed)``
    — uniform in expectation — and one per-group window keeps the k
    smallest. Weighted mode implements Efraimidis–Spirakis A-ES: rank
    by ``-ln(u)/w`` so inclusion probability is proportional to weight;
    rows with NULL or non-positive weight are excluded (standard A-ES
    domain). One shuffle (the group window); no RNG state, so the
    sample is stable under retries, task re-execution, AND cluster
    resizing — properties per-partition ``rand()`` cannot give, and the
    reason this formulation is the 100 TB-safe one.

    Determinism contract: ``key_cols`` must uniquely identify rows.
    Ties (duplicate key tuples or hash collisions) are broken by
    ``key_cols`` order, so only rows IDENTICAL in every key column
    remain interchangeable at the k-th slot.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    if not key_cols:
        # an empty key would hash the constant seed for every row →
        # all rank keys tie → row_number order is partition-layout
        # dependent, silently breaking the determinism contract
        raise ValueError("key_cols must be non-empty (the determinism source)")
    h = F.xxhash64(*[F.col(c) for c in key_cols], F.lit(seed))
    # map int64 hash → u ∈ (0,1): shift to unsigned range, add ½ ulp so
    # u is never exactly 0 (ln(0) = -inf) or 1
    m = float(1 << 64)
    u = (h.cast("double") + F.lit(float(1 << 63)) + F.lit(0.5)) / F.lit(m)
    if weight_col is None:
        rank_key = u
        src = df
    else:
        w = F.col(weight_col).cast("double")
        rank_key = -F.log(u) / w
        src = df.where(w.isNotNull() & (w > 0))
    # key_cols as tie-breakers after _rk: when key_cols tuples repeat
    # (duplicate rows) or xxhash64 collides, tied _rk values would make
    # row_number partition-layout dependent — the determinism contract
    # would break SILENTLY across retries/resizes. With the tie-break,
    # determinism degrades only for rows that are FULLY identical in
    # (key_cols) — document: key_cols should uniquely identify rows for
    # a fully deterministic sample; exact duplicates tie and either may
    # win the k-th slot (they are interchangeable rows anyway unless
    # non-key columns differ).
    win = Window.partitionBy(group_col).orderBy(
        F.col("_rk").asc(), *[F.col(c) for c in key_cols]
    )
    return (
        src.withColumn("_rk", rank_key)
        .withColumn("_rn", F.row_number().over(win))
        .where(F.col("_rn") <= k)
        .drop("_rk", "_rn")
    )


def md5_uniform(col: Column, salt: str) -> Column:
    """Uniform variate in [0, 1) derived from md5(col || salt) — the
    engine-independent "randomness" primitive: md5 is bit-identical in
    every engine (the DuckDB twin is
    ``('0x'||substr(md5(x||salt),1,8))::UBIGINT / 2^32``), so anything
    built on it (splits, samples, DP noise, experiment assignment) is
    reproducible across engines, retries, and cluster layouts. NULL
    input → NULL variate (callers decide the NULL policy). One shared
    definition: widening the hex slice or changing the salt scheme must
    happen HERE or the cross-engine contract silently forks."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(col.cast("string"), F.lit(salt))), 1, 8),
            16,
            10,
        ).cast("bigint")
        / F.lit(4294967296.0)
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic dataset split (train/test/val) by content hash:
    each row's split is a pure function of (id, seed) — stable under
    retries, cluster resizing, re-runs on different engines, and
    incremental data arrival (a row keeps its split when the corpus
    grows: the property that prevents train/test leakage across
    pipeline versions, which rand()-based splits silently violate).

    The uniform variate is the first 8 hex chars of md5(id || ':' ||
    seed) mapped to [0, 1) — md5 exists bit-identically in every
    engine, so the SAME SQL reproduces the split anywhere (the DuckDB
    oracle literally re-derives it). Fractions must sum to ≤ 1; any
    remainder falls into the last split.
    """
    if not fractions or any(f < 0 for f in fractions.values()):
        raise ValueError("fractions must be a non-empty dict of non-negatives")
    if sum(fractions.values()) > 1.0 + 1e-9:
        raise ValueError("fractions must sum to <= 1")
    # NULL id → NULL split (explicit), not a silent fall-through to the
    # last bucket: md5(NULL) is NULL so u is NULL, every `u < cum` is
    # UNKNOWN, and the otherwise() branch would swallow the row
    u = md5_uniform(F.col(id_col), f":{seed}")
    names = list(fractions)
    expr = None
    cum = 0.0
    for name in names[:-1]:
        # round the cumulative fraction so the engine evaluates the same
        # literal the SQL oracle writes (0.8+0.1 in float is
        # 0.9000000000000001; a cut landing on the ulp boundary would
        # otherwise assign a row differently cross-engine)
        cum = round(cum + fractions[name], 12)
        cond = u < F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    expr = F.when(F.col(id_col).isNotNull(), expr)
    return df.withColumn(split_col, expr)


def table_checksum(df: DataFrame, cols: list[str]) -> DataFrame:
    """Order-independent content checksum → one row (n_rows, checksum):
    SUM over all rows of a 32-bit md5 slice of the canonicalized column
    tuple, accumulated in DECIMAL(38,0) so it never overflows or loses
    exactness. Replication / migration validation: compute on both
    sides of a copy (any engine that has md5 — the DuckDB oracle
    re-derives it bit-for-bit) and compare two scalars instead of
    re-reading either table twice.

    Canonical form (INJECTIVE — round-6 advice fix): each column CAST
    to string and encoded as ``<charlen>:<value>``, or the bare token
    ``N`` for NULL, fields joined with '|'. The length prefix makes the
    row encoding unambiguous even when values contain '|' or ':' (the
    parse is forced to consume exactly ``charlen`` characters), and
    ``N`` cannot collide with any value encoding (values always carry a
    length prefix) — the previous '<NULL>'-sentinel/bare-join form let
    ('a|b','c') and ('a','b|c') checksum equal. Floating-point columns
    remain the caller's responsibility (engines format doubles
    differently — round and cast to DECIMAL/string first); the
    checksum contract is for int/string/date/decimal columns.

    DuckDB twin of the encoding (oracle parity, q79_table_checksums):
    ``CASE WHEN x IS NULL THEN 'N' ELSE length(CAST(x AS VARCHAR)) ||
    ':' || CAST(x AS VARCHAR) END``.

    Commutative+associative accumulation means partial aggregation is
    map-side and the whole check is ONE scan with a 1-row result,
    whatever the table size or row order.
    """
    if not cols:
        raise ValueError("table_checksum needs at least one column")

    def enc(c: str) -> Column:
        s = F.col(c).cast("string")
        return F.when(s.isNull(), F.lit("N")).otherwise(
            F.concat(F.length(s).cast("string"), F.lit(":"), s)
        )

    canon = F.concat_ws("|", *[enc(c) for c in cols])
    h = F.conv(F.substring(F.md5(canon), 1, 8), 16, 10).cast("decimal(38,0)")
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(h).cast("decimal(38,0)").alias("checksum"),
    )


def assert_schema(df: DataFrame, expected_ddl: str, allow_extra: bool = False) -> DataFrame:
    """Schema contract gate: raise ``ValueError`` (naming every
    violation) unless ``df`` matches the DDL — same names, same types,
    same order-insensitive set; ``allow_extra`` tolerates additional
    columns (the additive-evolution posture).

    Put it at pipeline boundaries: an upstream producer changing a
    column type surfaces HERE with a readable diff, not three jobs
    later as a codegen ClassCastException. Plan-time only — no job
    runs.
    """
    import pyspark.sql.types as T

    expected = T.StructType.fromDDL(expected_ddl)
    exp = {f.name: f.dataType.simpleString() for f in expected.fields}
    got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    problems = []
    # dict-keying collapses duplicates — a join can legally produce two
    # same-named columns, which must FAIL the contract, not slip past it
    names = [f.name for f in df.schema.fields]
    for n in sorted({n for n in names if names.count(n) > 1}):
        problems.append(f"duplicate column {n!r} ({names.count(n)}x)")
    for name, dt in exp.items():
        if name not in got:
            problems.append(f"missing column {name!r} ({dt})")
        elif got[name] != dt:
            problems.append(f"column {name!r}: expected {dt}, got {got[name]}")
    if not allow_extra:
        for name in got:
            if name not in exp:
                problems.append(f"unexpected column {name!r} ({got[name]})")
    if problems:
        raise ValueError("schema contract violated: " + "; ".join(problems))
    return df


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact heavy hitters — every key with count > n/k — found with
    bounded memory via a two-pass Misra-Gries sketch.

    Why not just groupBy-count-filter? That shuffles ONE ROW PER
    DISTINCT KEY; at 100 TB with billions of keys the aggregate state
    itself is the bottleneck. Misra-Gries (the classic streaming
    FREQUENT algorithm) keeps at most k-1 counters per partition and
    guarantees every key with true count > n/k survives the sweep —
    so pass 1 produces ≤ (k-1)·partitions candidates regardless of key
    cardinality, and pass 2 recounts ONLY those candidates exactly
    (hash-join against a broadcast candidate set + one tiny groupBy).
    The output is therefore EXACT — the sketch bounds memory, it never
    decides membership — which is what makes this verifiable against
    any engine's plain GROUP BY.

    Pass 1 is an Arrow-batched ``mapInPandas`` (per-partition Python
    dict of ≤ k-1 counters); pass 2 is pure Catalyst. Returns
    (key_col, cnt) for keys with cnt > n/k.

    NULL keys are excluded by construction (the recount semi-join is
    null-rejecting, matching GROUP BY's treatment of NULL as a group
    the HAVING filter would usually drop anyway) — filter upstream if a
    NULL-heavy column should itself be flagged.
    """
    import pandas as pd

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    cap = k - 1

    def mg(batches):
        # Counters key on a string rendering (stable, hashable for any
        # type), but each counter ALSO keeps one original value per key
        # — the candidate frame emits the ORIGINAL values in the
        # column's own type, so no string→type cast ever happens on the
        # recount path (a string round-trip is not value-preserving for
        # float/timestamp/decimal keys and would silently drop
        # candidates despite the EXACT output contract).
        #
        # r13 (guide §4.2): vectorized MG-summary MERGE instead of a
        # per-ROW interpreted loop. Each Arrow batch is counted exactly
        # (value_counts — an MG summary with zero error), merged into
        # the running counters by addition, then shrunk back to ≤ cap
        # entries by subtracting the (cap+1)-th largest count from all
        # and dropping the non-positive — the standard mergeable-
        # summaries operation (Agarwal et al., PODS'12), which keeps
        # the total undercount ≤ n/k, so every true-heavy key still
        # survives the sweep. Candidate SETS can differ from the
        # row-at-a-time sweep's; the exact pass-2 recount makes the
        # final output identical either way. Persistent state stays
        # ≤ cap counters; the per-batch count is transient and bounded
        # by the Arrow batch already in memory.
        run = None  # pd.Series: index _k, value running count
        originals = None  # pd.Series: index _k, value original value
        for pdf in batches:
            if not len(pdf):
                continue
            cnts = pdf["_k"].value_counts(sort=False)
            firsts = pdf.drop_duplicates("_k").set_index("_k")[key_col]
            if run is None:
                run, originals = cnts.astype("int64"), firsts
            else:
                run = run.add(cnts, fill_value=0)
                new = firsts[~firsts.index.isin(originals.index)]
                if len(new):
                    originals = pd.concat([originals, new])
            if len(run) > cap:
                t = run.nlargest(cap + 1).iloc[-1]
                run = run[run > t] - t
                originals = originals[originals.index.isin(run.index)]
        if run is not None and len(run):
            yield pd.DataFrame({key_col: originals.loc[run.index].to_numpy()})

    cand_schema = df.select(key_col).schema
    keyed = df.select(
        F.col(key_col), F.col(key_col).cast("string").alias("_k")
    )
    candidates = keyed.mapInPandas(mg, schema=cand_schema).distinct()
    n_total = df.select(F.count(F.lit(1)).alias("_n"))
    return (
        df.join(F.broadcast(candidates), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(n_total))
        .filter(F.col("cnt") * k > F.col("_n"))
        .select(key_col, "cnt")
    )


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    num_partitions: int | None = None,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Exact 1-based rank over a TOTAL order — without the
    single-partition window.

    ``row_number() OVER (ORDER BY ...)`` with no PARTITION BY moves the
    entire table into one task (Spark's WindowExec warns, and at 100 TB
    it simply doesn't run). The same trap hides in PARTITION BY over a
    LOW-CARDINALITY key: five event types = five tasks, however many
    trillion rows. This computes identical ranks with the classic
    two-phase shape every external sorter uses:

    1. ``repartitionByRange`` on (group, order) columns — the range
       exchange Spark already uses for global sorts (sampled
       boundaries, ~equal partitions, ascending ranges in ascending
       partition ids) — so ONE group spreads across MANY partitions;
    2. ``row_number`` within each (group, range-partition) — parallel;
    3. per-(group, partition) counts → running offsets per group (a
       ≤ |groups|·|partitions|-row table, broadcast) added to the
       within-partition number.

    With ``group_cols`` the rank restarts per group (the scale-safe
    ``row_number() OVER (PARTITION BY g ORDER BY ...)``). ``order_cols``
    must complete a total order within each group (add a unique
    tiebreak) — that is what makes the result independent of where the
    sampled range boundaries fall, so equal runs straddling a boundary
    cannot flip ranks between runs or engines.
    """
    if not order_cols:
        raise ValueError("order_cols must be non-empty")
    g = list(group_cols or [])
    n = num_partitions or int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    ranged = df.repartitionByRange(n, *[F.col(c) for c in g + order_cols]).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_in = Window.partitionBy("_pid", *g).orderBy(*order_cols)
    staged = ranged.withColumn("_rn", F.row_number().over(w_in))
    # referenced twice (offset counts + the main join): truncate so the
    # range exchange runs once
    staged = staged.localCheckpoint(eager=False)
    w_off = Window.partitionBy(*g).orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        staged.groupBy("_pid", *g)
        .agg(F.count(F.lit(1)).alias("_c"))
        .withColumn("_off", F.coalesce(F.sum("_c").over(w_off), F.lit(0)))
        .select("_pid", *g, "_off")
    )
    return (
        staged.join(F.broadcast(offsets), ["_pid", *g])
        .withColumn(rank_col, (F.col("_off") + F.col("_rn")).cast("bigint"))
        .drop("_pid", "_rn", "_off")
    )


def stratified_exact_split(
    df: DataFrame,
    id_col: str,
    strata_cols: list[str],
    fractions: dict[str, float],
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic stratified split with EXACT per-stratum counts —
    the companion to :func:`hash_split` when proportions are a
    contract, not an expectation.

    hash_split assigns each row independently (binomial proportions:
    a 25-doc stratum at 0.8 lands anywhere around 20); here each
    stratum is ranked by the md5 variate (ties broken by id — a total
    order, so ranks are engine- and layout-independent) and CUT at
    ``floor(cum_fraction · n)``: every stratum contributes exactly
    ⌊p·n⌋ rows to each split. The trade against hash_split is
    stability under growth: adding rows to a stratum shifts its
    cut points, so rows near a boundary can change split — use
    hash_split when incremental stability matters more than exact
    proportions (the train/test-leakage note there).

    Scale shape: one grouped :func:`global_rank` (range exchange —
    never a per-stratum single task, however hot a stratum) + a
    broadcast per-stratum count table. Fractions must sum to ≤ 1;
    the remainder falls into the last split.
    """
    if not fractions or any(f < 0 for f in fractions.values()):
        raise ValueError("fractions must be a non-empty dict of non-negatives")
    if sum(fractions.values()) > 1.0 + 1e-9:
        raise ValueError("fractions must sum to <= 1")
    u = md5_uniform(F.col(id_col), f":{seed}")
    staged = df.withColumn("_u", u)
    ranked = global_rank(
        staged, ["_u", id_col], rank_col="_srk", group_cols=list(strata_cols)
    )
    counts = staged.groupBy(*strata_cols).agg(F.count(F.lit(1)).alias("_sn"))
    names = list(fractions)
    expr = None
    cum = 0.0
    for name in names[:-1]:
        # round the cumulative fraction so the engine evaluates the same
        # literal the SQL oracle writes (0.8+0.1 in float is
        # 0.9000000000000001; a cut landing on the ulp boundary would
        # otherwise assign a row differently cross-engine)
        cum = round(cum + fractions[name], 12)
        cond = F.col("_srk") <= F.floor(F.lit(cum) * F.col("_sn"))
        expr = (
            F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
        )
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return (
        ranked.join(F.broadcast(counts), list(strata_cols))
        .withColumn(split_col, expr)
        .drop("_u", "_srk", "_sn")
    )


def _guard_bins(
    lo: Column,
    hi: Column,
    bin_width: int,
    max_bins: int | None,
    start_col: str,
    end_col: str,
) -> Column:
    """Wrap a bin-range lower bound so any interval expanding into more
    than ``max_bins`` bins raises AT EXECUTION with the offending span
    named. One dirty row (a sentinel end like 9999-12-31) against a
    small ``bin_width`` otherwise makes F.sequence emit millions of bin
    rows per interval — blowing up the job (or tripping Spark's sequence
    length cap) with no actionable message. ``max_bins=None`` disables
    the guard (the caller vouches for clean spans)."""
    if max_bins is None:
        return lo
    m = int(max_bins)
    if m <= 0:
        raise ValueError(f"max_bins_per_interval must be positive; got {max_bins!r}")
    nbins = hi - lo + F.lit(1)
    msg = F.concat(
        F.lit("interval expands into "),
        nbins.cast("string"),
        F.lit(f" bins (> max_bins_per_interval={m}) at bin_width={bin_width}: "),
        F.lit(f"{start_col}="),
        F.col(start_col).cast("string"),
        F.lit(f" .. {end_col}="),
        F.col(end_col).cast("string"),
        F.lit(" — widen bin_width, raise the cap, or pre-filter dirty spans"),
    )
    # raise_error in the taken branch aborts the task with `msg`; the
    # otherwise-branch keeps the original bound (cast keeps types equal)
    return F.when(nbins > m, F.raise_error(msg).cast("long")).otherwise(lo)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    closed: str = "left",
    salt: int = 1,
    max_bins_per_interval: int | None = None,
) -> DataFrame:
    """Binned range join: every (point, interval) pair with
    start <= point < end (``closed='left'``; ``'both'`` makes the end
    inclusive), as an EQUI-join on a derived bin key.

    A raw inequality join has no equi-key, so Spark plans it as
    BroadcastNestedLoopJoin — O(|points| x |intervals|) compares and a
    driver OOM the moment neither side fits in a broadcast. Binning is
    the standard fix (the same strategy behind Databricks' range-join
    hint): bucket the domain into ``bin_width``-sized bins, replicate
    each interval into the ceil(len/width)+1 bins it covers
    (``sequence`` + ``explode``), map each point to its single bin,
    hash-join on the bin id, then re-check the exact predicate. Each
    qualifying pair meets in exactly one bin (the point's), so the
    output needs no dedup.

    Scale shape: ONE shuffle on the bin key for each side; interval
    replication is O(1) when ``bin_width`` is chosen near the typical
    interval length (too small -> replication grows, too large -> bins
    collect non-matching candidates; either way correctness holds).

    Dense bins (bursty time ranges) need ``salt`` > 1, not AQE: the
    hot bin's join task has SMALL shuffle input but quadratic OUTPUT,
    and AQE's skew split keys off input block size, so the explosion
    serializes in one task (measured: a 10%-mass burst bin grew true
    pairs 2.8x but wall clock 25x — SCALE.md round-7g). Salting splits
    the point side of every bin into ``salt`` deterministic slices
    (content hash) and replicates the interval side per slice, cutting
    the hot task's output by ``salt``x at an interval-replication cost
    that applies to all bins — exactness is unaffected.

    ``point_col``/``start_col``/``end_col`` may be timestamp, date, or
    numeric; the two frames' column names must be disjoint (pre-alias).
    """
    if closed not in ("left", "both"):
        raise ValueError(f"closed must be 'left' or 'both'; got {closed!r}")
    w = int(bin_width)
    if w <= 0:
        raise ValueError(f"bin_width must be a positive integer; got {bin_width!r}")
    s = int(salt)
    if s <= 0:
        raise ValueError(f"salt must be a positive integer; got {salt!r}")
    shared = set(points.columns) & set(intervals.columns)
    if shared:
        raise ValueError(
            f"points/intervals column names must be disjoint; shared: {sorted(shared)}"
        )

    def _as_long(df: DataFrame, c: str) -> Column:
        kind = df.schema[c].dataType.simpleString()
        col = F.col(c)
        if kind == "date":
            col = col.cast("timestamp")
        return col.cast("long")

    p = points.withColumn("_pbin", F.floor(_as_long(points, point_col) / F.lit(w)))
    ilo = F.floor(_as_long(intervals, start_col) / F.lit(w))
    ihi = F.floor(_as_long(intervals, end_col) / F.lit(w))
    ilo = _guard_bins(ilo, ihi, w, max_bins_per_interval, start_col, end_col)
    i = intervals.withColumn("_ibin", F.explode(F.sequence(ilo, ihi)))
    on = [F.col("_pbin") == F.col("_ibin")]
    drop = ["_pbin", "_ibin"]
    if s > 1:
        p = p.withColumn(
            "_psalt", F.pmod(F.hash(*[F.col(c) for c in points.columns]), F.lit(s))
        )
        i = i.withColumn("_isalt", F.explode(F.array(*[F.lit(k) for k in range(s)])))
        on.append(F.col("_psalt") == F.col("_isalt"))
        drop += ["_psalt", "_isalt"]
    upper = (
        F.col(point_col) <= F.col(end_col)
        if closed == "both"
        else F.col(point_col) < F.col(end_col)
    )
    return (
        p.join(i, on[0] if s == 1 else (on[0] & on[1]))
        .where((F.col(point_col) >= F.col(start_col)) & upper)
        .drop(*drop)
    )


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_width: int,
    salt: int = 1,
    max_bins_per_interval: int | None = None,
) -> DataFrame:
    """Interval-overlap join: every (left, right) pair whose half-open
    ranges intersect — ``l.start < r.end AND r.start < l.end`` — via
    the same bin-explosion rewrite as :func:`interval_join`.

    Both sides replicate into the bins they cover, hash-join on the
    bin id, and re-check the exact predicate. An overlapping pair can
    co-occupy MANY bins; instead of a distinct() over the (wide) pair
    output, each pair is claimed exactly once by the bin that contains
    ``greatest(l.start, r.start)`` — the first bin where both are
    present — so the join stays dedup-free (a post-join filter on two
    already-present columns, not an extra shuffle).

    Scale shape: one shuffle per side on the bin key; replication is
    O(interval_len / bin_width). Burst bins (``salt``): see
    interval_join's docstring — the left side splits into ``salt``
    content-hash slices, the right side replicates per slice, and the
    claim rule is untouched (each pair's left slice is fixed, so it
    still meets exactly once). Column names must be disjoint across
    the two frames.
    """
    w = int(bin_width)
    if w <= 0:
        raise ValueError(f"bin_width must be a positive integer; got {bin_width!r}")
    s = int(salt)
    if s <= 0:
        raise ValueError(f"salt must be a positive integer; got {salt!r}")
    shared = set(left.columns) & set(right.columns)
    if shared:
        raise ValueError(
            f"left/right column names must be disjoint; shared: {sorted(shared)}"
        )

    def _as_long(df: DataFrame, c: str) -> Column:
        kind = df.schema[c].dataType.simpleString()
        col = F.col(c)
        if kind == "date":
            col = col.cast("timestamp")
        return col.cast("long")

    llo = F.floor(_as_long(left, left_start) / F.lit(w))
    lhi = F.floor(_as_long(left, left_end) / F.lit(w))
    llo = _guard_bins(llo, lhi, w, max_bins_per_interval, left_start, left_end)
    l = left.withColumn("_lbin", F.explode(F.sequence(llo, lhi))).withColumn(
        "_lsl", _as_long(left, left_start)
    )
    rlo = F.floor(_as_long(right, right_start) / F.lit(w))
    rhi = F.floor(_as_long(right, right_end) / F.lit(w))
    rlo = _guard_bins(rlo, rhi, w, max_bins_per_interval, right_start, right_end)
    r = right.withColumn("_rbin", F.explode(F.sequence(rlo, rhi))).withColumn(
        "_rsl", _as_long(right, right_start)
    )
    cond = F.col("_lbin") == F.col("_rbin")
    drop = ["_lbin", "_rbin", "_lsl", "_rsl"]
    if s > 1:
        l = l.withColumn(
            "_lslt", F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(s))
        )
        r = r.withColumn("_rslt", F.explode(F.array(*[F.lit(k) for k in range(s)])))
        cond = cond & (F.col("_lslt") == F.col("_rslt"))
        drop += ["_lslt", "_rslt"]
    return (
        l.join(r, cond)
        .where(
            (F.col(left_start) < F.col(right_end))
            & (F.col(right_start) < F.col(left_end))
            # claim each pair once: in the bin holding the later start
            & (F.col("_lbin") == F.floor(F.greatest("_lsl", "_rsl") / F.lit(w)))
        )
        .drop(*drop)
    )


def _bloom_positions(col: Column, n_bits: int, k: int) -> Column:
    """k bloom bit positions per value — JVM-side xxhash64 with k seed
    variants over the STRING rendering (type-stable across build/probe
    and across int/string key columns)."""
    s = col.cast("string")
    return F.array(
        *[F.pmod(F.xxhash64(s, F.lit(i)), F.lit(n_bits)) for i in range(k)]
    )


def build_bloom_filter(
    df: DataFrame, on: str, n_bits: int = 1 << 23, k: int = 5
) -> bytes:
    """Build a bloom bitmap over ``df[on]`` distributedly: bit positions
    are computed JVM-side (xxhash64), each partition ORs its positions
    into a local numpy bitmap (one Arrow pass), and the driver ORs the
    per-partition bitmaps — the driver artifact is P × n_bits/8 bytes
    of bitmaps, never the keys. Size ``n_bits`` ≈ 10–20 bits per
    expected distinct key for ~sub-1% false-positive rates at k=5.

    This is the build-once side of :func:`bloom_ingest_membership`; at
    100 TB the corpus pays ONE scan to produce a megabytes-sized
    reusable artifact (persist it next to the table like the IVF
    centroids sidecar).
    """
    import numpy as np
    import pandas as pd

    nb = int(n_bits)
    if nb <= 0 or nb % 8:
        raise ValueError(f"n_bits must be a positive multiple of 8; got {n_bits!r}")

    pos = df.select(F.explode(_bloom_positions(F.col(on), nb, int(k))).alias("p"))

    def bitmaps(batches):
        bm = np.zeros(nb // 8, dtype=np.uint8)
        for pdf in batches:
            p = pdf["p"].to_numpy()
            # |= with duplicate byte indexes drops all but one update —
            # bitwise_or.at is the accumulate-safe form
            np.bitwise_or.at(bm, p >> 3, (1 << (p & 7)).astype(np.uint8))
        yield pd.DataFrame({"bm": [bm.tobytes()]})

    def or_bitmaps(batches):
        bm = np.zeros(nb // 8, dtype=np.uint8)
        seen = False
        for pdf in batches:
            for b in pdf["bm"]:
                bm |= np.frombuffer(b, dtype=np.uint8)
                seen = True
        if seen:
            yield pd.DataFrame({"bm": [bm.tobytes()]})

    # Tree reduce: a scan with thousands of partitions would otherwise
    # ship P × n_bits/8 bytes (~1 MB each at the 2^23 default) to the
    # driver. One repartition of the MB-sized bitmap rows to a fixed
    # fan-in keeps scan parallelism upstream and caps the driver at
    # O(fan_in × bitmap), independent of P.
    fan_in = 32
    parts = (
        pos.mapInPandas(bitmaps, "bm binary")
        .repartition(fan_in)
        .mapInPandas(or_bitmaps, "bm binary")
        .collect()
    )
    import functools

    out = functools.reduce(
        np.bitwise_or,
        (np.frombuffer(r["bm"], dtype=np.uint8) for r in parts),
        np.zeros(nb // 8, dtype=np.uint8),
    )
    return out.tobytes()


def bloom_might_contain(
    spark, bloom: bytes, col: Column, k: int = 5
) -> Column:
    """Boolean membership-MAYBE column: positions JVM-side, bit lookups
    in an Arrow-batched kernel over the broadcast bitmap (no hashing in
    Python — the UDF only tests k bits per row). False positives
    possible, false negatives impossible; pair with an exact verify for
    deterministic results."""
    import numpy as np
    import pandas as pd

    nb = len(bloom) * 8
    bvar = spark.sparkContext.broadcast(np.frombuffer(bloom, dtype=np.uint8))

    @F.pandas_udf("boolean")
    def _hit(pos):
        bm = bvar.value
        if not len(pos):
            return pd.Series([], dtype="bool")
        # r13 (guide §4.2): one vectorized (n, k) gather instead of a
        # per-row Python loop — positions arrive as fixed-width k-arrays
        p = np.vstack(pos.to_numpy()).astype(np.int64, copy=False)
        bits = bm[p >> 3] & (1 << (p & 7)).astype(np.uint8)
        return pd.Series(np.all(bits != 0, axis=1))

    return _hit(_bloom_positions(col, nb, int(k)))


def bloom_ingest_membership(
    spark,
    corpus_keys: DataFrame,
    incoming: DataFrame,
    on: str,
    n_bits: int = 1 << 23,
    k: int = 5,
    bloom: bytes | None = None,
) -> DataFrame:
    """EXACT "which incoming rows carry a key the corpus already has"
    — the ingest-time membership/dedup shape — without ever shuffling
    the corpus per batch.

    Plain semi-join would reshuffle corpus keys on every incoming
    batch. Here: (1) a bloom over corpus keys (built once, reusable
    via ``bloom``) prunes incoming rows to candidates with zero joins;
    (2) the surviving candidate keys — now batch-sized — broadcast
    against the corpus for a scan-only exact verify (semi-join with
    the corpus as probe side, no corpus exchange); (3) verified keys
    broadcast back onto the incoming batch. The bloom cannot drop a
    true member (no false negatives) and the verify removes its false
    positives, so the OUTPUT is exactly the semi-join's — the bloom is
    a pure pruning layer, which keeps this oracle-checkable.
    """
    if bloom is None:
        bloom = build_bloom_filter(corpus_keys, on, n_bits=n_bits, k=k)
    hits = incoming.where(bloom_might_contain(spark, bloom, F.col(on), k=k))
    cand_keys = hits.select(on).distinct()
    verified = (
        corpus_keys.join(F.broadcast(cand_keys), on, "left_semi").select(on).distinct()
    )
    return incoming.join(F.broadcast(verified), on, "inner")
