"""Round-14 OPTIMIZATION pins.

Hardens the round-13 machinery against silent decay (r13 verdict asks
#5/#6/#7): fan_out must actually repartition a small frame (it rides
``_jdf`` internals — a Spark upgrade that breaks the probe would turn
every similarity-family fan-out into a universal no-op and re-serialize
those stages); dot_seq must pick up a data-derived layout dim via the
catalog probe; connected_components must not mutate session-global
shuffle width.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_fan_out_repartitions_small_input(spark, sf_dir):
    """A small parquet-backed frame must gain partitions through
    fan_out. If the ``_jdf`` stats probe ever breaks (Spark-internal
    drift), fan_out degrades to identity and this fails loudly instead
    of the similarity family silently losing its scoring parallelism."""
    from sparkflow_spark.catalog import cached_table, fan_out

    df = cached_table(spark, sf_dir, "embeddings")
    before = df.rdd.getNumPartitions()
    cores = spark.sparkContext.defaultParallelism
    fanned = fan_out(df)
    after = fanned.rdd.getNumPartitions()
    assert after >= cores, (
        f"fan_out returned {after} partitions (input {before}, cores "
        f"{cores}) — the scale-adaptive guard should spread a "
        "fixture-sized input across all cores"
    )
    # and it must stay a pure repartition: same rows
    assert fanned.count() == df.count()


def test_fan_out_noop_on_large_stats(spark):
    """The scale guard: a frame whose optimizer stats exceed one scan
    split per core must come back UNCHANGED (no exchange added on the
    100 TB path)."""
    from sparkflow_spark.catalog import fan_out

    big = spark.range(0, 1_000_000).select(
        F.col("id"), F.concat(F.lit("x" * 400), F.col("id").cast("string")).alias("pad")
    )
    # range+project carries precise stats (~400 MB here) >> cores * maxPartitionBytes?
    # If the session's split size makes this "small", the assert below
    # still holds semantically: we only require that a LARGE-stats frame
    # is returned as the same object.
    from sparkflow_spark.catalog import plan_size_bytes

    size = plan_size_bytes(big)
    split_raw = str(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    )
    split = int(split_raw) if split_raw.strip().isdigit() else 128 << 20
    cores = spark.sparkContext.defaultParallelism
    if size is not None and size >= cores * split:
        assert fan_out(big) is big


def test_dot_seq_registered_dim_unrolls(spark):
    """r13 verdict ask #5: a layout dim registered from data must take
    the codegen'd unrolled chain — the plan shows no interpreted
    ``aggregate(zip_with(...))`` for a 32-dim frame once 32 is
    registered — and stay bit-identical to the fold."""
    from sparkflow_spark.functions import vector as V

    rows = [
        ([0.1 * i for i in range(32)], [0.7 - 0.01 * i for i in range(32)]),
        ([1e16] + [1.0] * 30 + [-1e16], [1.0] * 32),  # order-sensitive
        ([-0.0] * 32, [5.0] * 32),  # signed-zero chain
        ([1.0] * 32, [None] * 31 + [1.0]),  # null element → NULL
    ]
    df = spark.createDataFrame(rows, "a array<double>, b array<double>")

    saved = V._UNROLL_DIMS
    try:
        V.register_unroll_dim(32)
        assert 32 in V._UNROLL_DIMS
        sel = df.select(V.dot_seq("a", "b").alias("fast"), V.dot("a", "b").alias("ref"))
        # parity (bitwise)
        for r in sel.collect():
            assert (r["ref"] is None) == (r["fast"] is None), r
            if r["ref"] is not None:
                assert repr(r["ref"]) == repr(r["fast"]), r
        # the 32-dim unrolled branch exists in the expression tree: the
        # plan's element_at count grows by exactly 2·32 over the seeded
        # (64, 16) layout (the interpreted fold stays as the OTHERWISE
        # arm for unlisted shapes — never evaluated for 32-dim rows)
        plan = sel._jdf.queryExecution().optimizedPlan().toString()
        base = df.select(
            V.dot_seq("a", "b", unroll_dims=(64, 16)).alias("fast"),
            V.dot("a", "b").alias("ref"),
        )
        base_plan = base._jdf.queryExecution().optimizedPlan().toString()
        assert plan.count("element_at") == base_plan.count("element_at") + 2 * 32
    finally:
        V._UNROLL_DIMS = saved


def test_register_unroll_dim_bounds():
    from sparkflow_spark.functions import vector as V

    saved = V._UNROLL_DIMS
    try:
        V._UNROLL_DIMS = (64, 16)
        V.register_unroll_dim(0)  # out of range
        V.register_unroll_dim(-3)
        V.register_unroll_dim(10_000)  # above cap — codegen blowup guard
        V.register_unroll_dim(64)  # idempotent
        assert V._UNROLL_DIMS == (64, 16)
        V.register_unroll_dim(32)
        assert V._UNROLL_DIMS == (64, 16, 32)
        V.register_unroll_dim(32)
        assert V._UNROLL_DIMS == (64, 16, 32)
    finally:
        V._UNROLL_DIMS = saved


def test_embedding_dim_probe_registers_unroll_dim(spark, sf_dir):
    from sparkflow_spark.catalog import embedding_dim
    from sparkflow_spark.functions import vector as V

    d = embedding_dim(spark, sf_dir)
    assert d in V._UNROLL_DIMS


def test_connected_components_leaves_session_width_alone(spark):
    """r13 verdict ask #6: the loop must narrow ITS OWN exchanges, not
    the session's shuffle width (a set-then-restore races concurrent
    queries on a shared session)."""
    from sparkflow_spark.dedup import connected_components

    before = spark.conf.get("spark.sql.shuffle.partitions")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22)], "id_a int, id_b int"
    )
    out = {
        (r["node"], r["component"])
        for r in connected_components(pairs).collect()
    }
    assert out == {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
