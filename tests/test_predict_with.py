"""t1 tests for the framework-agnostic inference hook (r6 verdict
missing #1): PredictWith / predict_with over the numpy stub backend —
exact predictions, per-worker model caching, pipeline persistence with
the serving stage aboard, and loud failure on a bad factory path."""

from __future__ import annotations

import json

import numpy as np
import pyspark.sql.functions as F
import pytest


def _checkpoint(tmp_path, d=4, k=1):
    rng = np.random.default_rng(5)
    W = rng.standard_normal((d, k))
    b = rng.standard_normal(k)
    p = str(tmp_path / "model.npz")
    np.savez(p, W=W, b=b)
    return p, W, b


def test_predict_with_exact_affine(spark, tmp_path):
    from sparkflow_spark.ml.predict import predict_with

    ckpt, W, b = _checkpoint(tmp_path)
    rows = [(i, [float(i), float(i + 1), 0.5, -1.0]) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, features array<double>")
    out = predict_with(
        df,
        "sparkflow_spark.ml.stub_backend:make_affine_predict_fn",
        return_type="double",
        input_tensor_shape=[4],
        checkpoint=ckpt,
    )
    got = {r["id"]: r["predicted"] for r in out.collect()}
    for i, feats in rows:
        exp = float(np.asarray(feats) @ W[:, 0] + b[0])
        assert got[i] == pytest.approx(exp, rel=1e-12)


def test_predict_with_vector_output(spark, tmp_path):
    from sparkflow_spark.ml.predict import predict_with

    ckpt, W, b = _checkpoint(tmp_path, d=3, k=2)
    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0]), (1, [0.0, -1.0, 0.5])],
        "id long, features array<double>",
    )
    out = predict_with(
        df,
        "sparkflow_spark.ml.stub_backend:make_affine_predict_fn",
        return_type="array<double>",
        input_tensor_shape=[3],
        checkpoint=ckpt,
    )
    assert dict(out.dtypes)["predicted"] == "array<double>"
    got = {r["id"]: r["predicted"] for r in out.collect()}
    assert np.allclose(got[0], np.array([1.0, 2.0, 3.0]) @ W + b)


def test_model_loads_once_per_worker_not_per_batch(spark):
    """The factory must run once per python worker (predict_batch_udf's
    cache), never per batch: with batchSize=10 over 1000 rows in ONE
    partition, every row's prediction reports the same load count."""
    from sparkflow_spark.ml.predict import PredictWith

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1000)], "id long, features double"
    ).coalesce(1)
    stage = PredictWith(
        inputCol="features",
        outputCol="predicted",
        fnFactory="sparkflow_spark.ml.stub_backend:make_load_counting_fn",
        returnTypeDDL="double",
        batchSize=10,
    )
    counts = {r["predicted"] for r in stage.transform(df).collect()}
    assert len(counts) == 1, f"factory re-ran mid-partition: {counts}"


def test_pipeline_persistence_with_serving_stage(spark, tmp_path):
    """Save/load a PipelineModel that ends in the serving hook — the
    reference's load→attach flow (tensorflow_model_loader.py:35-45)
    with DefaultParams persistence instead of a pickled closure."""
    from pyspark.ml import PipelineModel
    from pyspark.ml.feature import SQLTransformer

    from sparkflow_spark.ml.predict import PredictWith, attach_predict_stage

    ckpt, W, b = _checkpoint(tmp_path)
    pre = PipelineModel(stages=[SQLTransformer(
        statement="SELECT id, transform(raw, x -> x * 2.0d) AS features FROM __THIS__"
    )])
    stage = PredictWith(
        inputCol="features",
        outputCol="predicted",
        fnFactory="sparkflow_spark.ml.stub_backend:make_affine_predict_fn",
        fnFactoryArgs=json.dumps({"checkpoint": ckpt}),
        returnTypeDDL="double",
        inputTensorShape="[4]",
    )
    pipe = attach_predict_stage(pre, stage)
    path = str(tmp_path / "pipe")
    pipe.save(path)
    loaded = PipelineModel.load(path)

    df = spark.createDataFrame(
        [(0, [1.0, 1.0, 1.0, 1.0]), (1, [0.5, 0.0, -0.5, 2.0])],
        "id long, raw array<double>",
    )
    a = {r["id"]: r["predicted"] for r in pipe.transform(df).collect()}
    c = {r["id"]: r["predicted"] for r in loaded.transform(df).collect()}
    assert a == c
    assert a[0] == pytest.approx(float(np.full(4, 2.0) @ W[:, 0] + b[0]), rel=1e-12)


def test_bad_factory_path_fails_on_driver(spark):
    from sparkflow_spark.ml.predict import PredictWith

    df = spark.createDataFrame([(0, 1.0)], "id long, features double")
    with pytest.raises(ModuleNotFoundError):
        PredictWith(
            fnFactory="no_such_module:make_fn", returnTypeDDL="double"
        ).transform(df)
    with pytest.raises(ValueError, match="module.path:callable"):
        PredictWith(fnFactory="not-a-path", returnTypeDDL="double").transform(df)
