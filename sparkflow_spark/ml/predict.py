"""Framework-agnostic batch inference — serve ANY model in a pipeline.

The reference's core use case is loading an externally-trained model and
serving it as a pipeline stage (reference tensorflow_model_loader.py:8-45:
``load_tensorflow_model`` restores a TF checkpoint, wraps it as a
``SparkAsyncDLModel``, and ``attach_tensorflow_model_to_pipeline``
appends it to an existing PipelineModel). ``ml/loader.py`` covers the
engine's OWN numpy-spec artifacts; this module is the hook for a model
from an ARBITRARY framework (Torch, TF, sklearn, onnxruntime, …): the
user supplies a ``make_predict_fn`` factory, and inference runs through
PySpark's own :func:`pyspark.ml.functions.predict_batch_udf` — Arrow
batch transfer, numpy in/out, and the model loaded ONCE per Python
worker and cached across batches (the factory runs on the executor, so
a 10 GB checkpoint is opened n_workers times, never per row or per
batch, and never on the driver).

Why a dotted-path string instead of a function object: the stage is a
persistable ``Transformer`` (DefaultParams read/write, so a fitted
PipelineModel containing it saves and loads like any other), and a
pickled closure would break cross-version/cross-process reloads. The
factory must therefore be importable on executors —
``"my_pkg.serving:make_fn"`` — which is also what keeps checkpoint
loading lazy: the heavy artifact path travels as a plain string param
and is only opened inside the worker.

At 100 TB this is scan-bound embarrassing parallelism: no shuffle, the
scan's column pruning still applies (only ``inputCol`` reaches Python),
and throughput is governed by ``batchSize`` (Arrow rows per predict
call — size it to the model's optimal batch, e.g. GPU memory).

No real DL framework ships in this sandbox, so the shipped demo backend
(:mod:`sparkflow_spark.ml.stub_backend`) is a numpy "framework" with the
same operating shape: a factory that loads a weight artifact from disk
and returns a batch-predict closure.
"""

from __future__ import annotations

import importlib
import json

from pyspark import keyword_only
from pyspark.ml import Transformer
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.ml.param.shared import HasInputCol, HasOutputCol
from pyspark.ml.util import DefaultParamsReadable, DefaultParamsWritable
from pyspark.sql import DataFrame
import pyspark.sql.functions as F
import pyspark.sql.types as T


def resolve_factory(path: str):
    """``"pkg.module:callable"`` → the callable. Import errors propagate
    loudly (a typo'd path must fail at plan time on the driver, not
    half-way through a 100 TB scan on an executor)."""
    mod_name, sep, fn_name = path.partition(":")
    if not sep or not mod_name or not fn_name:
        raise ValueError(
            f"fnFactory must be 'module.path:callable', got {path!r}"
        )
    fn = getattr(importlib.import_module(mod_name), fn_name)
    if not callable(fn):
        raise TypeError(f"{path!r} resolved to non-callable {fn!r}")
    return fn


class PredictWith(
    Transformer, HasInputCol, HasOutputCol, DefaultParamsWritable, DefaultParamsReadable
):
    """Transformer appending ``outputCol`` = model(``inputCol``) via
    ``predict_batch_udf`` — the framework-agnostic serving stage.

    Params (all plain strings/ints → DefaultParams persistence works):

    - ``fnFactory``: dotted path ``"module:callable"``; the callable is
      invoked as ``factory(**json.loads(fnFactoryArgs))`` ON THE
      EXECUTOR and must return ``predict(inputs: np.ndarray) ->
      np.ndarray`` (one call per Arrow batch).
    - ``fnFactoryArgs``: JSON object of keyword args (checkpoint path,
      device, …) — the indirection that lets one factory serve many
      artifacts.
    - ``returnTypeDDL``: DDL string for the prediction column
      (``"double"``, ``"array<float>"``, …).
    - ``batchSize``: rows per predict call.
    """

    fnFactory = Param(
        Params._dummy(),
        "fnFactory",
        "dotted path 'module:callable' to the make_predict_fn factory",
        typeConverter=TypeConverters.toString,
    )
    fnFactoryArgs = Param(
        Params._dummy(),
        "fnFactoryArgs",
        "JSON kwargs dict passed to the factory on the executor",
        typeConverter=TypeConverters.toString,
    )
    returnTypeDDL = Param(
        Params._dummy(),
        "returnTypeDDL",
        "DDL type of the prediction column",
        typeConverter=TypeConverters.toString,
    )
    batchSize = Param(
        Params._dummy(),
        "batchSize",
        "rows per predict-fn call",
        typeConverter=TypeConverters.toInt,
    )
    inputTensorShape = Param(
        Params._dummy(),
        "inputTensorShape",
        "JSON shape list for an array-typed inputCol (predict_batch_udf "
        "treats array columns as tensors and requires the shape, e.g. "
        "'[64]'); empty string for scalar columns",
        typeConverter=TypeConverters.toString,
    )

    @keyword_only
    def __init__(
        self,
        inputCol: str = "features",
        outputCol: str = "predicted",
        fnFactory: str = "",
        fnFactoryArgs: str = "{}",
        returnTypeDDL: str = "double",
        batchSize: int = 1024,
        inputTensorShape: str = "",
    ):
        super().__init__()
        self._setDefault(
            inputCol="features",
            outputCol="predicted",
            fnFactory="",
            fnFactoryArgs="{}",
            returnTypeDDL="double",
            batchSize=1024,
            inputTensorShape="",
        )
        self._set(**self._input_kwargs)

    def _transform(self, dataset: DataFrame) -> DataFrame:
        from pyspark.ml.functions import predict_batch_udf

        factory_path = self.getOrDefault(self.fnFactory)
        kwargs_json = self.getOrDefault(self.fnFactoryArgs)
        resolve_factory(factory_path)  # fail fast on the driver
        json.loads(kwargs_json)
        ret_type = T._parse_datatype_string(self.getOrDefault(self.returnTypeDDL))

        def make_fn():
            # runs on the executor: import + construct once per python
            # worker; predict_batch_udf caches the result across batches
            return resolve_factory(factory_path)(**json.loads(kwargs_json))

        shape_json = self.getOrDefault(self.inputTensorShape)
        shapes = [json.loads(shape_json)] if shape_json else None
        udf = predict_batch_udf(
            make_fn,
            return_type=ret_type,
            batch_size=self.getOrDefault(self.batchSize),
            input_tensor_shapes=shapes,
        )
        return dataset.withColumn(
            self.getOrDefault(self.outputCol), udf(F.col(self.getOrDefault(self.inputCol)))
        )


def predict_with(
    df: DataFrame,
    fn_factory: str,
    return_type: str = "double",
    input_col: str = "features",
    output_col: str = "predicted",
    batch_size: int = 1024,
    input_tensor_shape: list[int] | None = None,
    **factory_kwargs,
) -> DataFrame:
    """Functional form: ``predict_with(df, "my_pkg.serving:make_fn",
    input_tensor_shape=[64], checkpoint="/models/m.npz")``.

    An array-typed ``input_col`` is a TENSOR column to
    ``predict_batch_udf`` and needs its concrete per-row shape (the
    Arrow batch arrives flattened and is reshaped to
    ``(batch, *shape)``) — fail at plan time with instructions rather
    than mid-scan on an executor."""
    if input_tensor_shape is None and isinstance(
        df.schema[input_col].dataType, T.ArrayType
    ):
        raise ValueError(
            f"input column {input_col!r} is array-typed: pass "
            "input_tensor_shape=[dim] (predict_batch_udf reshapes the "
            "flattened Arrow batch to (batch, *shape))"
        )
    stage = PredictWith(
        inputCol=input_col,
        outputCol=output_col,
        fnFactory=fn_factory,
        fnFactoryArgs=json.dumps(factory_kwargs),
        returnTypeDDL=return_type,
        batchSize=batch_size,
        inputTensorShape=json.dumps(input_tensor_shape) if input_tensor_shape else "",
    )
    return stage.transform(df)


def attach_predict_stage(pipeline_model, stage: PredictWith):
    """Compose an existing PipelineModel with a serving stage — the
    load→attach flow of reference tensorflow_model_loader.py:35-45."""
    from pyspark.ml import PipelineModel

    return PipelineModel(stages=[pipeline_model, stage])
