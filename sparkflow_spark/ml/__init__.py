"""ML pipeline layer — parity with the reference's public surface
(SURVEY.md §2a), rebuilt Spark-first (§7 M2).

Reference → new engine mapping:

- ``SparkAsyncDL`` (reference tensorflow_async.py:102-321, async HTTP
  parameter server) → :class:`DistributedDL`: per-epoch partition-local
  SGD + weighted model averaging. The averaging pattern is the one the
  reference's dead code gestures at (``calculate_weights``,
  reference ml_util.py:43-51); the per-iteration driver-HTTP hot loop
  (reference HogwildSparkModel.py:57,69) is deliberately NOT rebuilt —
  it does not survive scale (SURVEY.md §4).
- ``SparkAsyncDLModel`` (reference tensorflow_async.py:51-99) →
  :class:`DistributedDLModel`: Arrow-batched pandas_udf inference with
  an explicit output schema (the reference re-inferred schemas from
  returned Rows — a known weakness, SURVEY.md §1).
- ``build_optimizer`` (reference tensorflow_async.py:17-42) →
  :func:`sparkflow_spark.ml.nn.build_optimizer` (same name→factory
  shape, numpy optimizers).
- ``build_graph``/config builders (reference graph_utils.py:6-47) →
  :mod:`sparkflow_spark.ml.graph_utils`.
- ``load_tensorflow_model`` (reference tensorflow_model_loader.py:8-45)
  → :func:`sparkflow_spark.ml.loader.load_model` /
  ``attach_model_to_pipeline``.
- ``PysparkReaderWriter`` dill-in-StopWordsRemover shim (reference
  pipeline_util.py:77-127) → native ``DefaultParamsWritable/Readable``
  (the entire shim disappears, SURVEY.md §3 EP3).
"""

from sparkflow_spark.ml.nn import MLP, ConvNet, build_optimizer, make_network
from sparkflow_spark.ml.estimator import DistributedDL, DistributedDLModel
from sparkflow_spark.ml.loader import load_model, attach_model_to_pipeline
from sparkflow_spark.ml.graph_utils import (
    build_network,
    build_adam_config,
    build_adadelta_config,
    build_adagrad_config,
    build_momentum_config,
    build_rmsprop_config,
    build_gradient_descent,
    build_gradient_descent_config,
    generate_config,
)

__all__ = [
    "MLP",
    "ConvNet",
    "make_network",
    "build_optimizer",
    "DistributedDL",
    "DistributedDLModel",
    "load_model",
    "attach_model_to_pipeline",
    "build_network",
    "build_adam_config",
    "build_adadelta_config",
    "build_adagrad_config",
    "build_momentum_config",
    "build_rmsprop_config",
    "build_gradient_descent",
    "build_gradient_descent_config",
    "generate_config",
]
