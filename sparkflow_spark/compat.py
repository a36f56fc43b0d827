"""Reference-API compatibility shims.

A user of the reference writes (reference README.md:40-76):

    SparkAsyncDL(inputCol='features', tensorflowGraph=mg,
                 tfInput='x:0', tfLabel='y:0', tfOutput='out:0',
                 tfLearningRate=.001, iters=20, ...)

This module keeps those entry-point names and the overlapping
parameters so pipelines port with minimal edits. TF-graph-specific
arguments (tensorflowGraph/tfInput/tfLabel/tfOutput/tfDropout/...)
have no meaning without TF1 and are accepted-and-ignored with a
warning when a ``layers`` spec is given, or raise with a clear message
otherwise — we fail loudly rather than silently train a different
model.

Mapping (reference → here):
- SparkAsyncDL               → DistributedDL            (train)
- SparkAsyncDLModel          → DistributedDLModel       (inference)
- build_optimizer name set   → same 10 names (ml/nn.py)
- build_adam_config etc.     → same helpers (ml/graph_utils.py)
- load_tensorflow_model      → load_model (ml/loader.py)
- attach_tensorflow_model_to_pipeline → attach_model_to_pipeline
- PysparkPipelineWrapper.unwrap → identity (native persistence makes
  the dill/StopWordsRemover shim unnecessary — SURVEY.md §3 EP3)
"""

from __future__ import annotations

import warnings

from sparkflow_spark.ml import DistributedDL, DistributedDLModel
from sparkflow_spark.ml.graph_utils import build_network
from sparkflow_spark.ml.loader import attach_model_to_pipeline, load_model

_TF_ONLY_ARGS = (
    "tensorflowGraph", "tfInput", "tfLabel", "tfOutput", "tfDropout",
    "toKeepDropout", "miniStochasticIters", "acquireLock", "port",
    "partitionShuffles",
)


def SparkAsyncDL(layers=None, activations=None, loss="mse", **kwargs) -> DistributedDL:
    """Reference-named constructor. Provide ``layers`` (+ optional
    ``activations``/``loss``) in place of a TF graph."""
    dropped = [a for a in _TF_ONLY_ARGS if kwargs.pop(a, None) is not None]
    if layers is None:
        raise TypeError(
            "SparkAsyncDL compatibility shim needs `layers=[...]` (a network "
            "spec) — TensorFlow-1 graph arguments "
            f"({', '.join(dropped) or 'tensorflowGraph'}) cannot be executed "
            "in this engine; see sparkflow_spark.ml.graph_utils.build_network"
        )
    if dropped:
        warnings.warn(
            f"SparkAsyncDL shim ignoring TF-1-specific arguments: {dropped}",
            stacklevel=2,
        )
    kwargs.setdefault("shufflePerIter", bool(kwargs.pop("shufflePerIter", False)))
    return DistributedDL(
        networkSpec=build_network(layers, activations=activations, loss=loss), **kwargs
    )


SparkAsyncDLModel = DistributedDLModel
load_tensorflow_model = load_model
attach_tensorflow_model_to_pipeline = attach_model_to_pipeline


class PysparkPipelineWrapper:
    """Reference pipeline_util.py:48-74 equivalent — a no-op: native
    DefaultParams persistence needs no unwrap pass."""

    @staticmethod
    def unwrap(pipeline_model):
        return pipeline_model
