"""Pre-trained model loading + pipeline composition.

Mirrors the reference's ``load_tensorflow_model`` /
``attach_tensorflow_model_to_pipeline`` (reference
tensorflow_model_loader.py:8-45): take a saved model artifact, wrap it as
a pipeline stage, optionally append it to an existing PipelineModel.
"""

from __future__ import annotations

import json

from pyspark.ml import PipelineModel

from sparkflow_spark.ml.estimator import DistributedDLModel


def load_model(
    path: str,
    inputCol: str = "features",
    predictionCol: str = "predicted",
) -> DistributedDLModel:
    """Load a saved :class:`DistributedDLModel` from ``path``.

    Accepts either an ML-persistence directory (written by
    ``model.save(path)``) or a raw JSON artifact file
    ``{"spec": {...}, "weights": [...]}`` — the latter mirrors loading a
    foreign checkpoint (reference tensorflow_model_loader.py:8-32).
    """
    import os

    if os.path.isdir(path):
        model = DistributedDLModel.load(path)
        return model
    with open(path) as f:
        artifact = json.load(f)
    return DistributedDLModel(
        inputCol=inputCol,
        predictionCol=predictionCol,
        networkSpec=json.dumps(artifact["spec"]),
        modelWeights=json.dumps(artifact["weights"]),
    )


def attach_model_to_pipeline(pipeline_model: PipelineModel, model: DistributedDLModel) -> PipelineModel:
    """Compose an existing PipelineModel with a loaded model stage
    (reference tensorflow_model_loader.py:35-45)."""
    return PipelineModel(stages=[pipeline_model, model])
