"""Feed-forward classifier in a Spark ML Pipeline — the new engine's
version of the reference's examples/simple_dnn.py (which trained on the
MNIST CSV; that blob is stripped from the reference repo, so this uses
a deterministic synthetic two-Gaussians dataset of the same shape as
the reference's test fixture, reference tests/dl_runner.py:90-95).

Run: python examples/simple_dnn.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.ml import Pipeline
from pyspark.ml.evaluation import BinaryClassificationEvaluator
from pyspark.ml.feature import VectorAssembler

from sparkflow_spark.ml import DistributedDL, build_network
from sparkflow_spark.session import build_session


def main():
    spark = build_session(app_name="simple_dnn_example", master="local[4]")
    rng = np.random.default_rng(42)
    rows = [(1.0, *map(float, rng.normal(0, 1, 10))) for _ in range(400)]
    rows += [(0.0, *map(float, rng.normal(2, 1, 10))) for _ in range(400)]
    cols = ["label"] + [f"f{i}" for i in range(10)]
    df = spark.createDataFrame(rows, cols)

    pipeline = Pipeline(
        stages=[
            VectorAssembler(inputCols=cols[1:], outputCol="features"),
            DistributedDL(
                inputCol="features",
                labelCol="label",
                predictionCol="predicted",
                networkSpec=build_network([10, 16, 1], activations=["tanh", "sigmoid"], loss="bce"),
                tfOptimizer="adam",
                tfLearningRate=0.05,
                iters=4,
                localIters=40,
                miniBatchSize=64,
                partitions=4,
                verbose=True,
            ),
        ]
    )
    model = pipeline.fit(df)
    scored = model.transform(df)
    auc = BinaryClassificationEvaluator(
        rawPredictionCol="predicted", labelCol="label", metricName="areaUnderROC"
    ).evaluate(scored)
    print(f"AUC: {auc:.4f}")
    scored.select("label", "predicted").show(5)
    spark.stop()


if __name__ == "__main__":
    main()
