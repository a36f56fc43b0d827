"""Convolutional classifier in a Spark ML Pipeline — the new engine's
version of the reference's examples/cnn_example.py (conv2d→maxpool→
conv2d→maxpool→dense trained with softmax cross-entropy on MNIST CSV;
that blob is stripped from the reference repo, so this trains on a
deterministic synthetic 8×8 pattern dataset that is conv-separable by
construction). The reference builds a TF1 graph with build_graph
(reference examples/cnn_example.py:10-35); here the same architecture
is declared as a JSON spec and trained by DistributedDL's
partition-local SGD + weighted averaging.

Run: python examples/cnn_pipeline.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.ml import Pipeline, PipelineModel

from sparkflow_spark.ml import DistributedDL
from sparkflow_spark.ml.graph_utils import build_conv_network
from sparkflow_spark.session import build_session


def pattern_images(n_per_class: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    X, y = [], []
    for cls in range(3):
        for _ in range(n_per_class):
            img = rng.normal(0.0, 0.3, size=(8, 8))
            if cls == 0:
                img[:, 0:2] += 2.0  # left stripe
            elif cls == 1:
                img[2:6, 2:6] += 2.0  # center block
            else:
                img[:, 6:8] += 2.0  # right stripe
            X.append(img.ravel())
            y.append(float(cls))
    order = rng.permutation(len(X))
    return np.asarray(X)[order], np.asarray(y)[order]


def main():
    spark = build_session(app_name="cnn_example", master="local[4]")
    X, y = pattern_images(60, seed=11)
    df = spark.createDataFrame(
        [(float(yy), xx.tolist()) for yy, xx in zip(y, X)], ["label", "features"]
    ).repartition(4)

    # reference: conv2d(32,5)+pool → conv2d(64,3)+pool → dense(10);
    # scaled to the 8×8 synthetic task: conv(8,3)+pool → dense(16) → dense(3)
    spark_model = DistributedDL(
        inputCol="features",
        labelCol="label",
        predictionCol="predicted",
        networkSpec=build_conv_network(
            input_shape=[8, 8, 1],
            conv=[{"filters": 8, "kernel": 3, "pool": 2, "activation": "relu"}],
            dense=[16, 3],
            loss="softmax_ce",
            seed=7,
        ),
        tfOptimizer="adam",
        tfLearningRate=0.01,
        miniBatchSize=32,
        iters=4,
        localIters=10,
        partitions=4,
        verbose=True,
        seed=7,
    )

    p = Pipeline(stages=[spark_model]).fit(df)
    rows = p.transform(df).select("label", "predicted").collect()
    acc = sum(int(np.argmax(r["predicted"])) == int(r["label"]) for r in rows) / len(rows)
    print(f"train accuracy: {acc:.3f}")

    out = "/tmp/sparkflow_cnn_pipeline"
    p.write().overwrite().save(out)  # reference: p.save("cnn")
    reloaded = PipelineModel.load(out)
    assert reloaded.transform(df).count() == df.count()
    print(f"pipeline saved + reloaded from {out}")
    spark.stop()


if __name__ == "__main__":
    main()
