"""Unsupervised autoencoder — the new engine's version of the
reference's examples/autoencoder_example.py.

Run: python examples/autoencoder.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from sparkflow_spark.ml import DistributedDL, build_network
from sparkflow_spark.session import build_session


def main():
    spark = build_session(app_name="autoencoder_example", master="local[4]")
    rng = np.random.default_rng(7)
    df = spark.createDataFrame(
        [(rng.uniform(0, 1, 8).tolist(),) for _ in range(500)], ["features"]
    )
    est = DistributedDL(
        inputCol="features",
        predictionCol="reconstructed",
        networkSpec=build_network([8, 3, 8], activations=["tanh", "linear"], loss="mse"),
        unsupervised=True,
        tfOptimizer="adam",
        tfLearningRate=0.05,
        iters=4,
        localIters=60,
        partitions=4,
        verbose=True,
    )
    model = est.fit(df)
    model.transform(df).select("reconstructed").show(3, truncate=80)
    spark.stop()


if __name__ == "__main__":
    main()
