"""ConvNet coverage — closes the reference's one demo with no previous
counterpart (reference examples/cnn_example.py: conv2d→maxpool→conv2d→
maxpool→dense trained with softmax cross-entropy). Bound mirrors the
reference's own loose acceptance (fitted model beats all-wrong,
reference tests/dl_runner.py:85-88) but tightened to a real accuracy
floor since our RNG is seeded."""

from __future__ import annotations

import json

import numpy as np
import pytest

from sparkflow_spark.ml import ConvNet, DistributedDL, MLP, make_network
from sparkflow_spark.ml.graph_utils import build_conv_network

CNN_SPEC = {
    "input_shape": [8, 8, 1],
    "conv": [{"filters": 4, "kernel": 3, "pool": 2, "activation": "relu"}],
    "dense": [3],
    "loss": "softmax_ce",
    "seed": 7,
}


def _pattern_images(n_per_class: int, seed: int = 0):
    """8×8 grayscale images in 3 classes: left stripe / center block /
    right stripe, plus noise — conv-separable by construction."""
    rng = np.random.default_rng(seed)
    X, y = [], []
    for cls in range(3):
        for _ in range(n_per_class):
            img = rng.normal(0.0, 0.3, size=(8, 8))
            if cls == 0:
                img[:, 0:2] += 2.0
            elif cls == 1:
                img[2:6, 2:6] += 2.0
            else:
                img[:, 6:8] += 2.0
            X.append(img.ravel())
            y.append(float(cls))
    order = rng.permutation(len(X))
    return np.asarray(X)[order], np.asarray(y)[order]


def test_convnet_shapes_and_protocol():
    net = make_network(CNN_SPEC)
    assert isinstance(net, ConvNet)
    assert isinstance(make_network({"layers": [2, 2, 1]}), MLP)
    # conv 8x8 →(k3) 6x6 →(pool2) 3x3 ×4 filters = 36 flat → dense 3
    assert net.layers[0] == 64 and net.layers[-1] == 3
    assert net.weights[0].shape == (9, 4)  # k*k*c_in × filters
    assert net.weights[2].shape == (36, 3)
    P = net.forward(np.zeros((5, 64)))
    assert P.shape == (5, 3)
    # weight JSON codec roundtrip (estimator averaging + persistence path)
    clone = ConvNet(CNN_SPEC)
    clone.weights_from_json(net.weights_to_json())
    assert all(np.array_equal(a, b) for a, b in zip(net.weights, clone.weights))


def test_convnet_gradients_numerically():
    """Analytic ≈ numeric through conv, pool argmax routing, and the
    softmax-CE head — several entries per weight tensor."""
    spec = {
        "input_shape": [6, 6, 1],
        "conv": [{"filters": 3, "kernel": 3, "pool": 2, "activation": "relu"}],
        "dense": [4, 3],
        "loss": "softmax_ce",
        "seed": 3,
    }
    net = ConvNet(spec)
    rng = np.random.default_rng(1)
    X = rng.normal(size=(6, 36))
    Y = rng.integers(0, 3, size=(6, 1)).astype(float)
    grads = net.gradients(X, Y)
    eps = 1e-6
    for wi in range(len(net.weights)):
        w = net.weights[wi]
        probe = [(0,), (w.shape[0] - 1,)] if w.ndim == 1 else [(0, 0), (w.shape[0] - 1, w.shape[1] - 1)]
        for idx in probe:
            orig = w[idx]
            w[idx] = orig + eps
            lp = net.loss_value(X, Y)
            w[idx] = orig - eps
            lm = net.loss_value(X, Y)
            w[idx] = orig
            num = (lp - lm) / (2 * eps)
            assert grads[wi][idx] == pytest.approx(num, rel=1e-3, abs=1e-6)


def test_mlp_softmax_ce_gradients_numerically():
    mlp = MLP({"layers": [4, 5, 3], "activations": ["tanh", "linear"], "loss": "softmax_ce", "seed": 2})
    rng = np.random.default_rng(4)
    X = rng.normal(size=(7, 4))
    Y = rng.integers(0, 3, size=(7, 1)).astype(float)
    grads = mlp.gradients(X, Y)
    eps = 1e-6
    for wi in range(len(mlp.weights)):
        idx = (0,) if mlp.weights[wi].ndim == 1 else (0, 0)
        orig = mlp.weights[wi][idx]
        mlp.weights[wi][idx] = orig + eps
        lp = mlp.loss_value(X, Y)
        mlp.weights[wi][idx] = orig - eps
        lm = mlp.loss_value(X, Y)
        mlp.weights[wi][idx] = orig
        num = (lp - lm) / (2 * eps)
        assert grads[wi][idx] == pytest.approx(num, rel=1e-4, abs=1e-6)


def test_softmax_ce_requires_linear_head():
    with pytest.raises(ValueError, match="linear"):
        MLP({"layers": [2, 3], "activations": ["sigmoid"], "loss": "softmax_ce"})
    with pytest.raises(ValueError, match="linear"):
        ConvNet({**CNN_SPEC, "dense_activations": ["sigmoid"]})


def test_cnn_trains_distributed(spark, tmp_path):
    """End-to-end: DistributedDL fits a ConvNet over a DataFrame, the
    fitted model predicts class logits, argmax accuracy clears the floor,
    and the pipeline persists/reloads (reference cnn_example.py's
    Pipeline(...).fit(df); p.save('cnn'))."""
    X, y = _pattern_images(40, seed=5)
    df = spark.createDataFrame(
        [(float(yy), xx.tolist()) for yy, xx in zip(y, X)], ["label", "features"]
    ).repartition(2)

    est = DistributedDL(
        inputCol="features",
        labelCol="label",
        predictionCol="predicted",
        networkSpec=build_conv_network(
            input_shape=[8, 8, 1],
            conv=[{"filters": 4, "kernel": 3, "pool": 2}],
            dense=[3],
            seed=7,
        ),
        tfOptimizer="adam",
        tfLearningRate=0.01,
        iters=3,
        localIters=8,
        miniBatchSize=32,
        seed=7,
    )
    model = est.fit(df)
    rows = model.transform(df).select("label", "predicted").collect()
    acc = sum(int(np.argmax(r["predicted"])) == int(r["label"]) for r in rows) / len(rows)
    assert acc >= 0.8, f"CNN accuracy {acc} below floor"

    path = str(tmp_path / "cnn_model")
    model.save(path)
    from sparkflow_spark.ml import DistributedDLModel

    reloaded = DistributedDLModel.load(path)
    spec = json.loads(reloaded.getOrDefault(reloaded.networkSpec))
    assert spec["conv"][0]["filters"] == 4
    r2 = reloaded.transform(df).select("predicted").collect()
    assert np.allclose(
        np.asarray([r["predicted"] for r in r2]),
        np.asarray([r["predicted"] for r in model.transform(df).select("predicted").collect()]),
    )


def test_convnet_rejects_pool_wider_than_conv_output():
    """pool > conv output used to silently build a zero-width flatten
    (round-4 advice); it must error like the kernel check does."""
    from sparkflow_spark.ml.nn import ConvNet

    with pytest.raises(ValueError, match="pool"):
        ConvNet({
            "input_shape": (8, 8, 1),
            "conv": [{"kernel": 5, "filters": 2, "pool": 8}],
            "dense": [4, 3],
        })
