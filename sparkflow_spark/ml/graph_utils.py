"""Network-spec and optimizer-config builders.

Mirrors the reference's ``build_graph`` + ``generate_config`` helper
family (reference graph_utils.py:6-47): declarative JSON in, JSON out,
no framework objects crossing process boundaries.
"""

from __future__ import annotations

import json


def build_network(
    layers: list[int],
    activations: list[str] | None = None,
    loss: str = "mse",
    seed: int = 42,
    dropout: float | list[float] | None = None,
    keep_dropout: bool = False,
) -> str:
    """JSON network spec for :class:`~sparkflow_spark.ml.nn.MLP` —
    the analogue of the reference's MetaGraphDef→JSON export
    (reference graph_utils.py:6-15).

    ``dropout``: rate (or per-hidden-layer list) for inverted dropout at
    training; disabled at inference unless ``keep_dropout`` (the
    reference's tfDropout / toKeepDropout pair, reference
    ml_util.py:70-72, tensorflow_async.py:57-58)."""
    spec: dict = {"layers": list(layers), "loss": loss, "seed": seed}
    if activations is not None:
        spec["activations"] = list(activations)
    if dropout is not None:
        spec["dropout"] = dropout
    if keep_dropout:
        spec["keep_dropout"] = True
    return json.dumps(spec)


def build_conv_network(
    input_shape: list[int],
    conv: list[dict],
    dense: list[int],
    dense_activations: list[str] | None = None,
    loss: str = "softmax_ce",
    seed: int = 42,
) -> str:
    """JSON spec for :class:`~sparkflow_spark.ml.nn.ConvNet` — the
    declarative counterpart of the reference's conv graph assembly
    (reference examples/cnn_example.py:10-23: conv2d→maxpool stacks into
    a dense softmax head).

    ``conv``: list of ``{"filters": F, "kernel": K, "pool": P,
    "activation": "relu"}`` dicts (valid padding, stride 1, pool = P×P
    non-overlapping max)."""
    spec: dict = {
        "input_shape": list(input_shape),
        "conv": [dict(l) for l in conv],
        "dense": list(dense),
        "loss": loss,
        "seed": seed,
    }
    if dense_activations is not None:
        spec["dense_activations"] = list(dense_activations)
    return json.dumps(spec)


def generate_config(**kwargs) -> str:
    """kwargs → JSON (reference graph_utils.py:18-22)."""
    return json.dumps(kwargs)


# Builder signatures mirror the reference exactly (reference
# graph_utils.py:22-47) so ported calls don't TypeError: learning_rate
# rides along in the config JSON (the optimizer factory's lr parameter
# wins if both are given — same precedence as the reference, where
# tfLearningRate constructed the optimizer); TF-only knobs
# (use_locking, centered, use_nesterov, initial_accumulator) are
# accepted and carried but ignored by the numpy optimizers (**_ sinks).


def build_adam_config(
    learning_rate: float = 0.001, beta1: float = 0.9, beta2: float = 0.999,
    epsilon: float = 1e-8, use_locking: bool = False,
) -> str:
    return generate_config(learning_rate=learning_rate, beta1=beta1, beta2=beta2,
                           epsilon=epsilon, use_locking=use_locking)


def build_rmsprop_config(
    learning_rate: float = 0.001, decay: float = 0.9, momentum: float = 0.0,
    epsilon: float = 1e-10, use_locking: bool = False, centered: bool = False,
) -> str:
    return generate_config(learning_rate=learning_rate, decay=decay, momentum=momentum,
                           epsilon=epsilon, use_locking=use_locking, centered=centered)


def build_momentum_config(
    learning_rate: float = 0.001, momentum: float = 0.9,
    use_locking: bool = False, use_nesterov: bool = False,
) -> str:
    return generate_config(learning_rate=learning_rate, momentum=momentum,
                           use_locking=use_locking, use_nesterov=use_nesterov)


def build_adadelta_config(
    learning_rate: float = 0.001, rho: float = 0.95, epsilon: float = 1e-8,
    use_locking: bool = False,
) -> str:
    return generate_config(learning_rate=learning_rate, rho=rho, epsilon=epsilon,
                           use_locking=use_locking)


def build_adagrad_config(
    learning_rate: float = 0.001, initial_accumulator: float = 0.1,
    use_locking: bool = False, epsilon: float = 1e-8,
) -> str:
    # epsilon is an engine extension (the numpy optimizer uses it; the
    # reference's TF adagrad had none) — trailing so the reference's
    # positional order is preserved
    return generate_config(learning_rate=learning_rate,
                           initial_accumulator=initial_accumulator,
                           use_locking=use_locking, epsilon=epsilon)


def build_gradient_descent(learning_rate: float = 0.001, use_locking: bool = False) -> str:
    # the reference name has no _config suffix (graph_utils.py:46)
    return generate_config(learning_rate=learning_rate, use_locking=use_locking)


# engine-native alias kept for existing callers
build_gradient_descent_config = build_gradient_descent
