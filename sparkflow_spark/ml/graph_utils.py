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


def generate_config(**kwargs) -> str:
    """kwargs → JSON (reference graph_utils.py:18-22)."""
    return json.dumps(kwargs)


def build_adam_config(beta1: float = 0.9, beta2: float = 0.999, epsilon: float = 1e-8) -> str:
    return generate_config(beta1=beta1, beta2=beta2, epsilon=epsilon)


def build_rmsprop_config(decay: float = 0.9, epsilon: float = 1e-8) -> str:
    return generate_config(decay=decay, epsilon=epsilon)


def build_momentum_config(momentum: float = 0.9) -> str:
    return generate_config(momentum=momentum)


def build_adadelta_config(rho: float = 0.95, epsilon: float = 1e-6) -> str:
    return generate_config(rho=rho, epsilon=epsilon)


def build_adagrad_config(epsilon: float = 1e-8) -> str:
    return generate_config(epsilon=epsilon)


def build_gradient_descent_config() -> str:
    return generate_config()
