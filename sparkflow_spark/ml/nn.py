"""Minimal numpy MLP + optimizers — the training kernel that runs inside
executor tasks.

The container ships no TF/Torch, so the network is pure numpy; the shape
mirrors what the reference ships to executors as a TF MetaGraphDef JSON
(reference graph_utils.py:6-15): a declarative spec (layer sizes +
activations) plus a flat list of weight arrays, JSON-serializable so it
can live in a broadcast variable or an ML Param string (the reference's
weights-as-JSON pattern, reference ml_util.py:31-40).

Everything here is deterministic given a seed.
"""

from __future__ import annotations

import json

import numpy as np

_ACTIVATIONS = {
    "linear": (lambda z: z, lambda z, a: np.ones_like(z)),
    "relu": (lambda z: np.maximum(z, 0.0), lambda z, a: (z > 0).astype(z.dtype)),
    "tanh": (lambda z: np.tanh(z), lambda z, a: 1.0 - a * a),
    "sigmoid": (
        lambda z: 1.0 / (1.0 + np.exp(-np.clip(z, -60, 60))),
        lambda z, a: a * (1.0 - a),
    ),
}

LOSSES = ("mse", "bce")


class MLP:
    """Fully-connected net defined by ``spec``:

    ``{"layers": [in, h1, ..., out], "activations": ["relu", ...],
    "loss": "mse"|"bce", "seed": 42, "dropout": 0.2,
    "keep_dropout": false}``
    (len(activations) == len(layers) - 1).

    ``dropout``: inverted dropout on HIDDEN layer outputs — a float
    (same rate for every hidden layer) or a list of one rate per hidden
    layer. Active only when an rng is passed to forward()/gradients()
    (training); plain forward() is deterministic eval — mirroring the
    reference's tfDropout placeholder fed 0.0 at inference
    (reference ml_util.py:70-72). ``keep_dropout`` mirrors the
    reference's toKeepDropout: inference keeps dropout active
    (MC-dropout style; the model layer passes a seeded rng so results
    stay reproducible).
    """

    def __init__(self, spec: dict):
        self.spec = dict(spec)
        layers = spec["layers"]
        acts = spec.get("activations") or ["relu"] * (len(layers) - 2) + ["linear"]
        if len(acts) != len(layers) - 1:
            raise ValueError("activations must have len(layers) - 1 entries")
        for a in acts:
            if a not in _ACTIVATIONS:
                raise ValueError(f"unknown activation {a!r}")
        self.layers = list(layers)
        self.activations = list(acts)
        self.loss = spec.get("loss", "mse")
        if self.loss not in LOSSES:
            raise ValueError(f"unknown loss {self.loss!r}")
        n_hidden = len(layers) - 2
        drop = spec.get("dropout")
        if drop is None:
            self.dropout: list[float] | None = None
        else:
            rates = [float(drop)] * n_hidden if isinstance(drop, (int, float)) else [float(r) for r in drop]
            if len(rates) != n_hidden:
                raise ValueError(f"dropout needs one rate per hidden layer ({n_hidden})")
            if any(not (0.0 <= r < 1.0) for r in rates):
                raise ValueError("dropout rates must be in [0, 1)")
            self.dropout = rates if any(r > 0 for r in rates) else None
        self.keep_dropout = bool(spec.get("keep_dropout", False))
        self.weights = self._init_weights(int(spec.get("seed", 42)))

    def _init_weights(self, seed: int) -> list[np.ndarray]:
        rng = np.random.default_rng(seed)
        ws: list[np.ndarray] = []
        for fan_in, fan_out in zip(self.layers[:-1], self.layers[1:]):
            limit = np.sqrt(6.0 / (fan_in + fan_out))  # Glorot uniform
            ws.append(rng.uniform(-limit, limit, size=(fan_in, fan_out)))
            ws.append(np.zeros(fan_out))
        return ws

    # -- weights (reference tensorflow_get_weights/set_weights,
    #    ml_util.py:9-28, and JSON codec ml_util.py:31-40) --------------
    def get_weights(self) -> list[np.ndarray]:
        return [w.copy() for w in self.weights]

    def set_weights(self, ws: list[np.ndarray]) -> None:
        self.weights = [np.asarray(w, dtype=np.float64) for w in ws]

    def weights_to_json(self) -> str:
        return json.dumps([w.tolist() for w in self.weights])

    def weights_from_json(self, s: str) -> None:
        self.set_weights([np.asarray(w) for w in json.loads(s)])

    # -- forward / backward --------------------------------------------
    def _mask(self, i: int, shape, rng) -> np.ndarray | None:
        """Inverted-dropout mask for hidden layer i, or None."""
        if rng is None or self.dropout is None or i >= len(self.layers) - 2:
            return None
        rate = self.dropout[i]
        if rate <= 0.0:
            return None
        keep = 1.0 - rate
        return (rng.random(shape) < keep).astype(np.float64) / keep

    def forward(self, X: np.ndarray, rng: np.random.Generator | None = None) -> np.ndarray:
        """Eval-mode forward (deterministic) unless ``rng`` is given, in
        which case dropout masks are sampled (training / keep_dropout)."""
        a = X
        for i in range(len(self.layers) - 1):
            W, b = self.weights[2 * i], self.weights[2 * i + 1]
            z = a @ W + b
            a = _ACTIVATIONS[self.activations[i]][0](z)
            m = self._mask(i, a.shape, rng)
            if m is not None:
                a = a * m
        return a

    def loss_value(self, X: np.ndarray, Y: np.ndarray) -> float:
        P = self.forward(X)
        if self.loss == "bce":
            p = np.clip(P, 1e-9, 1 - 1e-9)
            return float(-np.mean(Y * np.log(p) + (1 - Y) * np.log(1 - p)))
        return float(np.mean((P - Y) ** 2))

    def gradients(
        self, X: np.ndarray, Y: np.ndarray, rng: np.random.Generator | None = None
    ) -> list[np.ndarray]:
        """Backprop; returns grads aligned with self.weights. ``rng``
        activates dropout (masks are sampled in the forward pass and
        reused exactly in the backward pass)."""
        zs, raw, as_ = [], [X], [X]  # raw = pre-dropout activations (for dact)
        masks: list[np.ndarray | None] = []
        a = X
        for i in range(len(self.layers) - 1):
            W, b = self.weights[2 * i], self.weights[2 * i + 1]
            z = a @ W + b
            r = _ACTIVATIONS[self.activations[i]][0](z)
            m = self._mask(i, r.shape, rng)
            a = r * m if m is not None else r
            zs.append(z)
            raw.append(r)
            as_.append(a)
            masks.append(m)
        n = X.shape[0]
        P = as_[-1]
        if self.loss == "bce":
            p = np.clip(P, 1e-9, 1 - 1e-9)
            dA = (p - Y) / (p * (1 - p)) / n
        else:
            dA = 2.0 * (P - Y) / n
        grads: list[np.ndarray] = [np.zeros_like(w) for w in self.weights]
        for i in reversed(range(len(self.layers) - 1)):
            act, dact = _ACTIVATIONS[self.activations[i]]
            if masks[i] is not None:  # d(r·m)/dr = m
                dA = dA * masks[i]
            dZ = dA * dact(zs[i], raw[i + 1])
            grads[2 * i] = as_[i].T @ dZ
            grads[2 * i + 1] = dZ.sum(axis=0)
            dA = dZ @ self.weights[2 * i].T
        return grads


class _SGD:
    def __init__(self, lr: float, **_):
        self.lr = lr

    def apply(self, weights, grads):
        return [w - self.lr * g for w, g in zip(weights, grads)]


class _Momentum:
    def __init__(self, lr: float, momentum: float = 0.9, **_):
        self.lr, self.m, self.v = lr, momentum, None

    def apply(self, weights, grads):
        if self.v is None:
            self.v = [np.zeros_like(g) for g in grads]
        self.v = [self.m * v + g for v, g in zip(self.v, grads)]
        return [w - self.lr * v for w, v in zip(weights, self.v)]


class _RMSProp:
    def __init__(self, lr: float, decay: float = 0.9, epsilon: float = 1e-8, **_):
        self.lr, self.d, self.eps, self.s = lr, decay, epsilon, None

    def apply(self, weights, grads):
        if self.s is None:
            self.s = [np.zeros_like(g) for g in grads]
        self.s = [self.d * s + (1 - self.d) * g * g for s, g in zip(self.s, grads)]
        return [
            w - self.lr * g / (np.sqrt(s) + self.eps)
            for w, g, s in zip(weights, grads, self.s)
        ]


class _Adam:
    def __init__(self, lr: float, beta1: float = 0.9, beta2: float = 0.999, epsilon: float = 1e-8, **_):
        self.lr, self.b1, self.b2, self.eps = lr, beta1, beta2, epsilon
        self.m = self.v = None
        self.t = 0

    def apply(self, weights, grads):
        if self.m is None:
            self.m = [np.zeros_like(g) for g in grads]
            self.v = [np.zeros_like(g) for g in grads]
        self.t += 1
        self.m = [self.b1 * m + (1 - self.b1) * g for m, g in zip(self.m, grads)]
        self.v = [self.b2 * v + (1 - self.b2) * g * g for v, g in zip(self.v, grads)]
        out = []
        for w, m, v in zip(weights, self.m, self.v):
            mh = m / (1 - self.b1**self.t)
            vh = v / (1 - self.b2**self.t)
            out.append(w - self.lr * mh / (np.sqrt(vh) + self.eps))
        return out


class _Adagrad:
    def __init__(self, lr: float, epsilon: float = 1e-8, **_):
        self.lr, self.eps, self.s = lr, epsilon, None

    def apply(self, weights, grads):
        if self.s is None:
            self.s = [np.zeros_like(g) for g in grads]
        self.s = [s + g * g for s, g in zip(self.s, grads)]
        return [
            w - self.lr * g / (np.sqrt(s) + self.eps)
            for w, g, s in zip(weights, grads, self.s)
        ]


class _Adadelta:
    def __init__(self, lr: float = 1.0, rho: float = 0.95, epsilon: float = 1e-6, **_):
        self.lr, self.rho, self.eps = lr, rho, epsilon
        self.s = self.d = None

    def apply(self, weights, grads):
        if self.s is None:
            self.s = [np.zeros_like(g) for g in grads]
            self.d = [np.zeros_like(g) for g in grads]
        out = []
        for i, (w, g) in enumerate(zip(weights, grads)):
            self.s[i] = self.rho * self.s[i] + (1 - self.rho) * g * g
            upd = np.sqrt(self.d[i] + self.eps) / np.sqrt(self.s[i] + self.eps) * g
            self.d[i] = self.rho * self.d[i] + (1 - self.rho) * upd * upd
            out.append(w - self.lr * upd)
        return out


# Same 10-name surface as the reference's factory
# (reference tensorflow_async.py:17-42); unknown names fall back to plain
# gradient descent exactly as the reference does.
_OPTIMIZERS = {
    "adam": _Adam,
    "rmsprop": _RMSProp,
    "momentum": _Momentum,
    "adadelta": _Adadelta,
    "adagrad": _Adagrad,
    "gradient_descent": _SGD,
    "adagrad_da": _Adagrad,
    "ftrl": _Adagrad,
    "proximal_adagrad": _Adagrad,
    "proximal_gradient_descent": _SGD,
}


def build_optimizer(name: str, lr: float, options: dict | None = None):
    cls = _OPTIMIZERS.get(name, _SGD)
    return cls(lr, **(options or {}))
