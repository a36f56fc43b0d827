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

LOSSES = ("mse", "bce", "softmax_ce")


def _softmax(Z: np.ndarray) -> np.ndarray:
    Z = Z - Z.max(axis=1, keepdims=True)
    e = np.exp(Z)
    return e / e.sum(axis=1, keepdims=True)


def _onehot(Y: np.ndarray, k: int) -> np.ndarray:
    """Scalar class labels (n,) or (n,1) → one-hot (n,k); pass-through
    if already (n,k) — the estimator feeds scalar labelCol values, the
    reference fed OneHotEncoder output (reference examples/cnn_example.py)."""
    Y = np.asarray(Y)
    if Y.ndim == 2 and Y.shape[1] == k:
        return Y
    return np.eye(k)[Y.astype(int).ravel()]


def _loss_value(loss: str, P: np.ndarray, Y: np.ndarray) -> float:
    """P = network output (logits for softmax_ce)."""
    if loss == "bce":
        p = np.clip(P, 1e-9, 1 - 1e-9)
        return float(-np.mean(Y * np.log(p) + (1 - Y) * np.log(1 - p)))
    if loss == "softmax_ce":
        Z = P - P.max(axis=1, keepdims=True)
        logp = Z - np.log(np.exp(Z).sum(axis=1, keepdims=True))
        return float(-np.mean((_onehot(Y, P.shape[1]) * logp).sum(axis=1)))
    return float(np.mean((P - Y) ** 2))


def _loss_grad(loss: str, P: np.ndarray, Y: np.ndarray) -> np.ndarray:
    """dLoss/dP averaged over the batch. For softmax_ce the final layer
    is linear (enforced at spec validation), so dLoss/dP is already
    dLoss/dZ of the last layer — the (softmax − onehot)/n shortcut."""
    n = P.shape[0]
    if loss == "bce":
        p = np.clip(P, 1e-9, 1 - 1e-9)
        return (p - Y) / (p * (1 - p)) / n
    if loss == "softmax_ce":
        return (_softmax(P) - _onehot(Y, P.shape[1])) / n
    return 2.0 * (P - Y) / n


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
        if self.loss == "softmax_ce" and acts[-1] != "linear":
            # softmax_ce folds softmax into the loss (the network emits
            # logits — same contract as the reference's
            # tf.losses.softmax_cross_entropy over a dense output,
            # reference examples/cnn_example.py:21-22)
            raise ValueError("softmax_ce requires a 'linear' final activation (logit output)")
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
        return _loss_value(self.loss, P, Y)

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
        dA = _loss_grad(self.loss, P, Y)
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


# ---------------------------------------------------------------------------
# Convolutional network — covers the reference's CNN demo
# (reference examples/cnn_example.py:10-23: conv2d→maxpool→conv2d→maxpool→
# dense→softmax_cross_entropy) with the same train/inference protocol as
# MLP, so DistributedDL ships either transparently.
# ---------------------------------------------------------------------------


def _im2col(X: np.ndarray, k: int) -> np.ndarray:
    """(n,h,w,c) → (n,oh,ow,k*k*c) valid-padding stride-1 patches.
    Zero-copy strided view until the trailing reshape."""
    n, h, w, c = X.shape
    oh, ow = h - k + 1, w - k + 1
    s = X.strides
    v = np.lib.stride_tricks.as_strided(
        X, (n, oh, ow, k, k, c), (s[0], s[1], s[2], s[1], s[2], s[3])
    )
    return v.reshape(n, oh, ow, k * k * c)


def _col2im(dcols: np.ndarray, h: int, w: int, k: int, c: int) -> np.ndarray:
    """Adjoint of _im2col: scatter-add patch grads back to the image."""
    n, oh, ow, _ = dcols.shape
    d6 = dcols.reshape(n, oh, ow, k, k, c)
    dX = np.zeros((n, h, w, c))
    for di in range(k):
        for dj in range(k):
            dX[:, di : di + oh, dj : dj + ow, :] += d6[:, :, :, di, dj, :]
    return dX


def _maxpool(X: np.ndarray, p: int):
    """Non-overlapping p×p max pool (valid truncation, like TF's
    max_pooling2d with stride=pool). Returns (pooled, argmax_idx)."""
    n, h, w, c = X.shape
    ph, pw = h // p, w // p
    t = X[:, : ph * p, : pw * p, :].reshape(n, ph, p, pw, p, c)
    flat = t.transpose(0, 1, 3, 5, 2, 4).reshape(n, ph, pw, c, p * p)
    idx = flat.argmax(axis=-1)
    out = np.take_along_axis(flat, idx[..., None], axis=-1)[..., 0]
    return out, idx


def _maxpool_back(dout: np.ndarray, idx: np.ndarray, h: int, w: int, p: int) -> np.ndarray:
    n, ph, pw, c = dout.shape
    dflat = np.zeros((n, ph, pw, c, p * p))
    np.put_along_axis(dflat, idx[..., None], dout[..., None], axis=-1)
    dX = np.zeros((n, h, w, c))
    dX[:, : ph * p, : pw * p, :] = (
        dflat.reshape(n, ph, pw, c, p, p).transpose(0, 1, 4, 2, 5, 3).reshape(n, ph * p, pw * p, c)
    )
    return dX


class ConvNet:
    """Conv → pool stack followed by dense layers, defined by ``spec``:

    ``{"input_shape": [h, w, c],
       "conv": [{"filters": 32, "kernel": 5, "pool": 2,
                 "activation": "relu"}, ...],
       "dense": [..., out],
       "dense_activations": ["relu", ..., "linear"],   # optional
       "loss": "softmax_ce"|"mse"|"bce", "seed": 42}``

    Rows arrive FLAT (n, h*w*c) — the estimator's array<double> feature
    column — and are reshaped internally, mirroring the reference's
    ``tf.reshape(x, [-1, 28, 28, 1])`` (reference examples/cnn_example.py:13).
    Convolutions are valid-padding stride-1 (tf.layers.conv2d's stride
    default; padding differs from its 'same' default only at the edges —
    the declared spec is the contract here, not TF bit-parity).
    Weights layout: [W_conv1(k²c_in×f), b_conv1(f), ..., W_dense, b_dense,
    ...] — 2-D matrices throughout, so the MLP's JSON codec and the
    estimator's weighted averaging apply unchanged.
    """

    def __init__(self, spec: dict):
        self.spec = dict(spec)
        h, w, c = spec["input_shape"]
        self.input_shape = (int(h), int(w), int(c))
        self.conv = [dict(l) for l in spec.get("conv", [])]
        for l in self.conv:
            l.setdefault("pool", 1)
            l.setdefault("activation", "relu")
            if l["activation"] not in _ACTIVATIONS:
                raise ValueError(f"unknown activation {l['activation']!r}")
        # spatial shape after each conv(+pool) — validates the stack fits
        shapes = [self.input_shape]
        for l in self.conv:
            ph, pw, _ = shapes[-1]
            k, p = int(l["kernel"]), int(l["pool"])
            oh, ow = ph - k + 1, pw - k + 1
            if oh < 1 or ow < 1:
                raise ValueError(f"kernel {k} exceeds input {ph}x{pw}")
            if oh // p < 1 or ow // p < 1:
                # a pool wider than the conv output would silently build
                # a zero-width flattened layer (degenerate dense weights)
                raise ValueError(
                    f"pool {p} exceeds conv output {oh}x{ow} (kernel {k} on {ph}x{pw})"
                )
            shapes.append((oh // p, ow // p, int(l["filters"])))
        self._shapes = shapes
        flat = shapes[-1][0] * shapes[-1][1] * shapes[-1][2]
        dense = list(spec["dense"])
        d_acts = spec.get("dense_activations") or ["relu"] * (len(dense) - 1) + ["linear"]
        if len(d_acts) != len(dense):
            raise ValueError("dense_activations must have len(dense) entries")
        for a in d_acts:
            if a not in _ACTIVATIONS:
                raise ValueError(f"unknown activation {a!r}")
        self.dense = dense
        self.dense_activations = d_acts
        self.loss = spec.get("loss", "softmax_ce")
        if self.loss not in LOSSES:
            raise ValueError(f"unknown loss {self.loss!r}")
        if self.loss == "softmax_ce" and d_acts[-1] != "linear":
            raise ValueError("softmax_ce requires a 'linear' final activation (logit output)")
        # estimator protocol: layers[0] = flat input dim (empty-partition
        # placeholder shape), layers[-1] = output dim (inference schema)
        self.layers = [h * w * c] + [s[0] * s[1] * s[2] for s in shapes[1:]] + dense
        self.dropout = None  # conv stack trains unregularized (spec-level choice)
        self.keep_dropout = False
        self.weights = self._init_weights(int(spec.get("seed", 42)))

    def _init_weights(self, seed: int) -> list[np.ndarray]:
        rng = np.random.default_rng(seed)
        ws: list[np.ndarray] = []
        for i, l in enumerate(self.conv):
            k, f = int(l["kernel"]), int(l["filters"])
            c_in = self._shapes[i][2]
            fan_in, fan_out = k * k * c_in, f
            limit = np.sqrt(6.0 / (fan_in + fan_out))
            ws.append(rng.uniform(-limit, limit, size=(fan_in, f)))
            ws.append(np.zeros(f))
        prev = self._shapes[-1][0] * self._shapes[-1][1] * self._shapes[-1][2]
        for d in self.dense:
            limit = np.sqrt(6.0 / (prev + d))
            ws.append(rng.uniform(-limit, limit, size=(prev, d)))
            ws.append(np.zeros(d))
            prev = d
        return ws

    # -- weights: same codec surface as MLP ----------------------------
    def get_weights(self) -> list[np.ndarray]:
        return [w.copy() for w in self.weights]

    def set_weights(self, ws) -> None:
        self.weights = [np.asarray(w, dtype=np.float64) for w in ws]

    def weights_to_json(self) -> str:
        return json.dumps([w.tolist() for w in self.weights])

    def weights_from_json(self, s: str) -> None:
        self.set_weights([np.asarray(w) for w in json.loads(s)])

    # -- forward / backward --------------------------------------------
    def _forward_trace(self, X: np.ndarray):
        """Full forward pass keeping every intermediate for backprop."""
        n = X.shape[0]
        A = X.reshape(n, *self.input_shape)
        conv_tr = []
        for i, l in enumerate(self.conv):
            k, p = int(l["kernel"]), int(l["pool"])
            W, b = self.weights[2 * i], self.weights[2 * i + 1]
            cols = _im2col(A, k)
            Z = cols @ W + b
            act = _ACTIVATIONS[l["activation"]][0]
            R = act(Z)
            if p > 1:
                P_, idx = _maxpool(R, p)
            else:
                P_, idx = R, None
            conv_tr.append((A.shape, cols, Z, R, idx))
            A = P_
        flat = A.reshape(n, -1)
        dense_tr = []
        a = flat
        off = 2 * len(self.conv)
        for i, act_name in enumerate(self.dense_activations):
            W, b = self.weights[off + 2 * i], self.weights[off + 2 * i + 1]
            z = a @ W + b
            r = _ACTIVATIONS[act_name][0](z)
            dense_tr.append((a, z, r))
            a = r
        return conv_tr, flat, dense_tr, a

    def forward(self, X: np.ndarray, rng=None) -> np.ndarray:
        """rng accepted for MLP signature parity; no dropout here."""
        return self._forward_trace(np.asarray(X, dtype=np.float64))[3]

    def loss_value(self, X: np.ndarray, Y: np.ndarray) -> float:
        return _loss_value(self.loss, self.forward(X), Y)

    def gradients(self, X: np.ndarray, Y: np.ndarray, rng=None) -> list[np.ndarray]:
        X = np.asarray(X, dtype=np.float64)
        conv_tr, flat, dense_tr, P = self._forward_trace(X)
        grads: list[np.ndarray] = [np.zeros_like(w) for w in self.weights]
        dA = _loss_grad(self.loss, P, Y)
        off = 2 * len(self.conv)
        for i in reversed(range(len(self.dense))):
            a_prev, z, r = dense_tr[i]
            dact = _ACTIVATIONS[self.dense_activations[i]][1]
            dZ = dA * dact(z, r)
            grads[off + 2 * i] = a_prev.T @ dZ
            grads[off + 2 * i + 1] = dZ.sum(axis=0)
            dA = dZ @ self.weights[off + 2 * i].T
        # back into the conv stack: dA is d/d(flattened last pool output)
        n = X.shape[0]
        last = self._shapes[-1]
        dP = dA.reshape(n, *last)
        for i in reversed(range(len(self.conv))):
            l = self.conv[i]
            k, p = int(l["kernel"]), int(l["pool"])
            in_shape, cols, Z, R, idx = conv_tr[i]
            if p > 1:
                dR = _maxpool_back(dP, idx, R.shape[1], R.shape[2], p)
            else:
                dR = dP
            dact = _ACTIVATIONS[l["activation"]][1]
            dZ = dR * dact(Z, R)
            f = dZ.shape[-1]
            grads[2 * i] = cols.reshape(-1, cols.shape[-1]).T @ dZ.reshape(-1, f)
            grads[2 * i + 1] = dZ.reshape(-1, f).sum(axis=0)
            if i > 0:  # input gradient feeds the previous layer only
                dcols = dZ @ self.weights[2 * i].T
                dP = _col2im(dcols, in_shape[1], in_shape[2], k, in_shape[3])
        return grads


def make_network(spec: dict):
    """Spec → network instance. A spec with ``input_shape``/``conv`` keys
    builds a :class:`ConvNet`; a ``layers`` spec builds an :class:`MLP`."""
    if "input_shape" in spec or "conv" in spec:
        return ConvNet(spec)
    return MLP(spec)
