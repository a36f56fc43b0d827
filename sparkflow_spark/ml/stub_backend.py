"""A numpy stand-in "framework" for the predict_with serving hook.

No real DL framework ships in this sandbox, so this module plays the
role of ``torch``/``tensorflow`` in tests and examples: a factory that
loads a weight artifact from disk and returns a batch-predict closure —
the exact operating shape ``PredictWith`` expects from a user's real
factory (reference tensorflow_model_loader.py:8-32 restores a TF
checkpoint the same way: artifact path in, callable out).

The "checkpoint format" is a plain ``.npz`` with arrays ``W`` (d×k) and
``b`` (k) — deterministic affine predictions, so tests can assert exact
values. A per-process load counter lets tests pin the once-per-worker
model-cache contract.
"""

from __future__ import annotations

import numpy as np

# incremented on every checkpoint open IN THIS PROCESS — executors each
# count their own loads; tests read it back through the predict fn
_LOAD_COUNT = 0


def make_affine_predict_fn(
    checkpoint: str | None = None,
    scale: float = 1.0,
    W: list | None = None,
    b: float | list = 0.0,
):
    """Factory: load the .npz checkpoint — or take inline ``W``/``b``
    (JSON-serializable, so they travel through fnFactoryArgs; the mode
    a cross-engine oracle can replay) — and return
    ``predict(inputs) -> np.ndarray``.

    With a (d×1) ``W`` the output squeezes to a scalar per row (DDL
    ``double``); with k>1 columns it stays a vector (``array<double>``).
    """
    global _LOAD_COUNT
    _LOAD_COUNT += 1
    loads_at_build = _LOAD_COUNT
    if checkpoint is not None:
        with np.load(checkpoint) as z:
            W = z["W"].astype(np.float64)
            b = z["b"].astype(np.float64)
    elif W is not None:
        W = np.asarray(W, dtype=np.float64)
        if W.ndim == 1:
            W = W[:, None]
        b = np.asarray(b, dtype=np.float64)
    else:
        W = None

    def predict(inputs: np.ndarray) -> np.ndarray:
        X = np.asarray(inputs, dtype=np.float64)
        if X.ndim == 1:  # scalar input column
            X = X[:, None]
        out = X * scale + b if W is None else X @ W * scale + b
        return out[:, 0] if out.ndim == 2 and out.shape[1] == 1 else out

    predict._loads_at_build = loads_at_build  # test hook
    return predict


def make_load_counting_fn():
    """Factory whose predictions ARE the process-local load count —
    lets a test prove the factory ran once per worker, not per batch."""
    global _LOAD_COUNT
    _LOAD_COUNT += 1
    n = float(_LOAD_COUNT)

    def predict(inputs: np.ndarray) -> np.ndarray:
        return np.full(np.asarray(inputs).shape[0], n)

    return predict
