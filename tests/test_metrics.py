import numpy as np
import pytest

import jax.numpy as jnp
from sklearn.metrics import f1_score

from multimodal_supernovae_tpu.ops.metrics import (
    macro_f1,
    micro_f1,
    r2_score,
    regression_metrics,
    retrieval_at_k,
    retrieval_auc,
)


def numpy_reference_auc(e1, e2, n_thresholds=100):
    """Direct transcription of the reference algorithm
    (src/utils.py:380-426): per-item descending argsort + top-fraction
    membership + trapezoid."""
    e1 = e1 / np.linalg.norm(e1, axis=-1, keepdims=True)
    e2 = e2 / np.linalg.norm(e2, axis=-1, keepdims=True)
    thresholds = np.linspace(0, 1, n_thresholds)
    rows = []
    for idx in range(len(e2)):
        sims = e1 @ e2[idx]
        order = np.argsort(-sims)
        rows.append(
            [idx in order[: int(th * len(order))] for th in thresholds]
        )
    frac = np.sum(rows, axis=0) / len(e2)
    return np.trapezoid(frac, thresholds)


def test_retrieval_auc_matches_reference_algorithm(rng):
    e1 = rng.normal(size=(32, 8)).astype(np.float32)
    e2 = (e1 + 0.5 * rng.normal(size=(32, 8))).astype(np.float32)
    got = float(retrieval_auc(jnp.array(e1), jnp.array(e2)))
    want = numpy_reference_auc(e1, e2)
    assert got == pytest.approx(want, abs=1e-6)


def test_retrieval_auc_extremes(rng):
    e = rng.normal(size=(64, 16)).astype(np.float32)
    perfect = float(retrieval_auc(jnp.array(e), jnp.array(e)))
    assert perfect > 0.98
    random = float(
        retrieval_auc(jnp.array(e), jnp.array(rng.normal(size=(64, 16)).astype(np.float32)))
    )
    assert 0.3 < random < 0.7


def test_retrieval_at_k(rng):
    e = rng.normal(size=(16, 8)).astype(np.float32)
    assert float(retrieval_at_k(jnp.array(e), jnp.array(e), 1)) == 1.0


def test_r2():
    y = jnp.array([1.0, 2.0, 3.0, 4.0])
    assert float(r2_score(y, y)) == pytest.approx(1.0)
    assert float(r2_score(y, jnp.full(4, jnp.mean(y)))) == pytest.approx(0.0)


def test_macro_f1_matches_sklearn(rng):
    y_true = rng.integers(0, 5, size=100)
    y_pred = rng.integers(0, 5, size=100)
    got = float(macro_f1(jnp.array(y_true), jnp.array(y_pred), 5))
    want = f1_score(y_true, y_pred, average="macro")
    assert got == pytest.approx(want, abs=1e-6)
    got_mic = float(micro_f1(jnp.array(y_true), jnp.array(y_pred), 5))
    want_mic = f1_score(y_true, y_pred, average="micro")
    assert got_mic == pytest.approx(want_mic, abs=1e-6)


def test_regression_metrics():
    y = jnp.array([0.1, 0.2, 0.3, 1.0])
    p = jnp.array([0.1, 0.2, 0.3, 0.2])  # last one is an outlier
    m = regression_metrics(y, p)
    assert float(m["OLF"]) == pytest.approx(0.25)
    assert float(m["L1"]) == pytest.approx(0.2)
