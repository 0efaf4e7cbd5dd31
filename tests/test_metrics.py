"""MOSEI metric suite tests (vs sklearn where the reference used sklearn)."""

import numpy as np
from sklearn.metrics import accuracy_score, f1_score, mean_squared_error

from sdumc_tpu.core.metrics import calculate_binary_results, eval_mosei_metric, overall_metric


def test_eval_mosei_metric_keys_and_values():
    rng = np.random.default_rng(0)
    labels = rng.uniform(-3, 3, size=500)
    labels[::7] = 0.0
    preds = labels + rng.normal(scale=0.7, size=500)

    m = eval_mosei_metric(preds, labels, names=[str(i) for i in range(500)])
    assert {"mse", "mae", "corr", "acc7", "acc2", "f1"} <= set(m)

    assert np.isclose(m["mse"], mean_squared_error(labels, preds))
    assert np.isclose(m["mae"], np.mean(np.abs(preds - labels)))

    nz = labels != 0
    assert np.isclose(m["acc2"], accuracy_score(labels[nz] > 0, preds[nz] > 0))
    assert np.isclose(
        m["f1"], f1_score(labels[nz] > 0, preds[nz] > 0, average="weighted")
    )
    assert 0.5 < m["corr"] <= 1.0


def test_binary_results_matches_reference_semantics():
    """Reference: toolkit/dataloader/cmumosei.py:149-163."""
    rng = np.random.default_rng(1)
    labels = rng.uniform(-3, 3, size=200)
    labels[:20] = 0.0
    preds = rng.uniform(-3, 3, size=200)
    res = calculate_binary_results(preds, labels)
    nz = labels != 0
    assert np.isclose(res["emoacc"], accuracy_score(labels[nz] > 0, preds[nz] > 0))
    assert np.isclose(
        res["emofscore"], f1_score(labels[nz] > 0, preds[nz] > 0, average="weighted")
    )


def test_overall_metric():
    assert overall_metric(0.8, 0.4) == 0.8 - 0.1


def test_perfect_predictions():
    labels = np.array([-2.0, -1.0, 0.0, 1.0, 2.0])
    m = eval_mosei_metric(labels.copy(), labels)
    assert m["mse"] == 0.0 and m["mae"] == 0.0
    assert m["acc7"] == 1.0 and m["acc2"] == 1.0 and m["f1"] == 1.0
