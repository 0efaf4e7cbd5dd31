"""MOSEI metric suite tests (vs sklearn where the reference used sklearn)."""

import numpy as np
import pytest
from sklearn.metrics import accuracy_score, f1_score, mean_squared_error

from sdumc_tpu.core.metrics import calculate_binary_results, eval_mosei_metric, overall_metric


pytestmark = pytest.mark.fast  # pre-commit smoke tier (PARITY.md)

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


def test_cv_averaging_matches_reference_semantics():
    """Fold-averaging: preds mean across folds, metric summary string, and
    the selection metric (reference toolkit/utils/metric.py:15-99)."""
    from sdumc_tpu.core.metrics import (
        average_folds_for_emos, average_folds_for_vals, gain_cv_results,
        gain_metric_from_results, overall_metric)

    rng = np.random.default_rng(0)
    labels = rng.uniform(-3, 3, 10)
    folds = []
    for k in range(3):
        folds.append({
            "eval_valmse": 0.5 + 0.1 * k,
            "eval_emofscore": 0.7 - 0.05 * k,
            "test_vallabels": labels,
            "test_valpreds": labels + 0.1 * (k + 1),
            "test_emolabels": np.arange(10) % 2,
            "test_emoprobs": rng.uniform(size=(10, 2)),
        })

    got_l, got_p = average_folds_for_vals(folds, "test")
    np.testing.assert_allclose(got_p, labels + 0.2, atol=1e-12)
    assert np.array_equal(got_l, labels)

    el, ep = average_folds_for_emos(folds, "test")
    assert len(ep) == 10 and np.array_equal(el, folds[0]["test_emolabels"])

    s = gain_cv_results(folds)
    assert "f1:0.6500" in s and "val:0.6000" in s

    r = {"emofscore": 0.7, "valmse": 0.5, "loss": 1.0}
    assert gain_metric_from_results(r, "emoval") == overall_metric(0.7, 0.5)
    assert gain_metric_from_results(r, "val") == -0.5
    assert gain_metric_from_results(r, "loss") == -1.0

    assert average_folds_for_vals([{"x": 1}], "test") == ([], [])
