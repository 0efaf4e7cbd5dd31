"""CMU-MOSEI evaluation metrics.

The reference's model-selection metric suite lives in a root ``metric.py``
that is *absent from the public snapshot* (imported at
``main_frame_val_text_missing.py:39``, used at ``:366-367``); only the binary
ACC/F1 helper survives (``toolkit/dataloader/cmumosei.py:149-163``) plus the
``fscore - 0.25*mse`` combiner (``toolkit/utils/metric.py:9-11``). We
re-derive ``eval_mosei_metric`` from the standard CMU-MOSEI definition
(MAE / Pearson corr / Acc-7 / Acc-2 / weighted-F1 on non-zero labels); the
dict exposes the ``mae`` and ``f1`` keys the driver selects on
(``main_frame_val_text_missing.py:369,378``).

Everything here is plain numpy on host — these run once per epoch on small
arrays; the per-step device-side accumulation lives in train/step.py.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _f1_weighted(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """Weighted binary F1 without a sklearn dependency on the hot path."""
    f1s, weights = [], []
    for cls in (False, True):
        tp = float(np.sum((y_pred == cls) & (y_true == cls)))
        fp = float(np.sum((y_pred == cls) & (y_true != cls)))
        fn = float(np.sum((y_pred != cls) & (y_true == cls)))
        support = float(np.sum(y_true == cls))
        precision = tp / (tp + fp) if (tp + fp) > 0 else 0.0
        recall = tp / (tp + fn) if (tp + fn) > 0 else 0.0
        f1 = 2 * precision * recall / (precision + recall) if (precision + recall) > 0 else 0.0
        f1s.append(f1)
        weights.append(support)
    total = sum(weights)
    if total == 0:
        return 0.0
    return float(sum(f * w for f, w in zip(f1s, weights)) / total)


def multiclass_acc(preds: np.ndarray, truths: np.ndarray) -> float:
    return float(np.sum(np.round(preds) == np.round(truths)) / max(len(truths), 1))


def eval_mosei_metric(preds, labels, names=None) -> Dict[str, float]:
    """Standard CMU-MOSEI valence regression metric suite.

    Args:
      preds: ``[N]`` or ``[N, 1]`` predicted valence.
      labels: ``[N]`` or ``[N, 1]`` ground-truth valence in ``[-3, 3]``.
      names: optional clip names (accepted for reference call-signature
        parity, ``main_frame_val_text_missing.py:366``; unused).

    Returns a dict with ``mse, mae, corr, acc7, acc5, acc2, f1`` plus the
    has-zero variants ``acc2_has0, f1_has0``.
    """
    preds = np.asarray(preds, dtype=np.float64).reshape(-1)
    labels = np.asarray(labels, dtype=np.float64).reshape(-1)
    assert preds.shape == labels.shape, (preds.shape, labels.shape)

    mse = float(np.mean((preds - labels) ** 2))
    mae = float(np.mean(np.abs(preds - labels)))

    if len(preds) > 1 and np.std(preds) > 0 and np.std(labels) > 0:
        corr = float(np.corrcoef(preds, labels)[0, 1])
    else:
        corr = 0.0

    a7_preds = np.clip(preds, -3.0, 3.0)
    a7_labels = np.clip(labels, -3.0, 3.0)
    acc7 = multiclass_acc(a7_preds, a7_labels)
    a5_preds = np.clip(preds, -2.0, 2.0)
    a5_labels = np.clip(labels, -2.0, 2.0)
    acc5 = multiclass_acc(a5_preds, a5_labels)

    # Acc-2 / F1 over non-zero labels (negative vs positive) — matches the
    # surviving helper toolkit/dataloader/cmumosei.py:151-153.
    non_zeros = labels != 0
    if np.any(non_zeros):
        bin_true = labels[non_zeros] > 0
        bin_pred = preds[non_zeros] > 0
        acc2 = float(np.mean(bin_true == bin_pred))
        f1 = _f1_weighted(bin_true, bin_pred)
    else:
        acc2, f1 = 0.0, 0.0

    # has-zero variant: negative vs non-negative over all samples.
    bin_true0 = labels >= 0
    bin_pred0 = preds >= 0
    acc2_has0 = float(np.mean(bin_true0 == bin_pred0))
    f1_has0 = _f1_weighted(bin_true0, bin_pred0)

    return {
        "mse": mse,
        "mae": mae,
        "corr": corr,
        "acc7": acc7,
        "acc5": acc5,
        "acc2": acc2,
        "f1": f1,
        "acc2_has0": acc2_has0,
        "f1_has0": f1_has0,
    }


def overall_metric(emo_fscore: float, val_mse: float) -> float:
    """Combined selection score (reference: toolkit/utils/metric.py:9-11)."""
    return emo_fscore - val_mse * 0.25


def calculate_binary_results(val_preds: np.ndarray, val_labels: np.ndarray):
    """Binary ACC/F1 on non-zero labels (reference:
    toolkit/dataloader/cmumosei.py:149-163)."""
    val_preds = np.asarray(val_preds).reshape(-1)
    val_labels = np.asarray(val_labels).reshape(-1)
    non_zeros = val_labels != 0
    bin_true = val_labels[non_zeros] > 0
    bin_pred = val_preds[non_zeros] > 0
    acc = float(np.mean(bin_true == bin_pred)) if np.any(non_zeros) else 0.0
    f1 = _f1_weighted(bin_true, bin_pred) if np.any(non_zeros) else 0.0
    return {
        "valpreds": val_preds,
        "vallabels": val_labels,
        "emoacc": acc,
        "emofscore": f1,
    }


def gain_metric_from_results(eval_results: dict, metric_name: str = "emoval") -> float:
    """Scalar model-selection metric (reference toolkit/utils/metric.py:15-32):
    'emoval' = fscore - 0.25*mse, 'emo' = fscore, 'val' = -mse,
    'loss' = -loss."""
    if metric_name == "emoval":
        return overall_metric(eval_results["emofscore"], eval_results["valmse"])
    if metric_name == "emo":
        return eval_results["emofscore"]
    if metric_name == "val":
        return -eval_results["valmse"]
    if metric_name == "loss":
        return -eval_results["loss"]
    raise KeyError(metric_name)


def gain_cv_results(folder_save) -> str:
    """Mean of per-fold eval metrics, formatted like the reference's
    ablation-log summary (toolkit/utils/metric.py:35-54). Only keys present
    in the fold dicts appear."""
    outputs = []
    for key, tag in (("eval_emofscore", "f1"), ("eval_emoacc", "acc"),
                     ("eval_valmse", "val")):
        if key in folder_save[0]:
            outputs.append(
                f"{tag}:{float(np.mean([f[key] for f in folder_save])):.4f}")
    return "_".join(outputs)


def average_folds_for_vals(folder_save, testname: str):
    """Average valence predictions across folds; all test loaders iterate
    unshuffled so rows align (reference toolkit/utils/metric.py:82-99).
    Returns (labels, averaged_preds) or ([], []) when absent."""
    key_l, key_p = f"{testname}_vallabels", f"{testname}_valpreds"
    if key_l not in folder_save[0]:
        return [], []
    labels = folder_save[0][key_l]
    preds = np.mean([np.asarray(f[key_p]) for f in folder_save], axis=0)
    return labels, preds


def average_folds_for_emos(folder_save, testname: str):
    """Average emotion probabilities across folds (reference :57-79)."""
    key_l, key_p = f"{testname}_emolabels", f"{testname}_emoprobs"
    if key_l not in folder_save[0]:
        return [], []
    labels = folder_save[0][key_l]
    probs = np.mean([np.asarray(f[key_p]) for f in folder_save], axis=0)
    return labels, list(probs)
