"""Evaluation metrics — the reference's SRCC/PCC + 3rd-order polynomial
MOS mapping (`/root/reference/src/training/train_triplet.py:227-228,
278-280, 294-303`)."""

from __future__ import annotations

import numpy as np
from scipy.optimize import curve_fit
from scipy.stats import pearsonr, spearmanr


def order_three(x, a, b, c, d):
    return a * x + b * x**2 + c * x**3 + d


def fit_order_three(distance: np.ndarray, mos: np.ndarray):
    """Fit Distance -> MOS; returns the mapping callable.

    With fewer than 4 points the cubic is underdetermined (scipy raises, as
    the reference would); we degrade to the identity map so evaluation still
    reports raw correlations."""
    distance = np.asarray(distance, dtype=np.float64)
    mos = np.asarray(mos, dtype=np.float64)
    if distance.size < 4:
        return lambda x: np.asarray(x)
    try:
        popt, _ = curve_fit(order_three, distance, mos)
    except (RuntimeError, TypeError, ValueError):
        return lambda x: np.asarray(x)
    a, b, c, d = popt
    return lambda x: order_three(np.asarray(x), a, b, c, d)


def srcc(x, y) -> float:
    r, _ = spearmanr(x, y)
    return float(r)


def pcc(x, y) -> float:
    r, _ = pearsonr(x, y)
    return float(r)


def correlation_report(distance, mos) -> dict:
    """SRCC/PCC raw + after 3rd-order mapping, as the reference prints."""
    mapped = fit_order_three(distance, mos)(distance)
    return {
        "SRCC": srcc(distance, mos),
        "SRCC_map": srcc(mapped, mos),
        "PCC": pcc(distance, mos),
        "PCC_map": pcc(mapped, mos),
    }
