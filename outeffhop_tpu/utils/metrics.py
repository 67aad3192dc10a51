"""Forecasting metrics — `STanHop_time_seeries/utils/metrics.py:3-33` parity."""

from __future__ import annotations

import numpy as np


def mae(pred, true):
    return float(np.mean(np.abs(pred - true)))


def mse(pred, true):
    return float(np.mean((pred - true) ** 2))


def rmse(pred, true):
    return float(np.sqrt(mse(pred, true)))


def mape(pred, true):
    return float(np.mean(np.abs((pred - true) / true)))


def mspe(pred, true):
    return float(np.mean(np.square((pred - true) / true)))


def rse(pred, true):
    return float(
        np.sqrt(np.sum((true - pred) ** 2)) / np.sqrt(np.sum((true - true.mean()) ** 2))
    )


def corr(pred, true):
    u = ((true - true.mean(0)) * (pred - pred.mean(0))).sum(0)
    d = np.sqrt(((true - true.mean(0)) ** 2 * (pred - pred.mean(0)) ** 2).sum(0))
    return float((u / d).mean(-1))


def metric(pred, true):
    """(mae, mse, rmse, mape, mspe) tuple (`metrics.py:26-33`)."""
    return mae(pred, true), mse(pred, true), rmse(pred, true), mape(pred, true), mspe(pred, true)
