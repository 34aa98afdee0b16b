"""Reference-API compatibility shim for consts.py getters (consts.py:12-45).

New code should use `core.config.ParamBounds` / `METRIC_NAMES`; this module
exists so code written against the reference's `consts` interface ports
without edits.
"""

from __future__ import annotations

from .config import METRIC_LABELS, METRIC_NAMES, ParamBounds

_BOUNDS = ParamBounds()


def get_lower_bound_l() -> int:
    return _BOUNDS.lower_l


def get_upper_bound_l() -> int:
    return _BOUNDS.upper_l


def get_lower_bound_n() -> int:
    return _BOUNDS.lower_n


def get_upper_bound_n() -> int:
    return _BOUNDS.upper_n


def get_lower_bound_p() -> float:
    return _BOUNDS.lower_p


def get_upper_bound_p() -> float:
    return _BOUNDS.upper_p


def get_big_n() -> int:
    return _BOUNDS.big_n


def get_metrics() -> list[str]:
    return list(METRIC_NAMES)


def get_metric_labels() -> list[str]:
    return list(METRIC_LABELS)
