"""Oracle-compatible rounding.

DuckDB's ``round()`` rounds half away from zero; ``np.round`` and
Python's ``round`` are banker's half-to-even.  On exact binary ties
(e.g. 42.4653125 at 6 digits) the two diverge in the last digit, which
fails bit-exact oracle comparison.  Every engine column that an oracle
rounds must go through :func:`round_half_away`.
"""

from __future__ import annotations

import numpy as np


def round_half_away(arr, ndigits: int = 6) -> np.ndarray:
    """Elementwise round-half-away-from-zero; NaN passes through."""
    arr = np.asarray(arr, dtype=np.float64)
    scale = 10.0 ** ndigits
    with np.errstate(invalid="ignore"):
        return np.where(np.isnan(arr), arr,
                        np.sign(arr) * np.floor(np.abs(arr) * scale + 0.5) / scale)


def round_half_away_scalar(x: float, ndigits: int = 6) -> float:
    if x != x:  # NaN
        return x
    scale = 10.0 ** ndigits
    return float(np.sign(x) * np.floor(abs(x) * scale + 0.5) / scale)
