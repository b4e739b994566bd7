"""Golden feature-map comparison — reference common_def.py:71-101 parity.

The reference's ``expected_result`` hook stores ``{name: (prec, dims,
ndarray)}`` records (golden maps captured from real OpenVINO) and prints a
colored per-node pass/fail line (``compare_results``,
common_def.py:71-101, green=match red=mismatch).  Both compiled and
interpreter backends here accept that tuple form AND a bare ndarray.
"""

from __future__ import annotations

import numpy as np

_GREEN, _RED, _RESET = "\x1b[32m", "\x1b[31m", "\x1b[0m"


def golden_array(want) -> np.ndarray:
    """Unwrap an expected_result entry: (prec, dims, ndarray) or ndarray."""
    if isinstance(want, tuple) and len(want) == 3:
        _prec, dims, arr = want
        arr = np.asarray(arr)
        return arr.reshape(tuple(dims)) if dims else arr
    return np.asarray(want)


def compare_golden(
    name: str, got: np.ndarray, want, rtol: float = 1.0,
    verbose: bool = False,
) -> bool:
    """allclose against a golden entry with the reference's colored output."""
    arr = golden_array(want).astype(np.asarray(got).dtype, copy=False)
    ok = bool(np.allclose(got, arr, rtol=rtol))
    if verbose:
        col = _GREEN if ok else _RED
        print(f"{col}{name} : {np.asarray(got).shape} / {arr.shape} "
              f"{'MATCH' if ok else 'MISMATCH'}{_RESET}")
    return ok
