"""Mergeable sketches for approximate distributed aggregation.

HyperLogLog (Flajolet et al. 2007, with the small-range linear-counting
correction) in the partial/combine shape every other aggregate here uses:
per-batch register arrays are the partials, register-wise ``max`` is the
combiner — associative and commutative, so pre-reduce and salted two-stage
shuffles are safe, and the exchange carries ``m`` bytes per (key, batch)
regardless of row count.  This is the 100 TB path for COUNT(DISTINCT);
``relational.distinct_count_by`` is the exact twin a SQL oracle can verify.
"""

from __future__ import annotations

import numpy as np

from .hashing import stable_hash_array


def _clz64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized count-leading-zeros for uint64 (binary search over
    shift widths — no float rounding hazards)."""
    n = np.zeros(x.shape, dtype=np.int64)
    y = x.copy()
    for s in (32, 16, 8, 4, 2, 1):
        zero_top = (y >> np.uint64(64 - s)) == 0
        n[zero_top] += s
        y[zero_top] <<= np.uint64(s)
    n[x == 0] = 64
    return n


def hll_partial(values, p: int = 12) -> np.ndarray:
    """Registers (uint8[2**p]) for one batch of values."""
    m = 1 << p
    h = stable_hash_array(values)
    reg_idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)
    # rank = leading zeros of the remaining (64-p)-bit stream, +1; capped
    rank = np.minimum(_clz64(rest) + 1, 64 - p + 1).astype(np.uint8)
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, reg_idx, rank)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    """Cardinality estimate with the standard small-range correction."""
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            return m * np.log(m / zeros)
    return float(est)
