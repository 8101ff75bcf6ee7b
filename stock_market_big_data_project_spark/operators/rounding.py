"""Shared guard for the float64-fast-path / exact-decimal contract.

Several vectorized Arrow stages (PQ encode, IVF assign) compute a
distance/dot in float64 and emit ``np.round(value, 9)``, with a
Decimal fallback that reproduces Spark's ``round(·, 9)`` (HALF_UP over
an exact DECIMAL sum) digit for digit. The fast path is only trusted
when it provably agrees with the exact path; this module decides when
it might not.

Two hazards exist for a scaled value ``s = value * 1e9``:

1. **Grid hazard** — ``s`` within float error of an integer: the
   float64 sum and the exact decimal sum can land on opposite sides of
   a 1e-9 grid point, changing the 9th digit.
2. **Half hazard** — ``frac(s)`` near 0.5: ``np.round`` rounds
   half-to-even while Spark rounds HALF_UP, so they disagree at the
   boundary even on IDENTICAL sums (e.g. 2.3857221045 → np.round gives
   …104, HALF_UP gives …105), and float error can flip which side of
   .5 the fast path sees.

Round-4 shipped only hazard 1; the round-4 advisor exhibited a
counterexample for hazard 2 (ADVICE.md r4, pq.py finding). Both are
now guarded here, shared by every fast path.
"""

from __future__ import annotations

import numpy as np

#: proximity (in units of 1e-9 of the value) within which the fast
#: path defers to the exact-decimal computation. Generous vs the
#: ~1e-16 relative float64 error of the sums involved.
_EPS = 1e-5


def ambiguous_round9(best: np.ndarray) -> np.ndarray:
    """Boolean mask of rows where ``np.round(best, 9)`` may diverge
    from Spark's exact-decimal ``round(best, 9)`` (HALF_UP).

    Flags values whose 1e-9-scaled image is within ``_EPS`` of an
    integer (grid hazard) or of a half-integer (half hazard — the
    np.round half-to-even vs HALF_UP divergence). Callers OR this with
    their own argmin-margin ambiguity mask.
    """
    scaled = np.asarray(best, dtype=np.float64) * 1e9
    frac = np.abs(scaled - np.rint(scaled))
    half = np.abs((scaled - np.floor(scaled)) - 0.5)
    return (frac < _EPS) | (half < _EPS)
