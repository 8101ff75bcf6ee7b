"""Driver-side precomputation of the deterministic LSH hyperplanes.

The hyperplane components are md5-derived constants (operators/similarity.py)
— computing md5 per (vector × plane × dimension) at runtime is pure waste.
hashlib.md5 produces the identical hex as Spark's and DuckDB's md5, so the
components are materialized once here and shipped as array literals inside
the plan (a few KB — far below broadcast thresholds).
"""

from __future__ import annotations

import hashlib
from functools import lru_cache


def hyperplane_component(plane: int, dim: int, prefix: str = "") -> float:
    """Identical to the SQL formula:
    (CAST('0x'||substr(md5(prefix||p||','||d),1,15) AS BIGINT) % 1e6) / 1e6 - 0.5."""
    h = hashlib.md5(f"{prefix}{plane},{dim}".encode()).hexdigest()
    return (int(h[:15], 16) % 1_000_000) / 1_000_000.0 - 0.5


@lru_cache(maxsize=None)
def hyperplanes(
    n_planes: int, n_dims: int, prefix: str = ""
) -> tuple[tuple[float, ...], ...]:
    return tuple(
        tuple(hyperplane_component(p, d, prefix) for d in range(n_dims))
        for p in range(n_planes)
    )
