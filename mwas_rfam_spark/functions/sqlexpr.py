"""Parsed-SQL expression helpers for constant-heavy Column trees.

Building a Column operator-by-operator costs one py4j round-trip per
operator; expression trees that embed a model's constants (a centroid
matrix, a PCA rotation row, a query vector) reach thousands of
operators and were measured at 0.4-0.7 s of driver time per build —
per PLANNING, so every bench run and every re-plan pays it (r13
optimization round; see OPTIMIZATION_r13.md). Rendering the same tree
as one SQL string and parsing it JVM-side (`F.expr`) is ~500x cheaper
and yields byte-identical plans (cross-checked row-identical).
"""

from __future__ import annotations

import math


def sql_double(v: float) -> str:
    """Full-precision SQL double literal (repr round-trips float64)."""
    f = float(v)
    if math.isnan(f):
        return "cast('NaN' as double)"
    if math.isinf(f):
        return f"cast('{'-' if f < 0 else ''}Infinity' as double)"
    return f"{f!r}D"


def sql_double_array(vals) -> str:
    """SQL literal for an ARRAY<DOUBLE> constant."""
    return "array(" + ", ".join(sql_double(v) for v in vals) + ")"


def sql_dot(vec_sql: str, other_sql: str) -> str:
    """Dot product of two array expressions (same arithmetic as
    similarity._dot: elementwise double product, left-fold sum)."""
    return (
        f"aggregate(zip_with({vec_sql}, {other_sql}, "
        f"(x, y) -> cast(x as double) * cast(y as double)), "
        f"0.0D, (acc, x) -> acc + x)"
    )


def sql_norm(vec_sql: str) -> str:
    """L2 norm of an array expression (same arithmetic as
    similarity._norm)."""
    return (
        f"sqrt(aggregate({vec_sql}, 0.0D, "
        f"(a, x) -> a + cast(x as double) * cast(x as double)))"
    )


def sql_sq_l2(vec_sql: str, other_sql: str) -> str:
    """Squared L2 distance between two array expressions (same
    arithmetic as assign_ivf_cells' expression path)."""
    return (
        f"aggregate(zip_with({vec_sql}, {other_sql}, "
        f"(a, b) -> (cast(a as double) - b) * (cast(a as double) - b)), "
        f"0.0D, (acc, x) -> acc + x)"
    )
