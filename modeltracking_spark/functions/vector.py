"""Embedding vector math over ``array<float>`` columns (SURVEY.md §2.12).

Built on higher-order functions (``zip_with`` / ``aggregate``) so the dot
products run JVM-side per row with no shuffle and no Python. Elements are
cast float→double (exact) before multiplying.

Fixed-point variants are provided for oracle-checkable queries: an
integer-scaled sum is order-independent and therefore bit-identical
across engines, unlike a double accumulation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _acc_double(arr: Column) -> Column:
    return F.aggregate(
        arr, F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ as double (left-fold in array order)."""
    prods = F.zip_with(
        _col(a), _col(b), lambda x, y: x.cast("double") * y.cast("double")
    )
    return _acc_double(prods)


def l2_norm(a: Column | str) -> Column:
    """‖a‖₂ as double."""
    sq = F.transform(_col(a), lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(_acc_double(sq))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a, b) as double (NaN-free: 0 when either norm is 0)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot_product(a, b) / denom)


# ---------------------------------------------------------------------------
# fixed-point (oracle-exact) variants
# ---------------------------------------------------------------------------

FXP_SCALE = 10**12  # products are O(1); 64 terms * 1e12 << 2^63


def dot_product_fxp(a: Column | str, b: Column | str) -> Column:
    """Σ round(aᵢ·bᵢ·1e12) as bigint — order-independent integer sum.

    Divide by :data:`FXP_SCALE` to recover the double value; used where a
    DuckDB oracle must hash-match exactly.
    """
    prods = F.zip_with(
        _col(a),
        _col(b),
        lambda x, y: F.round(x.cast("double") * y.cast("double") * F.lit(FXP_SCALE)).cast(
            "long"
        ),
    )
    return F.aggregate(prods, F.lit(0).cast("long"), lambda acc, x: acc + x)


def sq_norm_fxp(a: Column | str) -> Column:
    """Σ round(aᵢ²·1e12) as bigint (fixed-point squared norm)."""
    return dot_product_fxp(a, a)
