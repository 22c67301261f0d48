"""Deterministic UPDATE transforms (reference K4/K5).

The reference's UPDATE workers rewrite columns with fixed deterministic
functions so refresh rounds stay verifiable: strings are REVERSEd and
numerics doubled (``batch-tool worker/util/UpdateUtil.java:198-219`` for
the string case, ``:259`` for the numeric case). Here they are plain
column expressions applied at the changelog projection before the merge
— fully codegen'd, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def update_reverse(col: Column) -> Column:
    """String update transform: REVERSE(value) (UpdateUtil.java:198-219)."""
    return F.reverse(col)


def update_double(col: Column) -> Column:
    """Numeric update transform: value * 2 (UpdateUtil.java:259)."""
    return col * F.lit(2)
