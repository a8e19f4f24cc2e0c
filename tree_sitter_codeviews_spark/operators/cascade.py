"""Cascading priority fallback join.

The reference resolves call sites against function definitions with a
priority cascade — exact signature match, then variadic match, then a fuzzy
name-only fallback, first hit wins (``codeviews/CFG/CFG_c.py:484-530``,
the coalesce at ``:498-513``). The same shape shows up in any entity
resolution pipeline (exact surface → normalized → fuzzy → default).

Engine form: a sequence of priority-ordered LEFT joins against (small) dim
tables, resolved with ``coalesce`` — every dim is broadcast, so the big side
never shuffles and the whole cascade is one map-side stage regardless of how
many fallback levels exist. A ``via`` provenance column records which level
matched (the reference's edge-annotation equivalent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cascade_join(
    big: DataFrame,
    levels: list[tuple[str, DataFrame, Column | str, str]],
    out_col: str = "resolved",
    via_col: str = "via",
    default: Column | None = None,
) -> DataFrame:
    """Resolve ``big`` against priority-ordered fallback dims.

    levels: [(label, dim, join_cond_or_key, dim_value_col), ...] in priority
    order. Each dim is LEFT-broadcast-joined; the first level whose value is
    non-null wins. ``join_cond_or_key`` is either a column name (equi-join)
    or a boolean Column over big/dim columns. Dim value columns must be
    uniquely named (they are projected to ``_cascade_<label>``).

    Result: big columns + ``out_col`` (first non-null value, else
    ``default``) + ``via_col`` (the winning level's label, else 'none').
    """
    joined = big
    val_cols: list[tuple[str, str]] = []
    for label, dim, cond, value_col in levels:
        tmp = f"_cascade_{label}"
        joined = joined.join(
            F.broadcast(dim.withColumnRenamed(value_col, tmp)),
            cond,
            "left",
        )
        val_cols.append((label, tmp))
    out = F.coalesce(
        *[F.col(c) for _, c in val_cols],
        default if default is not None else F.lit(None),
    )
    via = F.lit("none")
    for label, c in reversed(val_cols):
        via = F.when(F.col(c).isNotNull(), F.lit(label)).otherwise(via)
    return joined.withColumn(out_col, out).withColumn(via_col, via).drop(
        *[c for _, c in val_cols]
    )
