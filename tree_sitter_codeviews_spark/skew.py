"""Explicit skew handling: hot-cell detection, salting, z-order repartitioning.

The engine's data has the same pathology as the reference's global-name
fallback join (``SDFG_c.py:1344-1358``): a few keys (urban-core cells there,
global function names in the reference) attract a large share of the matches.
AQE's skew-join split is the first line of defense (enabled in ``session.py``)
but it only splits *join* partitions; hot keys in aggregations and the
candidate fan-out of containment joins need explicit treatment:

1. **hot_keys** — a cheap pre-pass ``groupBy(key).count()`` (one shuffle of
   key+count only, map-side combined) that finds keys above a frequency
   threshold. At 10^12 rows this pre-pass reads only the key column
   (column-pruned scan) and returns a handful of keys to the driver.
2. **salted_join** — replicate the (small) dim rows ``n_salt`` ways for hot
   keys only, salt the big side by a *deterministic* hash of a stable id
   (never ``rand()`` — retries must produce identical rows, the same
   discipline as the reference's content-derived keys,
   ``custom_parser.py:45-57``), join on (key, salt). The dim stays broadcast
   (map-side join, no shuffle of the big side); the salt's job is to keep
   any single *downstream* partition from holding a whole hot cell.
3. **salted_count** — two-stage aggregation: partial count per (key, salt),
   then final sum per key. The partial shuffle spreads each hot key over
   ``n_salt`` reducers; the final stage shuffles only ``n_salt`` rows/key.
4. **zorder_repartition** — ``repartitionByRange`` on the Hilbert index
   (``s2.py``) so each output partition is a spatially contiguous tile:
   containment joins then touch few polygon cover groups per partition and
   parquet row-group min/max stats on the cell column become selective
   (partition pruning at read time).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import s2


def hot_keys(
    df: DataFrame,
    key_col: str,
    threshold_frac: float = 0.001,
    max_keys: int = 64,
) -> list:
    """Keys holding more than ``threshold_frac`` of all rows (driver-side
    list, bounded by ``max_keys`` — a broadcast-sized artifact by design).

    Single pass over the big table: the total is a scalar aggregate of the
    per-key counts, broadcast back onto the key table (round-1 finding:
    ``df.count()`` + ``groupBy().count()`` read the data twice; round-2
    finding: ``sum over Window.partitionBy()`` shuffles the ENTIRE per-key
    table through one partition — a single-task bottleneck when the key is
    high-cardinality). The scalar agg's final exchange moves one partial row
    per partition, not the key table; Catalyst's ReuseExchange dedups the
    shared ``groupBy`` shuffle between the two branches, so the big table is
    still scanned once."""
    rows = (
        hot_keys_df(df, key_col, threshold_frac)
        .orderBy(F.col("count").desc())
        .limit(max_keys)
        .collect()
    )
    return [r[key_col] for r in rows]


def hot_keys_df(df: DataFrame, key_col: str, threshold_frac: float) -> DataFrame:
    """The hot-key plan as a DataFrame (``hot_keys`` minus the driver fetch);
    exposed so tests can pin the physical plan (no unpartitioned Window)."""
    per_key = df.groupBy(key_col).count()
    total_df = per_key.agg(F.sum("count").alias("_total"))
    return (
        per_key.join(F.broadcast(total_df))
        .filter(F.col("count") > threshold_frac * F.col("_total"))
        .drop("_total")
    )


def salted_join(
    big: DataFrame,
    dim: DataFrame,
    key: str,
    hot: list,
    salt_col: Column,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Broadcast join with hot keys spread over ``n_salt`` salts.

    ``salt_col`` must be a deterministic expression over big-side columns
    (e.g. ``F.xxhash64("doc_id")``) so retries and parallelism changes
    reproduce identical salting. Non-hot keys use salt 0 (dim rows are NOT
    replicated for them — replication cost is paid only where needed).
    """
    if not hot:
        return big.join(F.broadcast(dim), key, how)
    hot_lit = F.array(*[F.lit(h) for h in hot])
    big_s = big.withColumn(
        "_salt",
        F.when(
            F.array_contains(hot_lit, F.col(key)),
            F.pmod(salt_col, F.lit(n_salt)),
        ).otherwise(F.lit(0)).cast("int"),
    )
    dim_s = dim.withColumn(
        "_salts",
        F.when(
            F.array_contains(hot_lit, F.col(key)),
            F.sequence(F.lit(0), F.lit(n_salt - 1)),
        ).otherwise(F.array(F.lit(0))),
    ).withColumn("_salt", F.explode("_salts")).drop("_salts")
    return big_s.join(F.broadcast(dim_s), [key, "_salt"], how).drop("_salt")


def salted_count(
    df: DataFrame,
    keys: list[str],
    salt_col: Column,
    n_salt: int = 32,
    count_alias: str = "n_docs",
) -> DataFrame:
    """Two-stage skew-proof count: groupBy(keys, salt) -> groupBy(keys).

    Result is identical to ``groupBy(keys).count()``; the physical plan
    differs — no single reducer ever owns a whole hot key."""
    partial = (
        df.withColumn("_salt", F.pmod(salt_col, F.lit(n_salt)).cast("int"))
        .groupBy(*keys, "_salt")
        .agg(F.count("*").alias("_c"))
    )
    return partial.groupBy(*keys).agg(F.sum("_c").alias(count_alias))


def zorder_repartition(
    df: DataFrame,
    gx_col: str = "gx",
    gy_col: str = "gy",
    grid_res: int = 10,
    num_partitions: int | None = None,
    keep_key: bool = False,
) -> DataFrame:
    """Hilbert (z-order) range repartitioning of a points/pages table.

    The north rule's layout step: after this, each partition covers a
    contiguous stretch of the Hilbert curve — a compact spatial tile.
    The key is computed by the branchless JVM transform (no Python).
    """
    keyed = df.withColumns({
        "_zx": s2.upscale_grid_col(F.col(gx_col), grid_res, s2.S2_RES),
        "_zy": s2.upscale_grid_col(F.col(gy_col), grid_res, s2.S2_RES),
    })
    keyed = s2.with_hilbert_col(keyed, "_zx", "_zy", s2.S2_RES, out="_hilbert").drop("_zx", "_zy")
    out = (
        keyed.repartitionByRange(num_partitions, "_hilbert")
        if num_partitions
        else keyed.repartitionByRange("_hilbert")
    )
    return out if keep_key else out.drop("_hilbert")
