"""Skew- and shuffle-topology utilities for 100 TB joins.

AQE's skew-join splitting handles most skew at runtime; these cover the
two cases it can't:

- :func:`salted_join` — when one join key is so hot a single post-split
  partition still floods one task (the classic power-law key), salt the
  big side into ``n`` sub-keys and replicate the small side across the
  salts. Deterministic (hash-of-row salt), result-identical to the plain
  join.
- :func:`write_bucketed` — pre-shuffle at write time: two tables bucketed
  by the same key and count join with **zero** exchanges at read time
  (asserted in tests/test_skew.py). This is the Spark-native answer to
  "we join on this key every day"; the shuffle is paid once, not per
  query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with the big side salted
    ``n_salts`` ways.

    The big side gets a deterministic per-row salt (xxhash64 of the whole
    row, mod n); the small side is exploded once per salt value, so every
    (key, salt) bucket finds its match. The hot key's rows now spread
    across ``n_salts`` reducers instead of one. Output equals the unsalted
    join exactly (salt columns are internal).
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    b = big.withColumn("__salt", salt.cast("int"))
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = b.join(s, [key, "__salt"], how)
    return out.drop("__salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    n_buckets: int = 16,
    sort_by: str | None = None,
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by ``key``:
    co-located, shuffle-free joins and aggregations for every future
    reader keyed on ``key``.

    Written through an explicit location (``session.table_location``,
    r11 verdict #3) so the files land in the engine's temp warehouse
    under ANY caller's session — a bare managed ``saveAsTable`` grew
    ``./spark-warehouse`` in cwd when the caller's session (the round
    driver's) set no warehouse dir."""
    from similarity_search_with_hadoop_mapreduce_spark.session import (
        table_location,
        tidy_default_warehouse,
    )

    w = (
        df.write.mode("overwrite")
        .option("path", table_location(table_name))
        .bucketBy(n_buckets, key)
    )
    if sort_by:
        w = w.sortBy(sort_by)
    w.saveAsTable(table_name)
    tidy_default_warehouse(df.sparkSession)
