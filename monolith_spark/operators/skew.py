"""Manual skew mitigation: salted equi-joins.

AQE's skew-join handling (enabled in session.py) splits oversized
shuffle partitions at runtime, which covers most skew. Salting is the
explicit fallback for the pathological case AQE can't fix: ONE join
key so hot that even a split partition exceeds executor memory, or a
skewed aggregation upstream of the join. The transform:

  left  (skewed, big):  salt = h(row) mod n      — spreads each hot
                                                    key over n tasks
  right (smaller):      replicated n× with salt = 0..n-1
  join on (key, salt)   — identical result set to join on key

Result equality holds for inner / left_outer / left_semi joins
(every left row still meets exactly one replica of each matching
right row); right/full joins would duplicate unmatched right rows
and are rejected.

The salt on the left can be ANY value in [0, n) — correctness does
not depend on which; a deterministic `salt_src` column keeps runs
reproducible. Cost model: right side grows n×; worth it only when
the hot key's row count ≫ a task's capacity. At 100 TB with n=16 and
a dim-sized right side, the replication is megabytes against a
shuffle-partition rebalance measured in hours.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    n_salts: int = 8,
    salt_src: str | Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `left` (skewed side) to `right`, spreading each join
    key over `n_salts` shuffle partitions. `salt_src`: any column/expr
    of `left` to derive the salt from (defaults to a per-row id; only
    reproducibility, never correctness, depends on it)."""
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi"):
        raise ValueError(f"salted_join supports inner/left/left_semi, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if salt_src is None:
        salt_expr = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    else:
        src = F.col(salt_src) if isinstance(salt_src, str) else salt_src
        salt_expr = F.pmod(F.xxhash64(src), F.lit(n_salts))
    salted_left = left.withColumn(_SALT, salt_expr.cast("int"))
    salted_right = right.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_left.join(salted_right, keys + [_SALT], how).drop(_SALT)
