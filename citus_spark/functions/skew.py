"""Skew mitigation for hot join keys.

The reference relies on shard granularity and connection throttling;
on Spark the first line of defense is AQE's skew-join splitting
(enabled in session defaults). `salted_join` is the explicit fallback
for the pathological case AQE can't fix — a single hot key whose hash
partition exceeds executor memory:

  large side: add salt = pmod(hash(disambiguator), n_salts)
  small side: explode each row into n_salts replicas
  join on (key, salt) → the hot key spreads over n_salts partitions.

Deterministic (salt comes from a hash of an existing column, not
rand()) so results are reproducible and retry-safe — important under
speculative execution at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    salt_source: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `large ⋈ small` on column `on`, salted `n_salts` ways.

    `salt_source`: column of `large` used to derive the salt
    (defaults to the first non-key column — any varied column works).
    The small side is replicated n_salts× (keep it genuinely small).
    """
    if how not in ("inner", "left"):
        # replicating the small side n_salts× would emit unmatched
        # small-side rows once per replica under right/full/semi
        # variants — silent duplicates. Those joins need a different
        # formulation (swap sides or dedup the null-extended rows).
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}"
        )
    if salt_source is None:
        salt_source = next(c for c in large.columns if c != on)
    lsalt = large.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_source)), F.lit(n_salts)).cast("int")
    )
    ssalt = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = lsalt.join(ssalt, [on, "_salt"], how)
    return out.drop("_salt")
