"""Salted joins: the manual skew-breaker for hot join keys.

AQE's skew-join splitting (on in session.py) handles skewed *shuffle
partitions* transparently, but it can only split what one key's rows allow:
a single pathological key (null, empty string, one viral user_id) still
lands every row in one task.  Salting fixes that by rewriting the join
itself:

- fact side: append a uniform random salt in [0, n_salts) to the key;
- dim side: replicate each row once per salt value;
- join on (key, salt) -- the hot key's rows now spread over n_salts tasks.

Inner/left equi-join semantics are preserved exactly (every fact row still
meets every matching dim row exactly once); right/full joins are rejected,
since an unmatched dim row would surface once per salt replica.  Use for
fact-dim joins where the dim side is small enough to replicate n_salts
times but too big to broadcast whole.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

SALT_COL = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Skew-proof equi-join of a (possibly hot-keyed) fact against a dim.

    The salt is deterministic per run (seeded rand) but carries no semantic
    meaning; it is dropped from the result.  ``n_salts`` bounds the hot key's
    per-task share at 1/n_salts of its rows.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        # right/full would emit unmatched dim rows once per salt replica
        raise ValueError(
            "salted_join preserves semantics only for inner/left joins; "
            f"got how={how!r} (salt the other side instead)"
        )
    if SALT_COL in fact.columns or SALT_COL in dim.columns:
        raise ValueError(f"{SALT_COL} column name collides with input")
    salted_fact = fact.withColumn(
        SALT_COL, (F.rand(seed) * n_salts).cast("int")
    )
    salted_dim = dim.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return (
        salted_fact.join(salted_dim, [on, SALT_COL], how).drop(SALT_COL)
    )
