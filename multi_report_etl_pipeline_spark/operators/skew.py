"""Skew-handling join: explicit key salting.

AQE's skew-join rule (on in session.py) splits oversized SORT-MERGE
partitions automatically, which covers most production skew. Salting is
the explicit fallback for the cases AQE cannot fix: a broadcast-ineligible
dimension joined on a key where a handful of values dominate (the
classic web-corpus "null user" / "bot account" shape), or a build side
that must be replicated because the skewed key's rows exceed one
executor's memory.

Mechanics (standard n-way replication):
- fact side: each row gets a uniform salt in [0, n_salts) — the hot key's
  rows spread over n_salts partitions instead of one;
- dim side: every row is replicated n_salts times (posexplode of a salt
  array), so each (key, salt) fact partition finds its dim row locally.
Shuffle volume: fact unchanged, dim × n_salts — choose n_salts ≈ the
skew factor, not the cluster size. Equi-join semantics are preserved
exactly (inner/left), pinned by tests/test_skew.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def _fact_salt(n_salts: int) -> Column:
    # pmod(xxhash64(rand-free row id), n) would need a unique id; a true
    # uniform random is fine for spreading and keeps the operator
    # stateless — determinism of the JOIN RESULT does not depend on salt
    # assignment, only the physical placement does
    return F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)).cast(
        "int"
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    n_salts: int = 8,
) -> DataFrame:
    """Equi-join `fact ⋈ dim` on `on`, with the fact side salted and the
    dim side replicated ``n_salts`` ways so a skewed join key cannot
    concentrate on one task. Output columns match ``fact.join(dim, on,
    how)`` exactly (the salt column never escapes)."""
    how_norm = how.lower().replace("_", "")
    if how_norm not in {"inner", "left", "leftouter", "leftsemi", "leftanti"}:
        # dim-side replication corrupts right/full-outer joins: unmatched
        # dim rows would surface n_salts times. Fail loudly.
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, not {how!r}; "
            "salt the other side for right-outer shapes"
        )
    keys = [on] if isinstance(on, str) else list(on)
    salted_fact = fact.withColumn(SALT_COL, _fact_salt(n_salts))
    replicated_dim = dim.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_fact.join(replicated_dim, [*keys, SALT_COL], how).drop(SALT_COL)
