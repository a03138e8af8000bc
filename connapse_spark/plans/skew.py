"""Skew mitigation — explicit key salting for joins whose hot keys outlive
AQE's runtime splitting.

AQE skew-join (on by default in session.get_spark) splits oversized
partitions AFTER a shuffle materializes; that rescues most skew. What it
cannot fix is a single join KEY so hot that every row of it must still meet
every matching build row — e.g. joining events to a user dimension where one
user_id carries 10% of the corpus, or a postings join on a stop-term. The
classic fix is salting: split each hot key into ``n_salts`` sub-keys
deterministically on the probe side, replicate the build side once per
salt, and join on (key, salt) — the hot key's work then spreads over
``n_salts`` tasks.

Used where a skewed equi-join is unavoidable; prefer broadcast when the
build side fits (salting a broadcastable join is pure overhead).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salt_expr(n_salts: int, *cols: Column) -> Column:
    """Deterministic salt in [0, n_salts): hash of the given columns —
    NEVER rand() (breaks retries/resume and the oracle discipline)."""
    return F.pmod(F.xxhash64(*cols), F.lit(n_salts)).cast("int")


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    n_salts: int = 8,
    salt_on: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``probe ⋈ build ON key`` with the probe side salted and the
    build side replicated ``n_salts``× (explode of a literal range — the
    build grows n_salts×, so keep it the SMALL side).

    ``salt_on``: probe columns that decide the salt (default: all probe
    columns except the key, so rows of one hot key spread evenly). The
    output drops the salt column; row multiplicity is exactly the plain
    join's for inner/left joins.
    """
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1 (got {n_salts})")
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi"):
        # right/full joins would emit every unmatched BUILD row once per salt
        raise ValueError(f"salted_join supports inner/left joins only (got {how!r})")
    salt_cols = [F.col(c) for c in (salt_on or [c for c in probe.columns if c != key])]
    if not salt_cols:  # key-only frame: fall back to spreading by the key
        salt_cols = [F.col(key)]
    p = probe.withColumn(SALT_COL, salt_expr(n_salts, *salt_cols))
    b = build.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return p.join(b, on=[key, SALT_COL], how=how).drop(SALT_COL)
