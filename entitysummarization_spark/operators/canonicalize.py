"""Canonicalization — skew-aware aggregation of extracted triples.

The reference canonicalizes by interning every string into HashMaps in one
JVM (src/esum/EntityProc.java:338-347,846-886). Distributed, the same step
is a groupBy over keys whose distribution is heavily skewed (head entities
like `java.util.List` / DBpedia `United_States` appear in ~30% of docs —
FIXTURES.md §1). Spark's hash aggregate already does a map-side partial
combine; for the pathological case (few giant keys, high-cardinality
payload aggs) we add an explicit two-phase *salted* aggregation so no
single reducer owns a head key, plus AQE skew handling session-wide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def salted_count(
    df: DataFrame,
    keys: list[str],
    n_salt: int = 32,
    count_col: str = "freq",
) -> DataFrame:
    """Two-phase skew-safe count: groupBy(salt, keys) → groupBy(keys).

    Salt is deterministic (crc32 of the whole row's concat) so results are
    reproducible; at 100 TB the first phase bounds any one task's share of a
    head key to ~1/n_salt of its rows.
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.crc32(F.concat_ws("\x1f", *df.columns)), F.lit(n_salt))
    )
    partial = salted.groupBy("_salt", *keys).agg(F.count("*").alias("_pc"))
    return partial.groupBy(*keys).agg(F.sum("_pc").cast("long").alias(count_col))


def canonical_triples(triples: DataFrame, use_salt: bool = False) -> DataFrame:
    """Distinct (subj, pred, obj) with occurrence counts across provenance.

    The A1 'fact bag' aggregation (EntityProc.java:846-886) — one triple row
    per canonical fact, freq = #files asserting it.

    Skew note: for an ALGEBRAIC agg like count, Spark's hash aggregate
    already does a map-side partial combine, so a head key (`United_States`
    / `java.util.List`-class objects) arrives at its reducer as ≤1 partial
    row per map task — the same bound explicit salting would give, with
    ONE shuffle instead of two. ``use_salt=True`` switches to the two-phase
    `salted_count` plan, which is the right shape when the payload agg is
    holistic (collect_set of provenance, exact distinct counts) and
    map-side combine can't shrink the head key.
    """
    if use_salt:
        return salted_count(triples, ["subj", "pred", "obj"], count_col="freq")
    return triples.groupBy("subj", "pred", "obj").agg(
        F.count("*").cast("long").alias("freq")
    )


def dense_ids(df: DataFrame, col: str, id_col: str) -> DataFrame:
    """Deterministic dense string→long dictionary.

    The reference assigns IDs in first-seen file order
    (EntityProc.java:338-347) — meaningless under parallel scan order, so we
    assign by sorted name (documented deviation; the mapping stays bijective,
    which is all the model needs). Returns (col, id_col).

    Scale note: a global row_number over one ordered partition serializes at
    the final window — acceptable because dictionaries are dims (≤ ~10M
    rows), and the zipWithIndex alternative loses determinism under AQE.
    """
    w = Window.orderBy(col)
    return (
        df.select(col).distinct()
        .withColumn(id_col, F.row_number().over(w).cast("long") - 1)
    )
