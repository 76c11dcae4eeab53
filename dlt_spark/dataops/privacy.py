"""Privacy auditing for training-data releases: k-anonymity over
quasi-identifier columns, plus the suppression step that enforces it.

Releasing event logs, user tables, or conversation corpora for training
requires knowing whether combinations of quasi-identifiers (the columns
that are individually harmless but jointly identifying — zip+age+gender
is the canonical trio, Sweeney 2002) isolate individuals.  A dataset is
k-anonymous over a QI set when every occurring QI combination is shared
by at least ``k`` rows.

Both operators are one grouped aggregation on the QI key — a single
shuffle whose cardinality is the number of DISTINCT QI combinations,
not the row count, so they run at 100 TB the same way every rollup here
does.  Suppression joins the violating key set back size-gated
(broadcast when small, shuffle when not).

Complements ``text.pii_redaction`` (value-level scrubbing inside free
text); this module handles STRUCTURAL identifiability of the released
rows themselves.  No counterpart in the reference — beyond-reference
training-data surface (SURVEY §6).
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_report(
    df: DataFrame, quasi_identifiers: Sequence[str], k: int = 5
) -> DataFrame:
    """Audit: every quasi-identifier combination occurring with fewer
    than ``k`` rows — the groups whose members a release would expose.

    Returns the QI columns plus ``group_size``, smallest groups first
    (then the QI values for a total, reproducible order).  An empty
    result means the dataset IS k-anonymous over this QI set.  NULL QI
    values form their own group, like SQL ``GROUP BY``."""
    if k < 1:
        raise ValueError("k must be >= 1")
    qi = list(quasi_identifiers)
    if not qi:
        raise ValueError("quasi_identifiers must be non-empty")
    return (
        df.groupBy(*qi)
        .agg(F.count(F.lit(1)).alias("group_size"))
        .filter(F.col("group_size") < k)
        .orderBy("group_size", *qi)
    )


def k_anonymity_stats(
    df: DataFrame, quasi_identifiers: Sequence[str], k: int = 5
) -> DataFrame:
    """One-row summary of the audit: ``(n_groups, n_violating_groups,
    n_rows, n_suppressed_rows, min_group_size)`` — the release
    dashboard number (``n_suppressed_rows`` is what enforcement would
    drop)."""
    qi = list(quasi_identifiers)
    sizes = df.groupBy(*qi).agg(F.count(F.lit(1)).alias("group_size"))
    return sizes.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum((F.col("group_size") < k).cast("bigint")).alias(
            "n_violating_groups"
        ),
        F.sum("group_size").alias("n_rows"),
        F.sum(
            F.when(F.col("group_size") < k, F.col("group_size")).otherwise(0)
        ).alias("n_suppressed_rows"),
        F.min("group_size").alias("min_group_size"),
    )


def l_diversity_report(
    df: DataFrame,
    quasi_identifiers: Sequence[str],
    sensitive_col: str,
    l: int = 2,
) -> DataFrame:
    """Audit the companion property: a k-anonymous group whose members
    all share one sensitive value still leaks it (homogeneity attack —
    Machanavajjhala 2007 l-diversity).  Reports every QI combination
    whose ``sensitive_col`` carries fewer than ``l`` DISTINCT values,
    with the group size alongside.

    One grouped count-distinct on the QI key; distinct-aggregation
    shuffle is (QI, sensitive) pairs — still group-cardinality-shaped,
    not row-shaped."""
    if l < 1:
        raise ValueError("l must be >= 1")
    qi = list(quasi_identifiers)
    if not qi:
        raise ValueError("quasi_identifiers must be non-empty")
    return (
        df.groupBy(*qi)
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.countDistinct(F.col(sensitive_col)).alias("distinct_sensitive"),
        )
        .filter(F.col("distinct_sensitive") < l)
        .orderBy("distinct_sensitive", "group_size", *qi)
    )


def suppress_small_groups(
    df: DataFrame, quasi_identifiers: Sequence[str], k: int = 5
) -> DataFrame:
    """Enforcement: drop every row whose QI combination occurs fewer
    than ``k`` times, leaving a k-anonymous table (suppression, the
    baseline mechanism; generalization hierarchies are domain-specific
    and belong to the caller).

    The violating key set is usually tiny (it is the audit result), so
    the anti-join build side stays narrow; Spark's AQE picks broadcast
    vs shuffle from its measured size."""
    qi = list(quasi_identifiers)
    violating = k_anonymity_report(df, qi, k).select(*qi)
    return df.join(violating, on=qi, how="left_anti")
