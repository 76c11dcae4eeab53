"""Data-quality expectations over loaded tables — the dbt-tests /
Great-Expectations surface as a DataFrame program.  (The reference
exposes data-quality only through a closed-source hub add-on,
``dlt/hub/data_quality.py`` being a re-export shim; the open surface
here is schema contracts, which govern shape — these checks govern
VALUES.)

Checks compile into as few Spark jobs as possible:

- row-local checks (``not_null``, ``accepted_values``, ``in_range``,
  ``matches_regex``) fold into ONE wide conditional aggregation — a
  single table scan, no shuffle beyond the final 1-row agg, pure
  codegen'd ``sum(CASE WHEN ...)`` columns;
- ``unique`` is one hash aggregation on the key (map-side partials);
- ``references`` (referential integrity) is one left-anti join against
  the parent's distinct keys (AQE picks broadcast when the parent key
  set is small); SQL-FK semantics — NULL child keys pass.

Report schema: ``(check, target, metric, passed)`` — ``metric`` is the
violation count and ``passed = metric == 0``, so a healthy table
reports all-zero metrics and the report is safe to alert on with
``report.filter(~F.col("passed"))``.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def not_null(*cols: str) -> dict:
    """Violations: rows where the column IS NULL."""
    return {"kind": "not_null", "cols": list(cols)}


def accepted_values(col: str, values: Sequence) -> dict:
    """Violations: non-null values outside the accepted set (nulls are
    ``not_null``'s concern)."""
    return {"kind": "accepted_values", "col": col, "values": list(values)}


def in_range(col: str, lo, hi) -> dict:
    """Violations: non-null values outside [lo, hi]."""
    return {"kind": "in_range", "col": col, "lo": lo, "hi": hi}


def matches_regex(col: str, pattern: str) -> dict:
    """Violations: non-null values not fully matching ``pattern``."""
    return {"kind": "matches_regex", "col": col, "pattern": pattern}


def freshness(ts_col: str, max_age_seconds: float, now=None) -> dict:
    """Violation (metric 1) when the newest ``ts_col`` value is older
    than ``max_age_seconds`` before ``now`` — or the table is empty.
    ``now`` (a datetime) is injectable for deterministic tests; defaults
    to the cluster clock at evaluation time.  Folds into the same
    single-scan aggregation as the row-local checks."""
    return {
        "kind": "freshness",
        "col": ts_col,
        "max_age_seconds": float(max_age_seconds),
        "now": now,
    }


def unique(*cols: str, approx: bool = False) -> dict:
    """Violations: rows beyond the first in each duplicate key group
    (``sum(n - 1)`` over groups with n > 1); a NULL key is a group.

    The exact form is the one check that must SHUFFLE (every key moves
    once — on an all-unique 100 TB key column that is the whole table;
    measured as the dominant cost of ``dq_report`` at the 100x probe
    tier).  ``approx=True`` swaps in ``count(*) -
    approx_count_distinct`` (HLL sketch, ~2% relative error, clamped at
    0), which FOLDS INTO the same single-scan aggregation as the
    row-local checks — zero shuffle.  Use approx as the always-on
    monitor and the exact form for audits."""
    return {"kind": "unique", "cols": list(cols), "approx": bool(approx)}


def references(
    cols: Sequence[str], parent: DataFrame, parent_cols: Sequence[str]
) -> dict:
    """Violations: non-null child keys with no matching parent row
    (SQL foreign-key semantics: NULL child keys pass)."""
    return {
        "kind": "references",
        "cols": list(cols),
        "parent": parent,
        "parent_cols": list(parent_cols),
    }


def persist_report(store, report_rows, table_name: str, load_id=None) -> None:
    """Append collected report rows to the ``_dlt_dq_reports`` system
    table (driver-side control-plane append — one parquet file, no
    cluster job), stamped with the table name, a load/batch id, and the
    evaluation time.  Shared by ``Pipeline.check`` and the streaming
    monitor so batch and streaming DQ history land in ONE table."""
    import datetime as _dt

    import pyarrow as pa

    now = _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
    pa_schema = pa.schema(
        [
            ("table_name", pa.string()),
            ("load_id", pa.string()),
            ("checked_at", pa.timestamp("us")),
            ("check", pa.string()),
            ("target", pa.string()),
            ("metric", pa.int64()),
            ("passed", pa.bool_()),
        ]
    )
    store.append_rows(
        [
            {
                "table_name": table_name,
                "load_id": load_id,
                "checked_at": now,
                "check": r["check"],
                "target": r["target"],
                "metric": r["metric"],
                "passed": r["passed"],
            }
            for r in report_rows
        ],
        "_dlt_dq_reports",
        schema=pa_schema,
    )


def _row_local_violation(check: dict):
    """(target, condition Column) for a row-local check."""
    k = check["kind"]
    if k == "accepted_values":
        c = F.col(check["col"])
        return check["col"], c.isNotNull() & ~c.isin(check["values"])
    if k == "in_range":
        c = F.col(check["col"])
        return check["col"], c.isNotNull() & ((c < check["lo"]) | (c > check["hi"]))
    if k == "matches_regex":
        c = F.col(check["col"])
        return check["col"], c.isNotNull() & ~c.rlike(check["pattern"])
    raise ValueError(k)


def run_checks(df: DataFrame, checks: Sequence[dict]) -> DataFrame:
    """Evaluate ``checks`` against ``df`` and return the report
    DataFrame ``(check, target, metric, passed)`` ordered by
    (check, target).  All row-local checks share one scan."""
    # --- fold row-local + scan-aggregate checks into one wide agg ---
    local: List[Tuple[str, str, object]] = []  # (kind, target, agg expr)
    for ch in checks:
        if ch["kind"] == "not_null":
            for c in ch["cols"]:
                cond = F.col(c).isNull()
                local.append(
                    ("not_null", c, F.coalesce(F.sum(cond.cast("bigint")), F.lit(0)))
                )
        elif ch["kind"] in ("accepted_values", "in_range", "matches_regex"):
            target, cond = _row_local_violation(ch)
            local.append(
                (ch["kind"], target,
                 F.coalesce(F.sum(cond.cast("bigint")), F.lit(0)))
            )
        elif ch["kind"] == "unique" and ch.get("approx"):
            key = F.struct(*[F.col(c) for c in ch["cols"]])
            est = F.count(F.lit(1)) - F.approx_count_distinct(key)
            local.append(
                (
                    "unique_approx",
                    ",".join(ch["cols"]),
                    F.greatest(est, F.lit(0)).cast("bigint"),
                )
            )
        elif ch["kind"] == "freshness":
            now = ch["now"]
            now_expr = (
                F.lit(now) if now is not None else F.current_timestamp()
            )
            cutoff = now_expr - F.make_interval(
                secs=F.lit(ch["max_age_seconds"])
            )
            stale = (
                F.max(F.col(ch["col"])).isNull()
                | (F.max(F.col(ch["col"])) < cutoff)
            )
            local.append(
                ("freshness", ch["col"], stale.cast("bigint"))
            )

    reports: List[DataFrame] = []
    if local:
        aggs = [
            expr.alias(f"_m{i}") for i, (_, _, expr) in enumerate(local)
        ]
        wide = df.agg(*aggs)
        rows = F.array(
            *[
                F.struct(
                    F.lit(kind).alias("check"),
                    F.lit(target).alias("target"),
                    F.col(f"_m{i}").alias("metric"),
                )
                for i, (kind, target, _) in enumerate(local)
            ]
        )
        reports.append(
            wide.select(F.explode(rows).alias("r")).select(
                "r.check", "r.target", "r.metric"
            )
        )

    # --- per-check jobs ---------------------------------------------
    for ch in checks:
        if ch["kind"] == "unique" and not ch.get("approx"):
            key = ch["cols"]
            dup = (
                df.groupBy(*key)
                .agg(F.count(F.lit(1)).alias("_n"))
                .filter(F.col("_n") > 1)
                .agg(F.coalesce(F.sum(F.col("_n") - 1), F.lit(0)).alias("metric"))
            )
            reports.append(
                dup.select(
                    F.lit("unique").alias("check"),
                    F.lit(",".join(key)).alias("target"),
                    "metric",
                )
            )
        elif ch["kind"] == "references":
            key, pkey = ch["cols"], ch["parent_cols"]
            child = df.select(*key)
            for c in key:
                child = child.filter(F.col(c).isNotNull())
            parent_keys = (
                ch["parent"]
                .select(*[F.col(p).alias(c) for c, p in zip(key, pkey)])
                .distinct()
            )
            orphans = child.join(parent_keys, key, "left_anti").agg(
                F.count(F.lit(1)).alias("metric")
            )
            reports.append(
                orphans.select(
                    F.lit("references").alias("check"),
                    F.lit(",".join(key)).alias("target"),
                    "metric",
                )
            )

    out: Optional[DataFrame] = None
    for r in reports:
        out = r if out is None else out.unionByName(r)
    if out is None:
        raise ValueError("no checks given")
    return out.select(
        "check", "target", F.col("metric").cast("bigint").alias("metric"),
        (F.col("metric") == 0).alias("passed"),
    ).orderBy("check", "target")
