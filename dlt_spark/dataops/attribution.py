"""Multi-touch conversion attribution.

First/last-touch (single-touch) attribution lives in the headline
query set; this module adds the LINEAR multi-touch model: every
conversion splits one unit of credit equally across all touches in its
journey (the touches since the previous conversion).  Beyond-reference
dataop (SURVEY §2.L).

Scale design:

- One union stream per user ordered once (`ts, kind, id`) — journeys
  fall out of a running conversion count; no self-join, no
  per-conversion rescan of the touch history (same plan family as the
  first/last-touch query).
- Credit is INTEGER micro-units: ``credit = 1e6 div n_touches`` with
  the division remainder assigned to the journey's FIRST touch, so
  every converted journey contributes exactly 1,000,000 micro-units and
  all aggregates are order-independent BIGINT sums — engine-exact.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_MICRO = 1_000_000


def linear_attribution(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
    conversion_types: Sequence[str],
    touch_types: Sequence[str],
    type_col: str = "event_type",
) -> DataFrame:
    """Linear multi-touch attribution over an event stream.

    Returns one row per touch type: ``(touch_type, n_touches,
    n_journeys, credit_micro)`` where ``credit_micro`` sums the equal
    splits of every converted journey (remainder to the journey's first
    touch).  Same-timestamp conversions sort BEFORE touches (strictly-
    before semantics, matching the first/last-touch query); journeys
    with no conversion after them (trailing touches) earn nothing.
    """
    conv = F.col(type_col).isin(*conversion_types)
    stream = df.filter(
        F.col(type_col).isin(*(list(conversion_types) + list(touch_types)))
    ).select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
        F.col(type_col).alias("_t"),
        F.when(conv, F.lit(0)).otherwise(F.lit(1)).alias("_kind"),
    )
    w = Window.partitionBy("_u").orderBy("_ts", "_kind", "_id")
    # running conversion count: for a touch row this is the index of the
    # conversion that will consume it; for a conversion row, (count-1)
    numbered = stream.withColumn(
        "_convs",
        F.sum(F.when(F.col("_kind") == 0, 1).otherwise(0)).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).withColumn(
        "_journey",
        F.when(F.col("_kind") == 0, F.col("_convs") - 1).otherwise(F.col("_convs")),
    )
    touches = numbered.filter(F.col("_kind") == 1)
    convs = numbered.filter(F.col("_kind") == 0).select(
        "_u", F.col("_journey").alias("_j")
    )
    # only journeys that END in a conversion earn credit
    credited = touches.join(
        convs, (touches["_u"] == convs["_u"]) & (touches["_journey"] == convs["_j"]),
        "left_semi",
    )
    jw = Window.partitionBy("_u", "_journey")
    order_w = jw.orderBy("_ts", "_kind", "_id")
    sized = credited.withColumn("_n", F.count(F.lit(1)).over(jw)).withColumn(
        "_rn", F.row_number().over(order_w)
    )
    base = F.expr(f"{_MICRO}L div _n")
    rem = F.lit(_MICRO) - F.col("_n") * base
    credit = F.when(F.col("_rn") == 1, base + rem).otherwise(base)
    return (
        sized.select("_t", "_u", "_journey", credit.alias("_c"))
        .groupBy(F.col("_t").alias("touch_type"))
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.countDistinct("_u", "_journey").alias("n_journeys"),
            F.sum("_c").cast("bigint").alias("credit_micro"),
        )
    )
