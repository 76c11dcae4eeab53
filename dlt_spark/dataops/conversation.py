"""Conversation / dialog assembly from event streams.

Chat-model training data starts as flat interaction logs (one row per
message/action) and must be reassembled into ordered conversations with
turn structure before it can be formatted for SFT: sessionize, order
deterministically, collapse consecutive same-role messages into turns,
and QC the role alternation.  The reference engine has no such operator
— beyond-reference dataop (SURVEY §2.L).

Scale design (100 TB of raw events):

- One shuffle on the conversation key (``user``), then every stage —
  session split, turn segmentation, violation counting, transcript
  build — is window/aggregate work INSIDE that partitioning; Spark
  reuses the single Exchange across the stacked windows.
- The transcript is assembled per conversation with ``sort_array`` over
  collected ``(ts, id, role)`` structs — array sort inside the hash
  aggregate, deterministic regardless of partition layout; no global
  sort, no ``collect``.
- Per-conversation arrays are bounded by conversation length (operator
  contract, same as any groupBy collect) — sessions are capped by the
  gap split, not unbounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assemble_conversations(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    role_col: str,
    id_col: str,
    gap_minutes: float = 30.0,
) -> DataFrame:
    """One row per conversation: ``(user, session_seq, n_messages,
    n_turns, n_violations, started_at, ended_at, transcript)``.

    - a conversation = a gap-bounded session (> ``gap_minutes`` of
      silence starts a new one);
    - messages are ordered by ``(ts, id)`` (the id breaks timestamp
      ties deterministically);
    - a TURN = a maximal run of consecutive messages with the same
      role (standard chat-format collapsing);
    - ``n_violations`` counts adjacent same-role message pairs — the
      alternation QC signal an SFT formatter gates on;
    - ``transcript`` is the ordered ``role`` sequence joined with
      ``>`` (schema-level smoke of the ordering; formatting to a chat
      template is a downstream map).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    gap_ms = int(gap_minutes * 60_000)
    # exact integer epoch-ms (a double true-division here would diverge
    # from the oracle's epoch_ms for pre-epoch timestamps)
    ts_ms = F.unix_millis(F.col(ts_col))
    prev_ms = F.lag(ts_ms).over(w)
    is_start = F.when(
        prev_ms.isNull() | ((ts_ms - prev_ms) > gap_ms), 1
    ).otherwise(0)
    prev_role = F.lag(F.col(role_col)).over(w)
    sess = (
        df.withColumn("_start", is_start)
        .withColumn("_same_role", (F.col(role_col) == prev_role).cast("int"))
        .withColumn(
            "_session_seq",
            F.sum("_start").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    # turn boundaries: a session start OR a role change; same-role
    # adjacency WITHIN a session is an alternation violation
    turn_start = F.when(
        (F.col("_start") == 1) | (F.coalesce(F.col("_same_role"), F.lit(0)) == 0), 1
    ).otherwise(0)
    viol = F.when(
        (F.col("_start") == 0) & (F.col("_same_role") == 1), 1
    ).otherwise(0)
    marked = sess.withColumn("_turn_start", turn_start).withColumn("_viol", viol)
    return (
        marked.groupBy(F.col(user_col).alias("user"), F.col("_session_seq").alias("session_seq"))
        .agg(
            F.count(F.lit(1)).alias("n_messages"),
            F.sum("_turn_start").alias("n_turns"),
            F.sum("_viol").alias("n_violations"),
            F.min(ts_col).alias("started_at"),
            F.max(ts_col).alias("ended_at"),
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct(
                                F.col(ts_col).alias("ts"),
                                F.col(id_col).alias("id"),
                                F.col(role_col).alias("role"),
                            )
                        )
                    ),
                    lambda m: m["role"],
                ),
                ">",
            ).alias("transcript"),
        )
    )
