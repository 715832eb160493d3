"""Event-surface operators (batch form; streaming twins live in
``hrtech_etl_spark.streaming``).

Re-expresses the reference's EVENTS-mode push (``core/pipeline.py:
121-178``): parse/normalize events (unknown type → UPSERTED, malformed
→ drop — ``connectors/warehouse_a/models.py:163-215``), look up the
referenced resources, account for missing ones, and push survivors —
all as one DataFrame plan with conditional-count metrics instead of a
per-chunk Python loop.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hrtech_etl_spark.core.expressions import apply_conditions, conditions_to_column
from hrtech_etl_spark.core.types import Condition
from hrtech_etl_spark.operators.joins import event_lookup_join, last_wins_dedup

# Raw source event type → unified type. Unknown types map to
# "upserted" (reference connectors/warehouse_a/models.py:199-206).
DEFAULT_TYPE_MAP: Mapping[str, str] = {
    "job.created": "created",
    "job.updated": "updated",
    "job.deleted": "deleted",
    "job.archived": "archived",
    "profile.created": "created",
    "profile.updated": "updated",
    "profile.deleted": "deleted",
    "profile.archived": "archived",
}


def normalize_event_type(col: Column, type_map: Mapping[str, str] | None = None) -> Column:
    """CASE-map raw type strings to unified event types; unknown →
    'upserted'."""
    mapping = type_map or DEFAULT_TYPE_MAP
    expr = None
    for raw, unified in mapping.items():
        cond = col == raw
        expr = F.when(cond, unified) if expr is None else expr.when(cond, unified)
    return expr.otherwise("upserted") if expr is not None else F.lit("upserted")


def parse_events_json(spark, payloads_df: DataFrame, json_col: str, schema) -> DataFrame:
    """Permissive JSON parse + malformed-drop (the reference's
    ``from_payload`` returning None on malformed input)."""
    parsed = payloads_df.select(F.from_json(F.col(json_col), schema).alias("e"))
    return parsed.where(F.col("e").isNotNull()).select("e.*")


def push_events(
    events: DataFrame,
    resources: DataFrame,
    *,
    event_key: str,
    resource_key: str,
    order_cols: Sequence[Column],
    having: Sequence[Condition] | None = None,
    broadcast_resources: bool = False,
    sink_path: str | None = None,
    sink_format: str = "parquet",
    dry_run: bool = False,
) -> dict:
    """EVENTS-mode push as ONE distributed job, metrics included.

    last-wins dedup per resource id (reference's dict overwrite,
    ``core/pipeline.py:141-143``) → left lookup join → having filter →
    sink. All five counters ride on :class:`pyspark.sql.Observation`
    metrics collected DURING the sink pass — the joined frame is
    executed once, instead of one count() job per branch re-running
    the join (total_events is observed pre-dedup on the same lineage).
    """
    from pyspark.sql import Observation

    obs_in = Observation()
    events = events.observe(obs_in, F.count(F.lit(1)).alias("total_events"))
    deduped = last_wins_dedup(events, event_key, order_cols)

    r = F.broadcast(resources) if broadcast_resources else resources
    joined = deduped.join(r, deduped[event_key] == r[resource_key], "left")
    matched_flag = F.col(resource_key).isNotNull()
    having_col = conditions_to_column(having or [])

    obs = Observation()
    joined = joined.observe(
        obs,
        F.count(F.when(matched_flag, 1)).alias("fetched"),
        F.count(F.when(~matched_flag, 1)).alias("missing"),
        F.count(F.when(matched_flag & having_col, 1)).alias("pushed"),
    )
    pushed_df = joined.where(matched_flag & having_col)

    if sink_path and not dry_run:
        pushed_df.write.format(sink_format).mode("append").save(sink_path)
    else:
        pushed_df.count()  # dry-run still executes the plan once

    m_in, m = obs_in.get, obs.get
    return {
        "total_events": int(m_in["total_events"]),
        "total_resources_fetched": int(m["fetched"]),
        "total_resources_pushed": int(m["pushed"]),
        "skipped_missing": int(m["missing"]),
        "skipped_having": int(m["fetched"] - m["pushed"]),
        "errors": [],
    }
