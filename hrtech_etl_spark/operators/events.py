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

from hrtech_etl_spark.core.expressions import apply_conditions
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
    """EVENTS-mode push as one distributed plan.

    last-wins dedup per resource id (reference's dict overwrite,
    ``core/pipeline.py:141-143``) → lookup join → missing accounting →
    having filter → sink. Metrics come from conditional counts over the
    joined frame — one job, not one count() per branch.
    """
    total_events = events.count()
    deduped = last_wins_dedup(events, event_key, order_cols)
    matched, missing = event_lookup_join(
        deduped,
        resources,
        event_key=event_key,
        resource_key=resource_key,
        broadcast_resources=broadcast_resources,
    )
    fetched = matched.count()
    skipped_missing = missing.count()
    pushed_df = apply_conditions(matched, having)
    pushed = pushed_df.count()
    if sink_path and not dry_run:
        pushed_df.write.format(sink_format).mode("append").save(sink_path)
    return {
        "total_events": int(total_events),
        "total_resources_fetched": int(fetched),
        "total_resources_pushed": int(pushed),
        "skipped_missing": int(skipped_missing),
        "skipped_having": int(fetched - pushed),
        "errors": [],
    }
