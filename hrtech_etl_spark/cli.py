"""CLI entry point: ``python -m hrtech_etl_spark.cli pull|push ...``.

Mirrors the reference's Typer CLI (``cli.py:46-103``): JSON
``--where`` / ``--having`` condition lists, cursor flags, dotted or
registered formatter references, dry-run — driving the declarative
DataFrame pipelines instead of a batch loop. The advanced cursor is
echoed as JSON (reference ``cli.py:80-91``) and checkpointed to
``--state-dir`` for resumable incremental runs.
"""

from __future__ import annotations

import argparse
import importlib
import json
import sys
from typing import Optional, Sequence

from pyspark.sql import SparkSession
from pyspark.sql.functions import col as F_col

from hrtech_etl_spark import pipeline as pl
from hrtech_etl_spark.connectors import get_connector_instance
from hrtech_etl_spark.core.state import CursorStore, cursor_to_json, resume_cursor
from hrtech_etl_spark.core.types import Condition, Cursor, CursorMode, Resource, SortOrder


def _parse_conditions(raw: Optional[str]) -> list[Condition]:
    """JSON ``[{"field":f,"op":o,"value":v}]`` → Conditions (reference
    ``cli.py:22-43``)."""
    if not raw:
        return []
    return [
        Condition(field=c["field"], op=c["op"], value=c.get("value"))
        for c in json.loads(raw)
    ]


def _resolve_mapping(raw: Optional[str]):
    """``--formatter`` accepts inline JSON mapping specs, a registered
    formatter id, or a dotted ``pkg.mod.SPEC`` path (reference dynamic
    import — ``cli.py:74-78``)."""
    if not raw:
        return None
    if raw.lstrip().startswith("["):
        return json.loads(raw)
    from hrtech_etl_spark.plans.mapping import FORMATTER_REGISTRY

    if raw in FORMATTER_REGISTRY:
        return FORMATTER_REGISTRY[raw]
    mod, _, attr = raw.rpartition(".")
    return getattr(importlib.import_module(mod), attr)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="hrtech-etl-spark")
    sub = p.add_subparsers(dest="command", required=True)

    def common(sp):
        sp.add_argument("--resource", required=True, choices=[r.value for r in Resource])
        sp.add_argument("--origin", required=True, help="registered connector name or dataset path")
        sp.add_argument("--target", help="registered connector name or dataset path")
        sp.add_argument("--where", help="JSON condition list (pushed)")
        sp.add_argument("--having", help="JSON condition list (residual)")
        sp.add_argument("--formatter", help="inline JSON mapping, registered id, or dotted path")
        sp.add_argument("--dry-run", action="store_true")

    pull = sub.add_parser("pull", help="incremental origin→target pull")
    common(pull)
    pull.add_argument("--cursor-mode", default="updated_at", choices=[m.value for m in CursorMode])
    pull.add_argument("--cursor-col", help="column driving the scan (defaults to cursor mode name)")
    pull.add_argument("--uid-col", default="uid", help="unique tie-break column")
    pull.add_argument("--cursor-start")
    pull.add_argument("--cursor-sort-by", default="asc", choices=["asc", "desc"])
    pull.add_argument("--state-dir", help="cursor checkpoint dir (resume + persist)")
    pull.add_argument("--pipeline-key", default="default", help="checkpoint key within --state-dir")

    push = sub.add_parser("push", help="RESOURCES- or EVENTS-mode push")
    common(push)
    push.add_argument(
        "--mode", default="resources", choices=["resources", "events"],
        help="reference push(mode=...) — events mode joins an event "
             "feed against the origin resources (core/pipeline.py:121-178)",
    )
    push.add_argument(
        "--events-json",
        help="EVENTS mode: inline JSON list of event objects, or "
             "@/path/to/file.json",
    )
    push.add_argument(
        "--event-key", help="event field naming the resource id "
        "(default: <resource>_id, the reference's event.job_id/profile_id)",
    )
    push.add_argument(
        "--resource-key", default="uid",
        help="resource id column the events reference",
    )
    push.add_argument(
        "--order-cols", default="",
        help="comma list of event columns breaking last-wins dedup ties",
    )

    return p


def _parse_events(spark, raw: str, event_key: str):
    """``--events-json`` → DataFrame: inline JSON list or @file.

    Each row is stamped with ``__feed_seq__`` (its position in the
    feed) so last-wins dedup has a deterministic total order even when
    duplicate events carry different payloads — the reference's dict
    overwrite keeps the LAST occurrence in feed order
    (``core/pipeline.py:141-143``), and feed position is the only
    tiebreak that reproduces that."""
    if raw.startswith("@"):
        with open(raw[1:]) as fh:
            payload = json.load(fh)
    else:
        payload = json.loads(raw)
    if not isinstance(payload, list) or not payload:
        raise SystemExit("--events-json must be a non-empty JSON list")
    non_obj = [i for i, e in enumerate(payload) if not isinstance(e, dict)]
    if non_obj:
        raise SystemExit(
            f"--events-json rows {non_obj} are not JSON objects"
        )
    missing = [i for i, e in enumerate(payload) if event_key not in e]
    if missing:
        raise SystemExit(
            f"--events-json rows {missing} lack event key '{event_key}'"
        )
    return spark.createDataFrame(
        [{**e, "__feed_seq__": i} for i, e in enumerate(payload)]
    )


def main(argv: Optional[Sequence[str]] = None, spark: Optional[SparkSession] = None) -> int:
    args = build_parser().parse_args(argv)
    if spark is None:
        from hrtech_etl_spark.core.session import get_spark

        spark = get_spark(app_name="hrtech-etl-spark-cli")

    resource = Resource(args.resource)
    origin = get_connector_instance(args.origin)
    source = origin.read_resource(spark, resource)
    where = _parse_conditions(args.where)
    having = _parse_conditions(args.having)
    mapping = _resolve_mapping(args.formatter)
    target = get_connector_instance(args.target) if args.target else None

    if args.command == "pull":
        cursor_col = args.cursor_col or args.cursor_mode
        store = CursorStore(args.state_dir) if args.state_dir else None
        cursor = resume_cursor(
            store,
            args.pipeline_key,
            Cursor(
                mode=CursorMode(args.cursor_mode),
                start=args.cursor_start,
                sort_by=SortOrder(args.cursor_sort_by),
            ),
        )
        result = pl.pull(
            source,
            cursor=cursor,
            cursor_col=cursor_col,
            uid_col=args.uid_col,
            where=where,
            having=having,
            mapping=mapping,
            dry_run=args.dry_run,
        )
        if target is not None and not args.dry_run:
            target.write_resource(result.dataframe, resource)
        if store:
            store.save(args.pipeline_key, result.cursor)
        print(cursor_to_json(result.cursor))
        return 0

    if args.mode == "events":
        # EVENTS-mode push (reference core/pipeline.py:121-178): the
        # inline event feed is deduped last-wins, point-looked-up
        # against the origin resources (broadcast semi prefilter — a
        # handful of events never shuffles the resource table), HAVING
        # filtered, formatted, and pushed; all counters ride the one
        # observed sink pass.
        from hrtech_etl_spark.operators.events import push_events

        if not args.events_json:
            raise SystemExit("push --mode events requires --events-json")
        event_key = args.event_key or f"{resource.value}_id"
        events_df = _parse_events(spark, args.events_json, event_key)
        # feed position is ALWAYS the final tiebreak: user order columns
        # may tie, and the reference's dict-overwrite semantics resolve
        # ties by feed order (last occurrence wins)
        order_cols = [
            F_col(c.strip()) for c in args.order_cols.split(",") if c.strip()
        ] + [F_col("__feed_seq__")]
        metrics = push_events(
            events_df,
            source,
            event_key=event_key,
            resource_key=args.resource_key,
            order_cols=order_cols,
            drop_after_dedup=("__feed_seq__",),
            having=having,
            prefilter_resources=True,
            mapping=mapping,
            sink_writer=(
                (lambda out: target.write_resource(out, resource))
                if target is not None
                else None
            ),
            dry_run=args.dry_run,
        )
        print(json.dumps(metrics))
        return 0

    # push: one observed pass — the target write IS the metrics pass
    metrics = pl.push_resources(
        source,
        having=having,
        mapping=mapping,
        sink_writer=(
            (lambda out: target.write_resource(out, resource))
            if target is not None
            else None
        ),
        dry_run=args.dry_run,
    )
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    sys.exit(main())
