"""Logical plan builders: mapping-spec projections, formatter registry."""

from hrtech_etl_spark.plans.mapping import (
    FORMATTER_REGISTRY,
    apply_mapping,
    build_mapping_projection,
    register_formatter,
)

__all__ = [
    "FORMATTER_REGISTRY",
    "apply_mapping",
    "build_mapping_projection",
    "register_formatter",
]
