"""Sources & sinks: parquet/JSON/CSV loaders, testdata catalog, REST source."""

from hrtech_etl_spark.sources.testdata import load_table, load_tables, register_views

__all__ = ["load_table", "load_tables", "register_views"]
