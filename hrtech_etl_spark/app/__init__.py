"""HTTP facade over the engine (reference ``app/api.py``)."""

from hrtech_etl_spark.app.api import create_app, serve

__all__ = ["create_app", "serve"]
