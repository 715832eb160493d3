"""Relational + event operators (joins, aggregations, windows, set ops, top-k)."""
