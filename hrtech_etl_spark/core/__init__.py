"""Core abstractions: typed query algebra, schemas, session, expression compiler."""
