from .registry import queries, oracle_sql  # noqa: F401
