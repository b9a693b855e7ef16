from .registry import build_queries, build_oracle_sql  # noqa: F401
