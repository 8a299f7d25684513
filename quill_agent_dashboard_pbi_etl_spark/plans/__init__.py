"""Query registry: every SURVEY.md §2 operator as a (Spark callable, DuckDB
oracle SQL) pair consumed by __spark_entry__.py."""
