"""Scalar expression layer: every reference transformation as native Spark
columns (zero Python UDFs — SURVEY.md §2.8)."""
