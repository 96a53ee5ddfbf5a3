"""Relational + data-pipeline operators expressed Spark-first."""
