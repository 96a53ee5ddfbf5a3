"""Query-planning layer: SQL shim (DDL/DML routing), view replay, and
incremental materialized-view maintenance (PosDelta/NegDelta)."""
