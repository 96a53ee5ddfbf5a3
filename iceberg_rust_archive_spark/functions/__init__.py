"""Column-level functions: Iceberg partition transforms, text analytics,
similarity math."""
