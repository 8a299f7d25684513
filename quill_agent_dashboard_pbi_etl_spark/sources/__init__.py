"""Source connectors: parquet tables, JSON replay, roster snapshots, and the
driver-testdata → webhook-shape mapping."""
