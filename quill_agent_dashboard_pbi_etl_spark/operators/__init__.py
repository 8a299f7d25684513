"""Relational + pipeline operators: dedup, gates, rollups, star joins,
similarity search, text analysis."""
