"""Structured Streaming mode: the batch transformation graph replayed under
readStream with watermarked dedup (SURVEY.md §2.7)."""
