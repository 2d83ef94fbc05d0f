"""Streaming ingestion (reference analogue: buffered writers + commit)."""
