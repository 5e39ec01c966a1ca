"""Structured Streaming operators (event-time windows, watermarks, state)."""
