"""Structured Streaming operators: windows, watermarks, file replays."""
