"""I/O: operator file parsing helpers and structured outputs."""
