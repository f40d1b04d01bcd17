"""Structured Streaming operators over the events table."""

from . import events, sinks  # noqa: F401
