"""Structured Streaming operators over the events table."""

from . import events  # noqa: F401
