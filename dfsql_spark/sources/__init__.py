"""Readers (file-backed tables) and writers (distributed sinks)."""

from . import tables, writers  # noqa: F401
