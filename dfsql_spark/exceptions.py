"""Exception hierarchy, mirroring the reference exactly.

Reference (dfsql/exceptions.py:1-14): a ``DfsqlException`` root with
three leaves — ``SQLParsingException`` (the SQL text didn't parse),
``CommandException`` (a DDL/utility command was malformed or failed),
``QueryExecutionException`` (engine-level failure: unknown table or
column, unsupported operation, bad catalog state).  Callers that catch
parse errors separately from execution errors rely on this split
(reference tests/test_interface.py:91-97).

Here the parse/analyze work happens inside Spark, so the mapping is:
``pyspark.errors.ParseException`` → :class:`SQLParsingException`,
``pyspark.errors.AnalysisException`` → :class:`QueryExecutionException`,
command-layer failures → :class:`CommandException`.  The originating
Spark exception is always chained as ``__cause__``.
"""


class DfsqlException(Exception):
    """Root of the engine's exception hierarchy."""


class SQLParsingException(DfsqlException):
    """The SQL text could not be parsed."""


class CommandException(DfsqlException):
    """A command (CREATE/DROP/SHOW/COPY) was malformed or failed."""


class QueryExecutionException(DfsqlException):
    """Engine-level failure: unknown table/column, bad catalog state,
    unsupported operation."""
