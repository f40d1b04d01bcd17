"""DDL command layer: CREATE TABLE(path) / DROP TABLE / SHOW TABLES.

The reference parses these three commands with regexes *before* trying
the SQL parser (reference: dfsql/commands.py:32-128).  We keep the same
thin regex front-door; everything that actually touches data goes
through Spark.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from .datasource import DataSource


@dataclass
class Command:
    def execute(self, ds: "DataSource"):  # pragma: no cover - abstract
        raise NotImplementedError


@dataclass
class CreateTableCommand(Command):
    """``CREATE TABLE name ('/path/to/file.csv')``

    Reference semantics (dfsql/commands.py:32-63): register a
    file-backed table under ``name``; the file is read lazily.
    """

    name: str
    fpath: str

    pattern = re.compile(
        r"^\s*CREATE\s+TABLE\s+(?P<name>[A-Za-z_][\w]*)\s*"
        r"\(\s*['\"](?P<fpath>[^'\"]+)['\"]\s*\)\s*;?\s*$",
        re.IGNORECASE,
    )

    @classmethod
    def from_string(cls, sql: str) -> "CreateTableCommand | None":
        m = cls.pattern.match(sql)
        if m:
            return cls(name=m.group("name"), fpath=m.group("fpath"))
        return None

    def execute(self, ds: "DataSource"):
        ds.add_table_from_file(self.name, self.fpath)
        return "OK"


@dataclass
class DropTableCommand(Command):
    """``DROP TABLE name`` (reference: dfsql/commands.py:66-90)."""

    name: str

    pattern = re.compile(
        r"^\s*DROP\s+TABLE\s+(?P<name>[A-Za-z_][\w]*)\s*;?\s*$", re.IGNORECASE
    )

    @classmethod
    def from_string(cls, sql: str) -> "DropTableCommand | None":
        m = cls.pattern.match(sql)
        if m:
            return cls(name=m.group("name"))
        return None

    def execute(self, ds: "DataSource"):
        ds.drop_table(self.name)
        return "OK"


@dataclass
class ShowTablesCommand(Command):
    """``SHOW TABLES`` → DataFrame of (name, fpath)
    (reference: dfsql/commands.py:93-117)."""

    pattern = re.compile(r"^\s*SHOW\s+TABLES\s*;?\s*$", re.IGNORECASE)

    @classmethod
    def from_string(cls, sql: str) -> "ShowTablesCommand | None":
        if cls.pattern.match(sql):
            return cls()
        return None

    def execute(self, ds: "DataSource"):
        return ds.tables_dataframe()


@dataclass
class CopyToCommand(Command):
    """``COPY <table | (SELECT ...)> TO '<path>' [FORMAT fmt]
    [PARTITION BY (col, ...)]``

    Spark-era extension (the reference has no sinks): distributed
    write of a table or query result, never materializing on the
    driver.  See sources/writers.py for the scale knobs.
    """

    source: str
    path: str
    fmt: str
    partition_by: list[str] | None

    pattern = re.compile(
        r"^\s*COPY\s+(?P<src>\(.*\)|[A-Za-z_][\w]*)\s+TO\s+"
        r"['\"](?P<path>[^'\"]+)['\"]"
        r"(?:\s+FORMAT\s+(?P<fmt>\w+))?"
        r"(?:\s+PARTITION\s+BY\s+\(\s*(?P<parts>[^)]*?)\s*\))?"
        r"\s*;?\s*$",
        re.IGNORECASE | re.DOTALL,
    )

    @classmethod
    def from_string(cls, sql: str) -> "CopyToCommand | None":
        m = cls.pattern.match(sql)
        if not m:
            return None
        parts = m.group("parts")
        return cls(
            source=m.group("src"),
            path=m.group("path"),
            fmt=(m.group("fmt") or "parquet").lower(),
            partition_by=[p.strip() for p in parts.split(",")] if parts else None,
        )

    def execute(self, ds: "DataSource"):
        from .sources.writers import write_table

        src = self.source.strip()
        if src.startswith("("):
            df = ds.query_df(src[1:-1])
        else:
            df = ds.spark.table(src)
        write_table(df, self.path, fmt=self.fmt, partition_by=self.partition_by)
        return "OK"


@dataclass
class MergeIntoCommand(Command):
    """``MERGE INTO '<path>' USING <table | (SELECT ...)> ON (key, ...)
    [WHEN MATCHED <UPDATE|DELETE|IGNORE>] [NO INSERT] [NO VALIDATE]
    [FORMAT fmt]``

    Spark-era extension: SQL surface over
    :func:`dfsql_spark.sources.writers.merge_table` — batch upsert
    into a parquet/orc table path with one full-outer shuffle and a
    copy-on-write swap.  Defaults match MERGE conventions: matched
    rows update, unmatched source rows insert.
    """

    target_path: str
    source: str
    keys: "list[str]"
    when_matched: str
    insert: bool
    validate: bool
    fmt: str

    pattern = re.compile(
        r"^\s*MERGE\s+INTO\s+['\"](?P<path>[^'\"]+)['\"]\s+"
        r"USING\s+(?P<src>\(.*\)|[A-Za-z_][\w]*)\s+"
        r"ON\s+\(\s*(?P<keys>[^)]+?)\s*\)"
        r"(?:\s+WHEN\s+MATCHED\s+(?P<matched>UPDATE|DELETE|IGNORE))?"
        r"(?:\s+(?P<noinsert>NO\s+INSERT))?"
        r"(?:\s+(?P<novalidate>NO\s+VALIDATE))?"
        r"(?:\s+FORMAT\s+(?P<fmt>\w+))?"
        r"\s*;?\s*$",
        re.IGNORECASE | re.DOTALL,
    )

    @classmethod
    def from_string(cls, sql: str) -> "MergeIntoCommand | None":
        m = cls.pattern.match(sql)
        if not m:
            return None
        return cls(
            target_path=m.group("path"),
            source=m.group("src"),
            keys=[k.strip() for k in m.group("keys").split(",")],
            when_matched=(m.group("matched") or "update").lower(),
            insert=m.group("noinsert") is None,
            validate=m.group("novalidate") is None,
            fmt=(m.group("fmt") or "parquet").lower(),
        )

    def execute(self, ds: "DataSource"):
        from .sources.writers import merge_table

        src = self.source.strip()
        if src.startswith("("):
            df = ds.query_df(src[1:-1])
        else:
            df = ds.spark.table(src)
        merge_table(
            ds.spark,
            self.target_path,
            df,
            key=self.keys,
            when_matched=self.when_matched,
            insert_not_matched=self.insert,
            validate_unique_key=self.validate,
            fmt=self.fmt,
        )
        return "OK"


COMMANDS = (
    CreateTableCommand,
    DropTableCommand,
    ShowTablesCommand,
    CopyToCommand,
    MergeIntoCommand,
)


def try_parse_command(sql: str) -> Command | None:
    """Try each command regex; None → treat input as SQL
    (reference: dfsql/commands.py:120-128)."""
    for cmd_cls in COMMANDS:
        cmd = cmd_cls.from_string(sql)
        if cmd is not None:
            return cmd
    return None
