"""Runtime configuration object, mirroring the reference's public
``dfsql.config.Configuration`` surface (reference: dfsql/config.py:1-17,
README.md:31-47).

The reference exposes one engine knob — ``USE_MODIN``, an
environment-variable-backed field on a ``Configuration`` class that can
also be overridden by assigning to the class attribute (its test suite
does exactly that), and inspected with ``Configuration.as_dict()``.

The Spark engine's equivalent knobs are the session/scale settings
``get_spark()`` reads.  Resolution order per field, matching the
reference's env-config behavior:

1. a plain value assigned onto the class (``Configuration.FIELD = x``,
   or a subclass attribute) wins;
2. else the field's environment variable, read at access time;
3. else the field default.

Environment variable names are unchanged from the ``session`` module so
existing deployments keep working.
"""

from __future__ import annotations

import os

__all__ = [
    "Configuration",
    "ConfigField",
    "BooleanConfig",
    "IntConfig",
    "StringConfig",
    "ConfigError",
]

_TRUE = frozenset(("1", "true", "yes", "on", "y", "t"))
_FALSE = frozenset(("0", "false", "no", "off", "n", "f", ""))


class ConfigError(ValueError):
    """Raised for unparseable configuration values."""


class ConfigField:
    """One environment-backed setting (reference: confi.ConfigField
    usage in dfsql/config.py:16-17)."""

    def __init__(self, env_var: str, default=None):
        self.env_var = env_var
        self.default = default

    def cast(self, raw: str):
        return raw

    def resolve(self):
        raw = os.environ.get(self.env_var)
        if raw is None:
            default = self.default
            return default() if callable(default) else default
        return self.cast(raw)


class StringConfig(ConfigField):
    pass


class IntConfig(ConfigField):
    def cast(self, raw: str) -> int:
        try:
            return int(raw)
        except ValueError as e:
            raise ConfigError(f"{self.env_var}={raw!r} is not an integer") from e


class BooleanConfig(ConfigField):
    def cast(self, raw: str) -> bool:
        low = raw.strip().lower()
        if low in _TRUE:
            return True
        if low in _FALSE:
            return False
        raise ConfigError(f"{self.env_var}={raw!r} is not a boolean")


class _ConfigMeta(type):
    """Resolves ``ConfigField`` class attributes on access, so
    ``Configuration.SHUFFLE_PARTITIONS`` yields the value, not the
    field object — while a plain assignment (``Configuration.X = 5`` or
    a subclass override, as the reference's tests do) short-circuits
    resolution entirely.

    Field *names* are recorded at class creation (``_field_names``), so
    a plain override replacing the ``ConfigField`` object in the class
    ``__dict__`` shadows the value but never removes the key from
    :meth:`Configuration.as_dict` — the inspection surface stays
    complete.
    """

    def __new__(mcls, name, bases, ns):
        names: set[str] = set()
        for base in bases:
            names |= set(getattr(base, "_field_names", ()))
        names |= {k for k, v in ns.items() if isinstance(v, ConfigField)}
        ns = dict(ns)
        ns["_field_names"] = frozenset(names)
        return super().__new__(mcls, name, bases, ns)

    def __getattribute__(cls, name):
        value = super().__getattribute__(name)
        if isinstance(value, ConfigField):
            return value.resolve()
        return value

    def _fields(cls) -> frozenset:
        return cls._field_names


class Configuration(metaclass=_ConfigMeta):
    """Engine configuration (Spark analogue of the reference's
    Modin/pandas engine switch).

    Fields resolve at access time; ``get_spark()`` and ``DataSource``
    read them, so ``class MyConfig(Configuration): CASE_SENSITIVE =
    False`` followed by module-level patching (the reference-test
    pattern) or a plain ``Configuration.CASE_SENSITIVE = False`` both
    take effect for sessions/datasources built afterwards.
    """

    #: Spark master URL; unset → local[$SPARK_GRAFT_CPUS]
    MASTER = StringConfig("SPARK_MASTER", default=None)
    #: core count for the default local master
    CPUS = StringConfig("SPARK_GRAFT_CPUS", default="*")
    #: shuffle parallelism (a real cluster overrides via spark-submit)
    SHUFFLE_PARTITIONS = IntConfig("SPARK_GRAFT_SHUFFLE_PARTITIONS", default=32)
    #: driver heap for single-JVM local mode
    DRIVER_MEMORY = StringConfig("SPARK_GRAFT_DRIVER_MEM", default="48g")
    #: OPT-IN scratch dir for shuffle/spill files, LOCAL masters only
    #: (unset → Spark's own default; never applies to a cluster
    #: master — spark-submit owns executor-local NVMe dirs there).
    #: The repo's bench/test harnesses set it to /dev/shm because
    #: their shuffle volumes are known-small and the test box's
    #: virtualized disk made small block files ~15× slower than
    #: tmpfs; it is not a library default because tmpfs is RAM-capped
    #: and spills there consume memory.
    LOCAL_DIR = StringConfig("SPARK_GRAFT_LOCAL_DIR", default=None)
    #: default DataSource name-resolution mode (reference default: True)
    CASE_SENSITIVE = BooleanConfig("DFSQL_CASE_SENSITIVE", default=True)
    #: adaptive query execution (runtime re-planning; the scale posture)
    ADAPTIVE_ENABLED = BooleanConfig("DFSQL_ADAPTIVE_ENABLED", default=True)
    #: Arrow for pandas interchange (sql_query / .sql accessor path)
    ARROW_ENABLED = BooleanConfig("DFSQL_ARROW_ENABLED", default=True)
    #: cache-on-access size gate: file tables larger than this many
    #: bytes are NOT auto-cached by queries (a cached table scans ALL
    #: columns into the InMemoryRelation, defeating column pruning —
    #: right for dim-sized tables, wrong for a 100 TB fact table).
    #: ``0`` disables the gate; explicit ``cache_table()`` always pins.
    AUTO_CACHE_MAX_BYTES = IntConfig("DFSQL_AUTO_CACHE_MAX_BYTES", default=1 << 30)

    @classmethod
    def as_dict(cls) -> dict:
        """Resolved view of every field (reference: README.md:45-46).
        Plain class-attribute overrides appear with their overridden
        value — the key set is fixed at class creation."""
        return {name: getattr(cls, name) for name in sorted(cls._fields())}
