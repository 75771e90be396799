"""Pipeline specification — the engine's "query language".

The reference's query language is its YAML config
(config/migration-config.example.yaml); Jackson maps it onto
Config{sourceDB, targetDB, tables[], threadCount, printStatusEveryXSeconds}
(Config.java:30-54) with per-table TableMigrationDefinition
(TableMigrationDefinition.java:17-139).  This module is the same IR for the
Spark engine: YAML/dict -> dataclasses, with the reference's field names and
defaults preserved so existing configs translate 1:1.

Fields that exist purely to drive the reference's hand-rolled executor
(pageSize, timeouts, parallelWriteRowCount, pauseMillisBetweenPages,
rowsProcessBatchSize) are accepted and carried as *hints*: in Spark they map
to source/sink options (partitioning, trigger rate, connector throughput),
not to execution code.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

try:
    import yaml
except ImportError:  # pragma: no cover - yaml ships with the image
    yaml = None


@dataclass
class FilterDef:
    """One row-set filter in the chain (TableDataFilterDefinition.java).

    ``expression`` is MVEL text (translated via plans.mvel), Spark SQL, or
    — with ``language: python`` — a plugin reference (registered name or
    ``module:function``, plans.plugins; the IRowSetFilter custom-class
    analog).  ``max_rows_batch_size`` is accepted for config parity; Spark
    has no batch-size coupling (MigrateTableTask.java:183-203 is obsolete
    here).
    """

    expression: str
    language: str = "mvel"  # "mvel" | "sql" | "python"
    max_rows_batch_size: int | None = None

    def to_sql(self) -> str:
        from .mvel import translate_mvel

        return translate_mvel(self.expression) if self.language == "mvel" else self.expression


@dataclass
class TableMigration:
    """One source->target table pipeline (TableMigrationDefinition.java:17-139).

    Defaults mirror the reference exactly:
      simulate_only=True  (TMD:40-48 — dry-run is the DEFAULT),
      page_size=1000      (TMD:75),
      insert_only_if_not_exist=False (TMD:106-119),
      respect_ttl=False   (TMD:70).
    ``continue_on_row_error`` is mandatory in the reference
    (MigrateTableTask.java:168-169); we keep it required-at-validate.
    """

    table_name: str
    target_table_name: str | None = None
    key_columns: list[str] = field(default_factory=list)
    simulate_only: bool = True
    where_clause: str | None = None  # pushdown predicate (DMP:207-210)
    max_read_row_count: int = 0  # 0 = unlimited (DMP:211-214)
    max_write_row_count: int = 0  # 0 = unlimited (MTT:566-569)
    respect_ttl: bool = False
    source_default_ttl: int | None = None  # table-level TTL (CSU:90-96)
    target_default_ttl: int | None = None
    filters: list[FilterDef] = field(default_factory=list)
    calculated_columns: dict[str, str] = field(default_factory=dict)  # DMP:43-63
    insert_only_if_not_exist: bool = False  # K2 / LWT semantics
    counter_columns: list[str] = field(default_factory=list)  # K3 additive merge
    continue_on_row_error: bool | None = None  # T5; mandatory
    # Executor hints, parity-only (see module docstring):
    page_size: int = 1000
    parallel_write_row_count: int = 1
    pause_millis_between_pages: int = 0
    read_query_timeout_millis: int = 20000
    write_query_timeout_millis: int = 20000

    @property
    def target(self) -> str:
        return self.target_table_name or self.table_name

    def validate(self) -> None:
        if self.continue_on_row_error is None:
            # MigrateTableTask.java:168-169: "continueOnRowError is mandatory"
            raise ValueError(
                f"table {self.table_name}: continue_on_row_error must be set explicitly"
            )
        if self.insert_only_if_not_exist and self.counter_columns:
            # TMD:112-114: LWT not supported on counter tables
            raise ValueError(
                f"table {self.table_name}: insert_only_if_not_exist is not "
                "supported together with counter columns"
            )


@dataclass
class PipelineSpec:
    """Whole job (Config.java:30-54)."""

    tables: list[TableMigration]
    source: dict[str, Any] = field(default_factory=dict)  # DBDefinition parity
    target: dict[str, Any] = field(default_factory=dict)
    thread_count: int = 1  # Config:49
    print_status_every_x_seconds: int = 60  # Config:54

    def validate(self) -> None:
        for t in self.tables:
            t.validate()


_TMD_KEYS = {
    "tableName": "table_name",
    "targetTableName": "target_table_name",
    "keyColumns": "key_columns",
    "simulateOnly": "simulate_only",
    "whereClause": "where_clause",
    "maxReadRowCount": "max_read_row_count",
    "maxWriteRowCount": "max_write_row_count",
    "respectTTL": "respect_ttl",
    "sourceDefaultTTL": "source_default_ttl",
    "targetDefaultTTL": "target_default_ttl",
    "insertOnlyIfNotExist": "insert_only_if_not_exist",
    "dataFilters": "filters",
    "counterColumns": "counter_columns",
    "continueOnRowError": "continue_on_row_error",
    "pageSize": "page_size",
    "parallelWriteRowCount": "parallel_write_row_count",
    "pauseMillisBetweenPages": "pause_millis_between_pages",
    "readQueryTimeoutMillis": "read_query_timeout_millis",
    "writeQueryTimeoutMillis": "write_query_timeout_millis",
}


def _snake(d: dict[str, Any], keymap: dict[str, str]) -> dict[str, Any]:
    out: dict[str, Any] = {}
    for k, v in d.items():
        out[keymap.get(k, k)] = v
    return out


def _parse_table(d: dict[str, Any]) -> TableMigration:
    d = _snake(dict(d), _TMD_KEYS)
    raw_filters = d.pop("filters", [])
    filters = []
    for f in raw_filters:
        if isinstance(f, str):
            filters.append(FilterDef(expression=f))
        else:
            f = dict(f)
            filters.append(
                FilterDef(
                    expression=f.get("expression") or f.get("options", {}).get("expression"),
                    language=f.get("language", "mvel"),
                    max_rows_batch_size=f.get("maxRowsBatchSize") or f.get("max_rows_batch_size"),
                )
            )

    # The reference's exact filter spelling (migration-config.example.yaml:
    # 52-57, 93-96): dataFilterDefinitions with a filterClass + filterOptions.
    for f in d.pop("dataFilterDefinitions", d.pop("data_filter_definitions", [])) or []:
        cls = f.get("filterClass", "")
        opts = f.get("filterOptions", {}) or {}
        if cls.endswith("FieldValueFilter") or "mvelRule" in opts:
            if "mvelRule" not in opts:
                raise ValueError(
                    f"filterClass {cls!r} requires filterOptions.mvelRule "
                    "(FieldValueFilter.java:52-64)"
                )
            filters.append(
                FilterDef(
                    expression=opts["mvelRule"],
                    language="mvel",
                    max_rows_batch_size=f.get("maxRowsBatchSize"),
                )
            )
        elif cls.endswith("IfNotExistFilter"):
            # the in-memory existence filter IS the anti-join (J1/F4)
            d["insert_only_if_not_exist"] = True
        else:
            raise ValueError(
                f"unknown filterClass {cls!r}: port the Java filter to a "
                "python plugin and reference it as language: python"
            )

    calc = d.pop("calculatedColumns", None) or d.pop("calculated_columns", {}) or {}
    # reference nests calculatedColumns under migratorPlugin.options (DMP:43-63)
    plugin = d.pop("migratorPlugin", None) or d.pop("migrator_plugin", None)
    if plugin and isinstance(plugin, dict):
        calc = {**(plugin.get("options", {}).get("calculatedColumns", {}) or {}), **calc}

    # ... and the exact reference spelling (YAML:105-120): a LIST of
    # {columnName, mvelExpression} under migratorPluginDefinition.migratorOptions
    mpd = d.pop("migratorPluginDefinition", None) or d.pop("migrator_plugin_definition", None)
    if mpd and isinstance(mpd, dict):
        cls = mpd.get("migratorPluginClass", "")
        if cls and not cls.endswith("DefaultMigratorPlugin"):
            raise ValueError(
                f"unknown migratorPluginClass {cls!r}: port the Java plugin "
                "to a python transform (plans.plugins.register_transform)"
            )
        for cc in (mpd.get("migratorOptions", {}) or {}).get("calculatedColumns", []) or []:
            calc = {**calc, cc["columnName"]: cc["mvelExpression"]}

    return TableMigration(filters=filters, calculated_columns=dict(calc), **d)


def load_spec(source: str | dict[str, Any]) -> PipelineSpec:
    """Parse a YAML string / path / dict into a PipelineSpec.

    Mirrors Config.parseFromYamlFile / parseFromYaml (Config.java:15-25).
    """
    if isinstance(source, str):
        if yaml is None:
            raise RuntimeError("pyyaml not available")
        if "\n" not in source and source.endswith((".yaml", ".yml")):
            with open(source) as fh:
                data = yaml.safe_load(fh)
        else:
            data = yaml.safe_load(source)
    else:
        data = source
    data = dict(data)
    tables = [_parse_table(t) for t in data.get("tables", [])]
    spec = PipelineSpec(
        tables=tables,
        source=data.get("sourceDB", data.get("source", {})) or {},
        target=data.get("targetDB", data.get("target", {})) or {},
        thread_count=data.get("threadCount", data.get("thread_count", 1)),
        print_status_every_x_seconds=data.get(
            "printStatusEveryXSeconds", data.get("print_status_every_x_seconds", 60)
        ),
    )
    spec.validate()
    return spec
