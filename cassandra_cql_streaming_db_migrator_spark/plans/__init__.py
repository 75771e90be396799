from .mvel import translate_mvel
from .spec import FilterDef, PipelineSpec, TableMigration, load_spec
from .validate import SchemaValidationError, validate_migration_schema

__all__ = [
    "FilterDef",
    "PipelineSpec",
    "TableMigration",
    "load_spec",
    "translate_mvel",
    "SchemaValidationError",
    "validate_migration_schema",
]
