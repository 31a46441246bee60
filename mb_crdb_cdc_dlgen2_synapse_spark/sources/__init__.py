from .tables import TABLE_NAMES, load_table, load_tables, register_views
from .ndjson import (
    CDC_ENVELOPE_FIELDS,
    cdc_envelope_schema,
    read_raw_lines,
    read_typed_envelopes,
)
from .changegen import generate_changefeed

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "register_views",
    "CDC_ENVELOPE_FIELDS",
    "cdc_envelope_schema",
    "read_raw_lines",
    "read_typed_envelopes",
    "generate_changefeed",
]
