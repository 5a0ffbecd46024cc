from .readers import (  # noqa: F401
    SCHEMAS,
    TRAFFIC_SIGNS_SCHEMA,
    load_table,
    load_tables,
    read_text_lines,
    read_traffic_signs_csv,
)
