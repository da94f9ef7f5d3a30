"""Output sinks: partitioned graph tables with lineage (north-rule S6)."""

from .graph import (  # noqa: F401
    LINEAGE_SCHEMA,
    read_graph_table,
    read_lineage,
    write_graph_table,
)
