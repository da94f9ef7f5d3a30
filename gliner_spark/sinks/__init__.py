"""Output sinks: partitioned graph tables with lineage (north-rule S6)
and the RDF N-Triples interchange export."""

from .graph import (  # noqa: F401
    LINEAGE_SCHEMA,
    read_graph_table,
    read_lineage,
    write_graph_table,
)
from .ntriples import (  # noqa: F401
    escape_literal,
    ntriples_lines,
    write_ntriples,
)
