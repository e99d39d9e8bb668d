from linkgraph.sources.transcripts import (  # noqa: F401
    TRANSCRIPT_SCHEMA,
    derive_edges,
    generate_transcripts,
)
from linkgraph.sources.edgefile import read_edge_file, write_edge_file  # noqa: F401
