from linkgraph.streaming.edges import (  # noqa: F401
    read_transcript_stream,
    stream_edge_counts,
    stream_reply_edges,
)
