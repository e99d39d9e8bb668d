from linkgraph.streaming.edges import (  # noqa: F401
    read_transcript_stream,
    stream_edge_counts,
    stream_reply_edges,
)
from linkgraph.streaming.hubs import (  # noqa: F401
    read_degree_table,
    stream_in_degree_totals,
    top_hubs_snapshot,
)
from linkgraph.streaming.components import (  # noqa: F401
    components_log,
    read_component_table,
    stream_components_maintenance,
)
from linkgraph.streaming.triangles import (  # noqa: F401
    stream_triangle_maintenance,
    triangle_total,
)
from linkgraph.streaming.rank import (  # noqa: F401
    delta_maintenance_log,
    rank_maintenance_log,
    read_rank_table,
    read_rank_table_delta,
    stream_pagerank_delta,
    stream_pagerank_maintenance,
)
from linkgraph.streaming.sketches import (  # noqa: F401
    read_cms_table,
    stream_cms_totals,
)
from linkgraph.streaming.sessions import (  # noqa: F401
    stream_sessionize,
)
from linkgraph.streaming.dedup import (  # noqa: F401
    dedup_maintenance_log,
    read_dedup_table,
    stream_exact_dedup,
)
