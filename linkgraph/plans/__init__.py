from linkgraph.plans.shards import ShardedGraph, tune_shuffle_partitions  # noqa: F401
