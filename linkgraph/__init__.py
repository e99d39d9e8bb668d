"""linkgraph — a PySpark-native link-graph analytics engine.

Built from scratch against the semantics of the reference engine
(BorisRado/pagerank, a C/OpenMP/OpenCL/MPI sparse-matrix PageRank code at
/root/reference) but architected Spark-first: DataFrame/Catalyst for every
relational stage, Arrow-batched numpy kernels (mapInArrow) only for the
SpMV inner loop, and a checkpoint store for mid-convergence resume.

Public surface:
    linkgraph.session          — SparkSession builder with engine defaults
    linkgraph.sources          — transcript generator / reader, edge derivation,
                                 reference edge-file format parity
    linkgraph.operators        — pagerank, components, lpa, triangles, degrees,
                                 dedup, similarity, textstats
    linkgraph.plans            — CSR shard builder (edge-balanced, hub-salted)
    linkgraph.checkpoint       — ParquetManifestStore / Iceberg-gated store
    linkgraph.oracle           — numpy reference oracles (Family-A PageRank etc.)
"""

__version__ = "0.1.0"
