"""sharetrace_giraph_spark — a PySpark-native link-graph analytics engine.

A from-scratch re-expression of the capabilities of the reference
``cwru-xlab/sharetrace-giraph`` (a Giraph/Pregel belief-propagation engine
plus a serverless ETL pipeline) as idiomatic Spark DataFrame operators:

- ``datagen``       deterministic synthetic transcripts (the input table)
- ``operators.edges``  contact/edge derivation (conv_id/tool co-occurrence)
- ``plans.superstep``  checkpointed BSP superstep driver (resume, lineage,
                    stats-based iteration partition sizing)
- ``algorithms``    PageRank (+ weighted / personalized), connected
                    components (frontier + pointer-doubling), label
                    propagation, triangle count (+ clustering coefficient,
                    edge Jaccard), BFS hop distance, k-core, risk
                    propagation (the reference's BP)
- ``operators``     dedup / similarity / text-analysis / multimodal surface
- ``streaming``     incremental ingestion, windowed aggregation, stateful
                    sessionization (Structured Streaming)
- ``sources``       JSON-lines reference wire format, snapshot warehouse,
                    Iceberg backend

Everything is pure DataFrame + vectorized Arrow/pandas UDFs; no per-row
Python in any hot path, no GraphFrames, no RDDs.
"""

__version__ = "0.1.0"
