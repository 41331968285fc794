"""mwas_rfam_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference MWAS engine (declanlim/mwas_rfam).

Design stance (see SURVEY.md §7): one long-form relational model, lazy
end-to-end DataFrame plans optimized by Catalyst, statistics as vectorized
pandas UDFs keyed by (bio_project, group, set_id). The reference is a
single-node pandas/numpy pipeline; this engine re-expresses every operator
Spark-first so the same workload scales to a multi-executor cluster.
"""

__version__ = "0.1.0"
