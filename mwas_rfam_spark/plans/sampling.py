"""S13 — stratified synthetic MWAS input (SURVEY.md §2.1).

The reference samples 10 BioProjects per power-of-2 size bucket from the
live catalog and assigns random group ∈ {A,B,C} and quantifier ∈
{0, 1000} (main/bioproject_sampling.py:55-92). This version is fully
deterministic — bucket rank replaces random.sample, and group/quantifier
derive from md5(run) ascii arithmetic — so the generator itself is
oracle-checkable in ANSI SQL and reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

GROUPS = ["A", "B", "C"]


def stratified_synthetic_input(catalog_df: DataFrame, per_bucket: int = 2) -> DataFrame:
    """(run, group, quantifier) over a stratified bioproject sample.

    BioProjects bucket by floor(log2(n_runs)); the top ``per_bucket`` per
    bucket (by n_runs desc, name asc — deterministic) contribute all
    their runs. Group/quantifier are hash-derived per run.
    """
    sizes = catalog_df.groupBy("bio_project").agg(F.count("*").alias("n_runs"))
    w = Window.partitionBy("bucket").orderBy(F.desc("n_runs"), F.asc("bio_project"))
    keep = (
        sizes.withColumn("bucket", F.floor(F.log2("n_runs")))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= per_bucket)
        .select("bio_project")
    )
    runs = catalog_df.join(keep, "bio_project", "left_semi")
    h = F.md5("run")
    group = F.element_at(
        F.array(*[F.lit(g) for g in GROUPS]),
        (F.ascii(F.substring(h, 1, 1)) % 3 + 1).cast("int"),
    )
    quantifier = (F.ascii(F.substring(h, 2, 1)) % 2).cast("double") * 1000.0
    return runs.select(
        "run", group.alias("group"), quantifier.alias("quantifier")
    )


def stratified_sample_exact(
    df: DataFrame,
    strata_col: str,
    k_per_stratum: int,
    id_col: str,
) -> DataFrame:
    """EXACT deterministic stratified sample: the k rows per stratum with
    the smallest md5(id) — the training-data-mix primitive.

    ``df.sampleBy`` gives only approximate per-stratum fractions and is
    seed-order sensitive; hash-rank sampling is exact (min(k, |stratum|)
    rows, always), engine-independent (same rows on any cluster layout,
    reproducible in ANSI SQL), and stable under resampling — growing k
    keeps every previously selected row (hash order is a fixed total
    order per stratum), which is what incremental mix tuning needs.

    Implemented two-phase like ``top_k_per_group``: a stratum window's
    parallelism is the stratum count (a 3-label corpus at 100 TB would be
    3 single-task sorts), so each task keeps its local k smallest hashes
    per stratum first (narrow, no shuffle) and the exact window ranks the
    ≤ k × n_partitions survivors. (md5(id), id) is a total order, so the
    output is identical to the one-window form.
    """
    order = [F.md5(F.col(id_col).cast("string")), F.col(id_col)]
    w_local = Window.partitionBy(strata_col, F.spark_partition_id()).orderBy(*order)
    cand = (
        df.withColumn("_local_rank", F.row_number().over(w_local))
        .where(F.col("_local_rank") <= k_per_stratum)
        .drop("_local_rank")
    )
    w = Window.partitionBy(strata_col).orderBy(*order)
    return (
        cand.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .where(F.col("sample_rank") <= k_per_stratum)
    )
