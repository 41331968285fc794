"""Sources (SURVEY.md §2.1): input CSV, catalog, wide-metadata melt, JSON rows.

The reference stages everything through pickles, tmpfs and s5cmd batches
(mg:132-148, 259-322); on Spark those are replaced by direct columnar scans
with Catalyst pushdown — the only "custom" source logic that survives is
schema normalization (positional rename, wide→long melt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import CATALOG_SCHEMA, INPUT_SCHEMA


def read_input_csv(spark: SparkSession, path: str) -> DataFrame:
    """S1 — user observation CSV with positional column semantics.

    The reference renames whatever 3 headers arrive to (run, group,
    quantifier) by position and type-checks them (mg:744-759). We read with
    header then rename positionally; arity is validated eagerly.
    """
    raw = spark.read.option("header", True).csv(path)
    if len(raw.columns) != 3:
        raise ValueError(
            f"input must have exactly 3 columns (run, group, quantifier); got {raw.columns}"
        )
    df = raw.toDF("run", "group", "quantifier")
    return df.select(
        F.col("run").cast("string"),
        F.col("group").cast("string"),
        F.col("quantifier").cast("double"),
    )


def input_from_rows(spark: SparkSession, rows: list[dict]) -> DataFrame:
    """S8 — JSON request ingest (reference server.py:14-55 writes a temp CSV;
    we build the DataFrame directly)."""
    return spark.createDataFrame(
        [(r["run"], r["group"], float(r["quantifier"])) for r in rows], INPUT_SCHEMA
    )


def read_catalog_parquet(spark: SparkSession, path: str) -> DataFrame:
    """S3/S4 — run→(bio_project, bio_sample, spots) catalog from a Parquet
    export. The reference queries Postgres with an IN-list pushdown
    (mg:46-54,163-184); with Parquet, Catalyst's predicate pushdown plus a
    broadcast semi-join against the input's run set achieves the same
    result without hand-built SQL strings.
    """
    return spark.read.schema(CATALOG_SCHEMA).parquet(path)


def derive_spots_if_missing(df: DataFrame) -> DataFrame:
    """S4 derived column: spots = mbases*1e6/avgspotlen (reference mg:47)
    when the raw sequencing columns are present instead of a spots column.
    No-op if `spots` already exists or the raw columns are absent."""
    if "spots" not in df.columns and {"mbases", "avgspotlen"} <= set(df.columns):
        df = df.withColumn(
            "spots",
            (F.col("mbases") * F.lit(1_000_000) / F.col("avgspotlen")).cast("long"),
        )
    return df


def catalog_from_jdbc(
    spark: SparkSession, url: str, table: str, properties: dict[str, str] | None = None
) -> DataFrame:
    """S3 JDBC variant — filters applied later are pushed into the database
    by the JDBC source (equivalent of the reference's WHERE acc IN (...))."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return derive_spots_if_missing(reader.load())


def melt_wide_metadata(df: DataFrame, bioproject: str) -> DataFrame:
    """S2 → long form: wide per-BioProject metadata → (bioproject,
    biosample_id, attribute, attr_pos, value).

    The reference keeps every BioProject as its own wide frame with a
    dynamic schema (converter_.py:33); melting to one fixed long schema
    lets a single relational plan process all ~196k BioProjects at once.
    ``attr_pos`` preserves original column order (needed for label-merge
    ordering parity in set dedup, metadata_set_maker.py:89-94).
    """
    attr_cols = [c for c in df.columns if c != "biosample_id"]
    if not attr_cols:
        raise ValueError("metadata frame has no attribute columns")
    pairs = []
    for i, c in enumerate(attr_cols):
        pairs.append(
            F.struct(
                F.lit(c).alias("attribute"),
                F.lit(i).alias("attr_pos"),
                F.col(c).cast("string").alias("value"),
            )
        )
    return (
        df.select(
            F.lit(bioproject).alias("bioproject"),
            F.col("biosample_id").cast("string"),
            F.explode(F.array(*pairs)).alias("kv"),
        )
        .select(
            "bioproject",
            "biosample_id",
            F.col("kv.attribute").alias("attribute"),
            F.col("kv.attr_pos").alias("attr_pos"),
            F.col("kv.value").alias("value"),
        )
    )


def read_wide_metadata_csv(spark: SparkSession, path: str, bioproject: str) -> DataFrame:
    """S2 — raw bioproject metadata CSV, all columns as strings (the
    reference treats timestamps/numerics as opaque categoricals,
    SURVEY.md §1.2), then melted long."""
    df = spark.read.option("header", True).csv(path)
    if "biosample_id" not in df.columns:
        df = df.withColumnRenamed(df.columns[0], "biosample_id")
    return melt_wide_metadata(df, bioproject)


DOCUMENTS_SCHEMA = "doc_id BIGINT, text STRING, lang STRING, source STRING"


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: str = DOCUMENTS_SCHEMA,
) -> DataFrame:
    """Document-corpus ingest from JSONL (the interchange format crawled
    corpora actually arrive in): explicit schema (no inference pass over
    100 TB), PERMISSIVE mode with the malformed raw line captured in
    ``_corrupt_record`` so bad rows are quarantinable instead of fatal —
    filter ``_corrupt_record IS NULL`` for the clean stream, or write
    the complement to a quarantine sink. (Spark refuses queries that
    reference ONLY the corrupt column on a raw JSON scan — cache() the
    frame or include a data column when inspecting the quarantine.)
    """
    full = f"{schema}, _corrupt_record STRING"
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def read_documents_text(
    spark: SparkSession, path: str, whole_file: bool = True
) -> DataFrame:
    """One document per file (``wholetext``) or per line:
    (doc_id BIGINT, text STRING, source STRING) — BOTH modes yield the
    DOCUMENTS_SCHEMA doc_id type so frames union cleanly and keep-first
    ordering stays numeric (an earlier version returned the raw file
    path as a STRING doc_id in whole-file mode).

    Whole-file mode: doc_id = xxhash64 of the file path (stable across
    re-reads and partitioning; ``source`` keeps the path for lineage).
    Line mode: doc_id = monotonically increasing id — unique but NOT
    stable across re-reads with different partitioning; ``source`` is
    the originating file. Prefer content hashes downstream."""
    if whole_file:
        df = spark.read.text(path, wholetext=True)
        return df.select(
            F.xxhash64(F.input_file_name()).alias("doc_id"),
            F.col("value").alias("text"),
            F.input_file_name().alias("source"),
        )
    df = spark.read.text(path)
    return df.select(
        F.monotonically_increasing_id().alias("doc_id"),
        F.col("value").alias("text"),
        F.input_file_name().alias("source"),
    )
