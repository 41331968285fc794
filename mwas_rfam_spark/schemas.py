"""Fixed schemas for the engine's core relations (SURVEY.md §1.1).

The reference validates its 3-column input positionally
(main/mwas_general.py:744-759) and fixes catalog schemas via SQL aliases
(main/mwas_general.py:46-54). Dynamic per-BioProject metadata is normalized
to one fixed *long* schema (biosample_id, attribute, value) so a single
relational plan covers every BioProject.
"""

from __future__ import annotations

from pyspark.sql import types as T

# user observation table — reference mg:744-759, README.md:3
INPUT_SCHEMA = T.StructType(
    [
        T.StructField("run", T.StringType(), False),
        T.StructField("group", T.StringType(), False),
        T.StructField("quantifier", T.DoubleType(), True),
    ]
)

# run → sample/project/depth catalog — reference mg:37-54
CATALOG_SCHEMA = T.StructType(
    [
        T.StructField("bio_project", T.StringType(), True),
        T.StructField("bio_sample", T.StringType(), True),
        T.StructField("run", T.StringType(), False),
        T.StructField("spots", T.LongType(), True),
    ]
)

# long-form bioproject metadata (wide CSVs melted) — replaces the
# per-BioProject dynamic schemas of reference converter_.py:33
METADATA_LONG_SCHEMA = T.StructType(
    [
        T.StructField("bioproject", T.StringType(), False),
        T.StructField("biosample_id", T.StringType(), False),
        T.StructField("attribute", T.StringType(), False),
        T.StructField("attr_pos", T.IntegerType(), False),  # original column order
        T.StructField("value", T.StringType(), True),
    ]
)

# condensed metadata sets — reference metadata_set_maker.py:96-102 plus a
# stable set_id; `members` is the minority-side biosample list (include ⇒
# members are the true cohort, else the complement is)
METADATA_SETS_SCHEMA = T.StructType(
    [
        T.StructField("bioproject", T.StringType(), False),
        T.StructField("set_id", T.StringType(), False),
        T.StructField("attributes", T.StringType(), False),
        T.StructField("values", T.StringType(), False),
        T.StructField("members", T.ArrayType(T.StringType()), False),
        T.StructField("include", T.BooleanType(), False),
    ]
)

# 18-column result table — reference mg:94 (the `group` column is named
# after the user's original group column at output time)
RESULT_SCHEMA = T.StructType(
    [
        T.StructField("bioproject", T.StringType(), False),
        T.StructField("group", T.StringType(), False),
        T.StructField("metadata_field", T.StringType(), False),
        T.StructField("metadata_value", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("runtime_seconds", T.DoubleType(), True),
        T.StructField("memory_usage_bytes", T.LongType(), True),
        T.StructField("num_true", T.IntegerType(), True),
        T.StructField("num_false", T.IntegerType(), True),
        T.StructField("mean_rpm_true", T.DoubleType(), True),
        T.StructField("mean_rpm_false", T.DoubleType(), True),
        T.StructField("sd_rpm_true", T.DoubleType(), True),
        T.StructField("sd_rpm_false", T.DoubleType(), True),
        T.StructField("fold_change", T.StringType(), True),
        T.StructField("test_statistic", T.DoubleType(), True),
        T.StructField("p_value", T.DoubleType(), True),
        T.StructField("true_biosamples", T.StringType(), True),
        T.StructField("false_biosamples", T.StringType(), True),
    ]
)
