"""Embedding dimensionality reduction: seeded random projection (JL)
and distributed PCA.

Beyond-parity extension (SURVEY.md §7 M5): the ANN / semantic-dedup /
PQ families all scan `array<float>` columns whose cost is linear in
dimension; a 100 TB embedding corpus routinely stores 768-4096-dim
vectors while 32-128 dims carry the neighborhood structure those
operators need. This module supplies the two standard reducers as
Spark-first plans:

* **Random projection** (the Johnson–Lindenstrauss lemma, 1984; the
  Gaussian construction per Indyk–Motwani 1998): a seeded Gaussian
  plane matrix, deterministic from (in_dim, out_dim, seed) — no
  training pass, engine-independent (the planes are reproducible in
  SQL as literal arrays, the same recipe as the LSH oracle), distance
  distortion bounded by the JL lemma. The right tool when no second
  pass over the corpus is affordable.
* **PCA**: mean + covariance accumulated DISTRIBUTED (one Arrow pass
  emitting a d x d partial Gram per partition — parameter-sized rows,
  never a collect of vectors), eigendecomposition driver-side on the
  d x d matrix (a parameter, not data), projection as a second
  map-only pass. The right tool when the extra corpus pass buys the
  variance-optimal subspace (and the PQ codebooks' standard
  preprocessing).

Projection dispatches like `similarity.assign_ivf_cells`: small
matrices inline as JVM column expressions (zip_with/aggregate — stays
in codegen, no Python workers), large ones run an Arrow-batched GEMM
with the matrix broadcast once per executor (the inline expression
embeds in_dim*out_dim literals and leaves codegen past a few thousand
terms — measured in SCALE.md probe I for the assignment twin).

Both reducers compose downstream unchanged: the output is a plain
`array<double>` column, so `brute_force_topk`, `semantic_dedup`,
`train_pq_codebooks`, `cluster_balanced_sample` etc. consume it
directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: past this many in_dim*out_dim terms the inline projection expression
#: is replaced by the Arrow GEMM kernel (same rationale and evidence as
#: similarity.IVF_ASSIGN_CODEGEN_MAX_CELLS — the expression grows
#: linearly in matrix size and falls out of whole-stage codegen).
PROJECT_CODEGEN_MAX_TERMS = 1024


def random_projection_planes(
    in_dim: int, out_dim: int, seed: int = 7
) -> list[list[float]]:
    """Seeded Gaussian JL matrix → out_dim rows of in_dim floats,
    scaled by 1/sqrt(out_dim) so squared distances are preserved in
    expectation. Deterministic: a pure function of (in_dim, out_dim,
    seed), so planes never need storing — any engine re-derives them."""
    import numpy as np

    if in_dim < 1 or out_dim < 1:
        raise ValueError(f"dims must be >= 1, got in={in_dim}, out={out_dim}")
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((out_dim, in_dim)) / np.sqrt(out_dim)
    return [[float(x) for x in row] for row in m]


def project_embeddings(
    emb: DataFrame,
    matrix: list[list[float]],
    vec_col: str = "embedding",
    out_col: str | None = None,
    shift: list[float] | None = None,
) -> DataFrame:
    """x → M (x - shift): the one projection primitive both reducers
    share (JL: shift=None; PCA: shift=mean). Output replaces/creates
    ``out_col`` as array<double> — defaulting to ``vec_col`` ITSELF
    (r12 review finding: the old literal "embedding" default meant a
    caller passing only vec_col wrote the projection to a NEW column
    and kept reading the unprojected one; train_opq did exactly that
    for any non-default vec_col, silently training codebooks on
    unrotated vectors); all other columns pass through.

    Map-only — no shuffle at any size. Physical strategy by matrix
    size: inline zip_with/aggregate expressions (JVM, codegen) below
    PROJECT_CODEGEN_MAX_TERMS terms, else one Arrow GEMM per batch with
    the (parameter-sized) matrix broadcast."""
    if out_col is None:
        out_col = vec_col
    if not matrix or not matrix[0]:
        raise ValueError("matrix must be non-empty")
    out_dim, in_dim = len(matrix), len(matrix[0])
    if any(len(r) != in_dim for r in matrix):
        raise ValueError("matrix rows must share one length")
    if shift is not None and len(shift) != in_dim:
        raise ValueError(f"shift has {len(shift)} dims, matrix expects {in_dim}")
    if out_dim * in_dim <= PROJECT_CODEGEN_MAX_TERMS:
        from mwas_rfam_spark.functions.sqlexpr import sql_double_array, sql_dot

        # parsed-SQL projection rows: the per-element Column build cost
        # ~(out_dim*in_dim) py4j round-trips per PLANNING — ~1.4 s at
        # 3x64 with shift (functions/sqlexpr.py rationale); the parsed
        # tree is identical
        x_sql = vec_col
        if shift is not None:
            x_sql = (
                f"zip_with({vec_col}, "
                f"{sql_double_array(float(s) for s in shift)}, "
                f"(a, b) -> cast(a as double) - b)"
            )
        projected = F.expr(
            "array("
            + ", ".join(
                sql_dot(x_sql, sql_double_array(float(w) for w in row))
                for row in matrix
            )
            + ")"
        )
        # NULL / wrong-dim vectors AND vectors carrying NULL or NaN
        # ELEMENTS → NULL output array on both physical paths (r12
        # review finding: a NULL element produced an all-NULL-element
        # array inline but finite-looking NaNs through Arrow — behavior
        # flipped on matrix size, against this module's pinned contract)
        valid = (
            F.col(vec_col).isNotNull()
            & (F.size(F.col(vec_col)) == in_dim)
            & ~F.exists(
                F.col(vec_col), lambda e: e.isNull() | F.isnan(e.cast("double"))
            )
        )
        return emb.withColumn(out_col, F.when(valid, projected))
    return _project_arrow(emb, matrix, vec_col, out_col, shift)


def _project_arrow(
    emb: DataFrame,
    matrix: list[list[float]],
    vec_col: str,
    out_col: str,
    shift: list[float] | None,
) -> DataFrame:
    import numpy as np

    from pyspark.sql import types as T

    spark = emb.sparkSession
    M = np.asarray(matrix, dtype=np.float64)
    mu = None if shift is None else np.asarray(shift, dtype=np.float64)
    bc = spark.sparkContext.broadcast((M, mu))
    fields = [f for f in emb.schema.fields if f.name != out_col]
    schema = T.StructType(fields + [T.StructField(out_col, T.ArrayType(T.DoubleType()))])
    src = emb.drop(out_col) if out_col in emb.columns and out_col != vec_col else emb

    in_dim = M.shape[1]

    def kernel(batches):
        Mm, mum = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # NULL / wrong-dimension vectors project to NULL — the same
            # semantics the inline expression produces, so behavior
            # cannot flip on matrix size
            vecs = []
            for v in pdf[vec_col]:
                if v is None or len(v) != in_dim:
                    vecs.append(None)
                    continue
                a = np.asarray(v, dtype=np.float64)
                # NULL elements arrive as NaN through Arrow; both are
                # invalid (r12 — same rule as the inline path)
                vecs.append(None if np.isnan(a).any() else a)
            valid = [i for i, v in enumerate(vecs) if v is not None]
            projected: list = [None] * len(vecs)
            if valid:
                X = np.stack([vecs[i] for i in valid])
                if mum is not None:
                    X = X - mum
                Y = X @ Mm.T
                for j, i in enumerate(valid):
                    projected[i] = Y[j].tolist()
            out = pdf.copy()
            if out_col in out.columns:
                out = out.drop(columns=[out_col])
            out[out_col] = projected
            yield out

    out = src.mapInPandas(kernel, schema)
    if out_col in emb.columns:
        # keep the INPUT column order: the Arrow schema appends out_col
        # at the end while the inline path's withColumn replaces it in
        # place — positional consumers flipped with matrix size (r12)
        out = out.select(*emb.columns)
    return out


def fit_pca(
    emb: DataFrame,
    k: int,
    vec_col: str = "embedding",
) -> dict:
    """Fit a k-component PCA over the corpus → {"mean": [d floats],
    "components": k x d} (components = top eigenvectors of the
    covariance, variance-descending, sign-normalized so refits are
    bit-stable).

    Scale shape: ONE Arrow pass emits per-partition partials
    (count, Σx as d floats, X'X flattened as d² floats), then a
    single-partition combine stage streams those partials into ONE
    (d²+d+1)-double row — the only thing collected, so driver memory is
    O(d²) regardless of corpus size or partition count (at d=4096 a
    partial is ~134 MB; collecting one per partition would scale with
    the cluster). The d x d eigendecomposition is driver arithmetic on
    a parameter. No vector ever reaches the driver. NULL embeddings AND
    vectors containing NULL elements are excluded from the fit (moments
    are undefined over them; a NULL element would otherwise round-trip
    through Arrow as NaN and poison every sum silently); wrong-dimension
    vectors fail loudly."""
    import numpy as np

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    emb = emb.where(
        F.col(vec_col).isNotNull()
        & ~F.exists(
            F.col(vec_col),
            # NaN/Inf elements poison the moment sums exactly like the
            # NULLs this filter already excluded (r12 review finding)
            lambda x: x.isNull()
            | F.isnan(x.cast("double"))
            | (F.abs(x.cast("double")) == F.lit(float("inf"))),
        )
    )
    first = emb.select(F.size(vec_col).alias("d")).first()
    if first is None:
        raise ValueError("fit_pca needs a non-empty corpus")
    d = int(first["d"])
    if k > d:
        raise ValueError(f"k={k} exceeds embedding dim {d}")

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s", T.ArrayType(T.DoubleType())),
            T.StructField("g", T.ArrayType(T.DoubleType())),
        ]
    )

    def partials(batches):
        import pandas as pd

        n = 0
        s = np.zeros(d)
        g = np.zeros((d, d))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["__v"]])
            if X.shape[1] != d:
                raise ValueError(f"embedding dim {X.shape[1]} != {d}")
            n += len(X)
            s += X.sum(axis=0)
            g += X.T @ X
        if n:
            yield pd.DataFrame({"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]})

    def combine(batches):
        import pandas as pd

        n = 0
        s = np.zeros(d)
        g = np.zeros(d * d)
        for pdf in batches:
            for i in range(len(pdf)):
                n += int(pdf["n"].iloc[i])
                s += np.asarray(pdf["s"].iloc[i])
                g += np.asarray(pdf["g"].iloc[i])
        if n:
            yield pd.DataFrame({"n": [n], "s": [s.tolist()], "g": [g.tolist()]})

    # per-partition partials → one streamed combine partition → ONE row
    # on the driver (O(d²), independent of partition count). repartition,
    # NOT coalesce: coalesce(1) would fuse the partials pass itself into
    # a single task; the shuffle moves only parameter-sized partial rows.
    rows = (
        emb.select(F.col(vec_col).cast("array<double>").alias("__v"))
        .mapInPandas(partials, schema)
        .repartition(1)
        .mapInPandas(combine, schema)
        .collect()
    )
    if not rows:
        raise ValueError("fit_pca needs a non-empty corpus")
    n = int(rows[0]["n"])
    s = np.asarray(rows[0]["s"])
    g = np.asarray(rows[0]["g"]).reshape(d, d)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T  # k x d
    # sign convention: the largest-|entry| coordinate of each component
    # is positive — eigh's sign is arbitrary and would flip across runs
    for row in comps:
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1.0
    return {
        "mean": [float(x) for x in mean],
        "components": [[float(x) for x in row] for row in comps],
        "explained_variance": [float(vals[i]) for i in order],
    }


def pca_project(
    emb: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str | None = None,
) -> DataFrame:
    """Project with a :func:`fit_pca` model (mean-centered) — the
    build-vs-probe split: fit at index time, project as a map-only
    stage wherever the corpus is read."""
    return project_embeddings(
        emb,
        model["components"],
        vec_col=vec_col,
        out_col=out_col,
        shift=model["mean"],
    )
