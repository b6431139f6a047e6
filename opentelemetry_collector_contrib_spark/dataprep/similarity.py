"""Similarity search over an embedding column (array<float>).

- cosine(a, b): sequential-order dot/norm in double precision as a pure
  column expression (zip_with + aggregate) — bit-reproducible, so the
  DuckDB oracle can mirror it exactly.
- brute_force_topk: exact top-k for a (small) query set vs the corpus —
  broadcast the queries, one pass over the corpus, per-query window rank.
- sign_lsh_topk: the scale path — seeded random ±1 hyperplane sign
  buckets (optionally mean-centered for offset-dominated spaces) shrink
  the candidate set to same-bucket vectors; exact cosine re-rank within
  the bucket. At 10^12 vectors the bucket join is the only shuffle.
- ivf_topk: index-based ANN — persisted coarse-quantizer centroids,
  vectorized numpy cell assignment, equality join on the cell id.
- embedding_cosine_pairs: thresholded near-dup pairs (dedup use-case).
- l2_normalize / quantize_int8 / dequantize_int8: the storage path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential double-precision dot product of two float arrays."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    # nullif guards the zero-norm case (all-zero padding/OOV vectors):
    # NULL similarity instead of an ANSI DIVIDE_BY_ZERO job abort
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))


def _rank_topk(scored: DataFrame, query_col: str, k: int) -> DataFrame:
    """Shared top-k tail for every ANN variant: rank by cosine desc with
    neighbor-id tie-break (stable across engines), keep k, round."""
    w = Window.partitionBy(query_col).orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_col, "rank", "neighbor_id", F.round("cos", 4).alias("cos"))
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    queries is broadcast (it is the small side by construction); the
    corpus is scanned once; rank ties break on neighbor id after rounding
    cosine to 6 decimals (stable across engines). Returns
    (query_id, rank, neighbor_id, cos)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")), 6))
    )
    return _rank_topk(scored, "query_id", k)


def random_hyperplanes(dim: int, bits: int = 8, seed: int = 7) -> list[list[float]]:
    """`bits` seeded pseudo-random ±1 hyperplanes (Rademacher entries —
    as effective as Gaussian for sign-LSH and exactly representable, so
    the projection is a sum of signed vector elements both engines
    evaluate identically)."""
    import random

    rng = random.Random(seed)
    return [
        [1.0 if rng.random() < 0.5 else -1.0 for _ in range(dim)]
        for _ in range(bits)
    ]


def sign_bucket(
    vec: Column,
    bits: int = 8,
    *,
    dim: int | None = None,
    seed: int = 7,
    hyperplanes: list[list[float]] | None = None,
    center: list[float] | None = None,
) -> Column:
    """LSH bucket id: bit j is the sign of the projection onto a seeded
    random ±1 hyperplane. Deterministic and SQL-expressible (the literal
    matrix is embedded in the plan). Random projections — NOT the first
    `bits` dimensions — because real embedding spaces are anisotropic:
    dominant principal components would funnel the corpus into a few hot
    buckets and degenerate the equality join toward all-pairs.

    `center`: optional per-dimension mean to subtract before projecting.
    A large common offset (un-normalized embedding spaces) shifts EVERY
    projection by mu·h and freezes the sign bits regardless of how the
    hyperplanes are drawn — compute the corpus mean once, persist it with
    the index (same fit-once discipline as ivf_fit_centroids), and pass
    it here."""
    if hyperplanes is None:
        if dim is None:
            raise ValueError("sign_bucket needs dim (or explicit hyperplanes)")
        hyperplanes = random_hyperplanes(dim, bits, seed)
    d = len(hyperplanes[0])
    # a dim/embedding-width mismatch must fail LOUDLY: zip_with NULL-pads
    # the shorter array, the projection fold turns NULL, when(NULL >= 0)
    # is false, and EVERY vector would silently land in bucket 0 — the
    # equality join then degenerates to the all-pairs cross product the
    # bucketing exists to prevent. assert_true is NULL when the guard
    # holds, so the coalesce below is a no-op on valid rows (and the
    # DuckDB oracle mirror needs no counterpart).
    guard = F.assert_true(
        vec.isNull() | (F.size(vec) == d),
        F.lit(f"sign_bucket: embedding length != hyperplane dim {d}"),
    )
    out = F.lit(0).cast("long") + F.coalesce(guard.cast("long"), F.lit(0))
    for j, h in enumerate(hyperplanes):
        if center is not None:
            h_shift = -sum(c * x for c, x in zip(center, h))
            init = F.lit(float(h_shift))
        else:
            init = F.lit(0.0)
        harr = F.array(*[F.lit(x) for x in h])
        # (v - mu)·h == v·h - mu·h: fold the centering into the fold's
        # init value so the per-row work stays one multiply-add per dim
        proj = F.aggregate(
            F.zip_with(vec, harr, lambda a, b: a.cast("double") * b),
            init,
            lambda acc, v: acc + v,
        )
        out = out + F.when(proj >= 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0))
    # NULL embeddings get a NULL bucket (equality joins skip them), not a
    # shared bucket 0
    return F.when(vec.isNull(), F.lit(None).cast("long")).otherwise(out)


def sign_lsh_topk(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
    k: int = 1,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Approximate per-vector top-k within the vector's sign bucket.
    The self-join is an equality join on the bucket id (2^bits buckets),
    so the shuffle is keyed and bounded; AQE splits any hot bucket.
    Returns (vec_id, rank, neighbor_id, cos)."""
    b = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        sign_bucket(F.col(vec_col), bits, dim=dim, seed=seed).alias("bucket"),
    )
    l, r = b.alias("l"), b.alias("r")
    scored = (
        l.join(r, "bucket")
        .filter(F.col("l.id") != F.col("r.id"))
        .select(
            F.col("l.id").alias("vec_id"),
            F.col("r.id").alias("neighbor_id"),
            F.round(cosine(F.col("l.v"), F.col("r.v")), 6).alias("cos"),
        )
    )
    return _rank_topk(scored, "vec_id", k)


def ivf_fit_centroids(
    corpus: DataFrame, vec_col: str = "embedding", k: int = 16, seed: int = 7
) -> list[list[float]]:
    """IVF coarse quantizer: k-means centroids fit with MLlib. Driver
    holds k small centroid vectors — the 'index' that ships to executors
    as literals.

    Reproducibility caveat: a fixed seed pins the k-means|| init draw but
    float aggregation order still depends on the input PARTITIONING, so a
    repartitioned corpus can fit (slightly) different centroids. For a
    resumable pipeline, fit ONCE, persist the centroid list, and pass it
    to ivf_topk(..., centroids=...) — queries against stored centroids
    are fully deterministic."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # NULL embeddings NPE inside array_to_vector and would kill the fit
    # before the NULL handling in semdedup/_assign_cells_pandas is ever
    # reached — the fit simply ignores them, like every assignment path
    feats = corpus.filter(F.col(vec_col).isNotNull()).select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("__v")
    )
    model = KMeans(k=k, seed=seed, featuresCol="__v").fit(feats)
    return [[float(x) for x in c] for c in model.clusterCenters()]


def _centroid_dists(vec: Column, centroids: list[list[float]]) -> Column:
    """array<struct<d: double, i: int>> of squared distances to each
    centroid — pure column expressions over literal centroid arrays."""
    entries = []
    for i, c in enumerate(centroids):
        carr = F.array(*[F.lit(float(x)) for x in c])
        diff = F.zip_with(vec, carr, lambda a, b: (a.cast("double") - b) * (a.cast("double") - b))
        d = F.aggregate(diff, F.lit(0.0), lambda acc, v: acc + v)
        entries.append(F.struct(d.alias("d"), F.lit(i).alias("i")))
    return F.array_sort(F.array(*entries))


def ivf_assign(vec: Column, centroids: list[list[float]], nprobe: int = 1) -> Column:
    """array<int> of the nprobe nearest centroid ids for a vector."""
    return F.transform(
        F.slice(_centroid_dists(vec, centroids), 1, nprobe), lambda e: e["i"]
    )


def _assign_cells_pandas(vec: Column, centroids: list[list[float]], nprobe: int) -> Column:
    """Vectorized centroid assignment: one numpy distance matrix per Arrow
    batch instead of k interpreted higher-order folds per row (~10x at
    local scale, and the per-row cost is what a 10^12-vector scan pays).
    Same squared-distance formula and stable index tie-break as
    _centroid_dists; equality with the Catalyst path is pytest-asserted
    on the driver's own test data (test_dataprep.py)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)

    @pandas_udf("struct<cell:int, probes:array<int>>")
    def _assign(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for s in batches:
            if len(s) == 0:
                yield pd.DataFrame({"cell": pd.Series([], dtype="int32"), "probes": []})
                continue
            # NULL embeddings get NULL cell/probes (matching the catalyst
            # mirror) instead of crashing np.asarray on None
            valid = s.notna().to_numpy()
            cells = pd.array([None] * len(s), dtype="Int32")
            probes: list[list[int] | None] = [None] * len(s)
            if valid.any():
                V = np.asarray(
                    [np.asarray(x, dtype=np.float64) for x in s[valid]]
                )
                d = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
                order = np.argsort(d, axis=1, kind="stable")
                for j, i in enumerate(np.flatnonzero(valid)):
                    cells[i] = int(order[j, 0])
                    probes[i] = order[j, :nprobe].astype("int32").tolist()
            yield pd.DataFrame({"cell": cells, "probes": probes})

    # the function IS deterministic, but telling Catalyst so lets it clone
    # the ArrowEvalPython node into the explode's null-guard filter — every
    # vector would cross the Arrow boundary twice. Nondeterministic marking
    # pins a single evaluation per row.
    return _assign.asNondeterministic()(vec)


def ivf_topk(
    corpus: DataFrame,
    *,
    queries: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    n_centroids: int = 16,
    nprobe: int = 2,
    k: int = 1,
    seed: int = 7,
    impl: str = "pandas",
) -> DataFrame:
    """IVF approximate nearest neighbors (the index-based scale path the
    survey calls for next to sign-LSH): corpus vectors live in their
    single nearest-centroid cell; each query probes its `nprobe` nearest
    cells and re-ranks exact cosine within them.

    The only shuffle is the equality join on the centroid id — candidate
    count ~ corpus/k * nprobe per query instead of the full corpus. The
    centroid fit is one MLlib pass; at 10^12 vectors fit on a sample
    (centroids don't need every point). impl='pandas' (default) assigns
    cells with one numpy distance matrix per Arrow batch; 'catalyst' is
    the pure-column-expression mirror of the DuckDB oracle — both
    tie-break equal distances on centroid index and are pytest-asserted
    identical."""
    if impl not in ("pandas", "catalyst"):
        raise ValueError(f"unknown impl {impl!r}")
    if centroids is None:
        centroids = ivf_fit_centroids(corpus, vec_col, n_centroids, seed)

    # one centroid-distance pass per row: cell = nearest, probes = the
    # nprobe nearest — computing the distance set twice would double the
    # dominant per-row cost of the scan
    def _with_assignment(df: DataFrame) -> DataFrame:
        if impl == "pandas":
            return df.select(
                F.col(id_col).alias("id"),
                F.col(vec_col).alias("v"),
                _assign_cells_pandas(F.col(vec_col), centroids, nprobe).alias("__a"),
            ).select(
                "id", "v",
                F.col("__a.cell").alias("__cell"),
                F.col("__a.probes").alias("__probes"),
            )
        cd = _centroid_dists(F.col(vec_col), centroids)
        # NULL embeddings: every distance is NULL, array_sort ties on the
        # index and cd[0]['i'] would be centroid 0 — give them NULL
        # cell/probes instead, matching the pandas path (the cell join
        # skips NULL keys, explode(NULL) emits nothing)
        ok = F.col(vec_col).isNotNull()
        return df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
            F.when(ok, cd[0]["i"]).alias("__cell"),
            F.when(
                ok, F.transform(F.slice(cd, 1, nprobe), lambda e: e["i"])
            ).alias("__probes"),
        )

    base = _with_assignment(corpus)
    cells = base.select("id", "v", F.col("__cell").alias("cell"))
    qbase = base if queries is None else _with_assignment(queries)
    probes = qbase.select(
        F.col("id").alias("qid"),
        F.col("v").alias("qv"),
        F.explode("__probes").alias("cell"),
    )
    scored = (
        probes.join(cells, "cell")
        .filter(F.col("qid") != F.col("id"))
        .select(
            F.col("qid").alias("vec_id"),
            F.col("id").alias("neighbor_id"),
            F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cos"),
        )
    )
    return _rank_topk(scored, "vec_id", k)


def embedding_cosine_pairs(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
    bucket_bits: int | None = None,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold (rounded to 4).
    With bucket_bits set, candidates are restricted to same-sign-bucket
    pairs (the scale path); with None it is the exact all-pairs check
    (correctness oracle shape, small inputs only)."""
    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if bucket_bits is not None:
        v = v.withColumn(
            "bucket", sign_bucket(F.col("v"), bucket_bits, dim=dim, seed=seed)
        )
        join_on = [F.col("l.bucket") == F.col("r.bucket"), F.col("l.id") < F.col("r.id")]
    else:
        join_on = [F.col("l.id") < F.col("r.id")]
    l, r = v.alias("l"), v.alias("r")
    pairs = l.join(r, on=join_on).select(
        F.col("l.id").alias("id_a"),
        F.col("r.id").alias("id_b"),
        F.round(cosine(F.col("l.v"), F.col("r.v")), 4).alias("cos"),
    )
    return pairs.filter(F.col("cos") >= threshold)


def semdedup(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    k: int = 16,
    threshold: float = 0.95,
    seed: int = 7,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication in embedding space — cluster the corpus with a coarse
    k-means quantizer, then within each cluster drop every example whose
    cosine similarity to a HIGHER-PRIORITY cluster member exceeds the
    threshold. Priority follows the paper's best-performing keep policy:
    examples with LOW similarity to their cluster centroid are kept
    first (ties broken by id, so the result is fully deterministic).

    Returns one row per input vector:
      (id, cluster, centroid_sim, kept, shield_id, shield_cos)
    where shield_id is the highest-cosine higher-priority duplicate that
    caused the drop (NULL for kept rows).

    Scale shape: one equality-join shuffle keyed on the cluster id; the
    within-cluster pairwise cost is the standard SemDeDup O(sum c_i^2) —
    size k ~ sqrt(N) so clusters stay bounded, and AQE splits any hot
    cluster. Pass persisted `centroids` (fit-once discipline, see
    ivf_fit_centroids) for resumable/deterministic runs."""
    if centroids is None:
        centroids = ivf_fit_centroids(corpus, vec_col, k=k, seed=seed)
    carr = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
    )
    base = (
        corpus.filter(F.col(vec_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
            F.element_at(ivf_assign(F.col(vec_col), centroids, 1), 1).alias(
                "cluster"
            ),
        )
        .withColumn(
            "centroid_sim",
            F.round(cosine(F.col("v"), F.element_at(carr, F.col("cluster") + 1)), 6),
        )
    )
    l, r = base.alias("l"), base.alias("r")
    higher_priority = (F.col("r.centroid_sim") < F.col("l.centroid_sim")) | (
        (F.col("r.centroid_sim") == F.col("l.centroid_sim"))
        & (F.col("r.id") < F.col("l.id"))
    )
    dup_pairs = (
        l.join(r, on=[F.col("l.cluster") == F.col("r.cluster"), higher_priority])
        .select(
            F.col("l.id").alias("id"),
            F.col("r.id").alias("rid"),
            F.round(cosine(F.col("l.v"), F.col("r.v")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
    w = Window.partitionBy("id").orderBy(F.col("cos").desc(), F.col("rid").asc())
    shields = (
        dup_pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("id", F.col("rid").alias("shield_id"), F.col("cos").alias("shield_cos"))
    )
    return (
        base.join(shields, "id", "left")
        .select(
            "id",
            "cluster",
            "centroid_sim",
            F.col("shield_id").isNull().alias("kept"),
            "shield_id",
            "shield_cos",
        )
    )


def l2_normalize(vec: Column) -> Column:
    """Unit-normalize an embedding (cosine becomes a dot product — the
    standard pre-step before ANN indexing). Zero vectors pass through
    unchanged rather than dividing by zero."""
    n = norm(vec)
    return F.when(
        n > 0, F.transform(vec, lambda x: (x.cast("double") / n).cast("float"))
    ).otherwise(vec)


def quantize_int8(vec: Column) -> Column:
    """Symmetric per-vector int8 quantization: struct<codes array<tinyint>,
    scale float> with codes = round(x / scale), scale = max|x| / 127 — a
    4x storage cut for a 10^12-vector store (the dominant cost at that
    scale is the embedding bytes, not the compute). Zero vectors get
    scale 0 and all-zero codes."""
    amax = F.aggregate(
        vec, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x.cast("double")))
    )
    scale = amax / F.lit(127.0)
    codes = F.when(
        scale > 0,
        F.transform(vec, lambda x: F.round(x.cast("double") / scale, 0).cast("tinyint")),
    ).otherwise(F.transform(vec, lambda x: F.lit(0).cast("tinyint")))
    return F.struct(codes.alias("codes"), scale.cast("float").alias("scale"))


def dequantize_int8(q: Column) -> Column:
    """Inverse of quantize_int8 -> array<float>."""
    return F.transform(
        q["codes"], lambda c: (c.cast("double") * q["scale"].cast("double")).cast("float")
    )
