"""Similarity search over embedding columns (array<float>).

* ``brute_force_topk`` — exact cosine top-k against a query vector:
  the dot product runs as JVM ``aggregate``/``zip_with`` expressions
  (double precision, deterministic), ranked with one ORDER BY ... LIMIT
  (Spark's TakeOrdered — no full sort materialization).
* ``lsh_bucket_topk`` — the scale path: deterministic random-hyperplane
  LSH (sign bits of dot products with seeded hyperplanes) buckets the
  corpus; search touches only the query's bucket. Recall/latency trade
  via ``n_planes``. At 10^12 rows the bucket table is written once and
  bucket-pruned at query time (partition pruning on the bucket column).
* ``embedding_near_dup_pairs`` — cosine near-duplicate pairs inside
  LSH buckets (embedding-space dedup for training pipelines).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; zero vectors yield 0.0 instead of an ANSI
    divide-by-zero task failure (one zero embedding at 10^12 rows must
    not kill a stage)."""
    den = _norm(a) * _norm(b)
    return F.when(den > 0, _dot(a, b) / den).otherwise(F.lit(0.0))


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cosine) — exact top-k, deterministic tiebreak on id."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        embeddings.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG; no numpy RNG state)."""
    state = seed & 0x7FFFFFFF
    planes: list[list[float]] = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (1 << 31)
            # map to (-1, 1)
            row.append(((state / float(1 << 31)) * 2.0 - 1.0))
        planes.append(row)
    return planes


def lsh_bucket_ids(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Adds a ``bucket`` column: sign-bit signature against seeded planes."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucket: Column = F.lit(0)
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(v) for v in plane])
        bit = F.when(_dot(F.col(vec_col), p) >= 0, 1).otherwise(0)
        bucket = bucket + bit * (1 << i)
    return embeddings.withColumn("bucket", bucket.cast("int"))


def query_bucket(query_vec: list[float], dim: int, n_planes: int = 8,
                 seed: int = 42) -> int:
    """Driver-side LSH bucket of a query vector (same planes as
    ``lsh_bucket_ids``; left-to-right float sum matches the JVM/DuckDB
    ``aggregate``/``list_dot_product`` evaluation order)."""
    planes = _hyperplanes(dim, n_planes, seed)
    qbucket = 0
    for i, plane in enumerate(planes):
        dot = sum(float(a) * b for a, b in zip(query_vec, plane))
        if dot >= 0:
            qbucket |= 1 << i
    return qbucket


def probe_buckets(qbucket: int, n_planes: int, probe_radius: int = 0) -> list[int]:
    """Multi-probe LSH: all buckets within Hamming distance
    ``probe_radius`` of the query bucket. radius 1 → n_planes+1 probes.
    This is the standard recall lever (multi-probe LSH, Lv et al. 2007):
    near neighbors that land one sign-flip away are still searched
    without growing the bucket table."""
    probes = [qbucket]
    if probe_radius >= 1:
        probes += [qbucket ^ (1 << i) for i in range(n_planes)]
    if probe_radius >= 2:
        for i in range(n_planes):
            for j in range(i + 1, n_planes):
                probes.append(qbucket ^ (1 << i) ^ (1 << j))
    return sorted(set(probes))


def lsh_bucket_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    probe_radius: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: rank only within the query's LSH bucket(s).

    At 10^12 rows the bucketed table is partitioned by ``bucket`` so
    the IN-list prunes to ``len(probes)`` partitions; the scan touches
    ~(probes / 2^n_planes) of the corpus."""
    qbucket = query_bucket(query_vec, dim, n_planes, seed)
    probes = probe_buckets(qbucket, n_planes, probe_radius)
    bucketed = lsh_bucket_ids(embeddings, dim, n_planes, seed, vec_col)
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        bucketed.where(F.col("bucket").isin(probes))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def ivf_assign(
    embeddings: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: adds ``list_id`` = argmax cosine over
    the centroid table (JVM struct-max, no UDF)."""
    structs = []
    for i, c in enumerate(centroids):
        cv = F.array(*[F.lit(float(v)) for v in c])
        structs.append(
            F.struct(
                F.round(cosine(F.col(vec_col), cv), 9).alias("sim"),
                F.lit(i).alias("list_id"),
            )
        )
    best = F.array_max(F.array(*structs))
    return embeddings.withColumn("list_id", best["list_id"])


def train_centroids_deterministic(
    embeddings: DataFrame,
    n_lists: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic coarse quantizer: one Lloyd step from fixed seeds
    (the first ``n_lists`` vectors by id). At 10^12 scale this is the
    classic sample-train-broadcast pattern — the train set is tiny and
    collected once, the assignment stays fully distributed."""
    seeds = [
        [float(v) for v in r[0]]
        for r in embeddings.orderBy(id_col).select(vec_col).head(n_lists)
    ]
    if not seeds:
        raise ValueError("IVF training requires a non-empty embeddings table")
    assigned = ivf_assign(embeddings, seeds, vec_col)
    dim = len(seeds[0])
    avg_cols = [
        F.avg(F.element_at(F.col(vec_col), i + 1).cast("double")).alias(f"c{i}")
        for i in range(dim)
    ]
    rows = assigned.groupBy("list_id").agg(*avg_cols).collect()
    by_list = {r["list_id"]: [r[f"c{i}"] for i in range(dim)] for r in rows}
    return [by_list.get(i, seeds[i]) for i in range(len(seeds))]


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    n_lists: int = 8,
    n_probe: int = 2,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: rank only vectors in the ``n_probe`` inverted lists
    closest to the query. At scale the assignment is precomputed and
    the list table is partitioned by ``list_id`` (partition pruning
    turns the probe into a tiny scan)."""
    centroids = train_centroids_deterministic(embeddings, n_lists, id_col, vec_col)

    def cos_py(a: list[float], b: list[float]) -> float:
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        return dot / (na * nb) if na and nb else 0.0

    probes = sorted(
        range(len(centroids)),
        key=lambda i: (-cos_py(query_vec, centroids[i]), i),
    )[:n_probe]
    assigned = ivf_assign(embeddings, centroids, vec_col)
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        assigned.where(F.col("list_id").isin(probes))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Cosine near-dup pairs within LSH buckets: (id_a, id_b, cosine).

    ``max_bucket_size`` bounds the within-bucket self-join: a
    degenerate mega-bucket (e.g. a constant-vector cluster) would make
    the pair join quadratic in that bucket, so buckets wider than the
    cap are excluded from pair generation. NOT silent: callers can
    count what was dropped with ``oversize_buckets`` before running."""
    b = lsh_bucket_ids(embeddings, dim, n_planes, seed, vec_col)
    if max_bucket_size is not None:
        wide = b.groupBy("bucket").count().where(F.col("count") > max_bucket_size)
        b = b.join(F.broadcast(wide.select("bucket")), "bucket", "left_anti")
    left = b.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"), "bucket"
    )
    right = b.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"), "bucket"
    )
    return (
        left.join(right, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def oversize_buckets(
    embeddings: DataFrame,
    max_bucket_size: int,
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """(bucket, count) rows that ``embedding_near_dup_pairs`` will skip
    at the same cap — the audit/logging side of the no-silent-caps rule."""
    b = lsh_bucket_ids(embeddings, dim, n_planes, seed, vec_col)
    return b.groupBy("bucket").count().where(F.col("count") > max_bucket_size)


# ---- DuckDB-oracle SQL helpers (mirror the exact Spark arithmetic) ----

def hyperplanes_sql_literals(dim: int, n_planes: int, seed: int = 42) -> list[str]:
    """The seeded hyperplanes as DuckDB DOUBLE[] literals (full repr
    precision, so both engines compare the same doubles)."""
    return [
        "[" + ", ".join(repr(v) for v in plane) + "]"
        for plane in _hyperplanes(dim, n_planes, seed)
    ]


def bucket_sql_expr(vec_expr: str, dim: int, n_planes: int, seed: int = 42) -> str:
    """DuckDB expression computing the same LSH bucket as
    ``lsh_bucket_ids`` for a DOUBLE[]-typed ``vec_expr``."""
    terms = [
        f"(CASE WHEN list_dot_product({vec_expr}, {lit}) >= 0"
        f" THEN {1 << i} ELSE 0 END)"
        for i, lit in enumerate(hyperplanes_sql_literals(dim, n_planes, seed))
    ]
    return "(" + " + ".join(terms) + ")"
