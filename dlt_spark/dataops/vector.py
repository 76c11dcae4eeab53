"""Vector-destination adapter: declarative "embed this column on load".

Re-expression of the reference's ``lancedb_adapter``
(``dlt/destinations/impl/lancedb/lancedb_adapter.py:14`` — the
``x-lancedb-embed`` column hint) for the Spark engine: the adapter tags
text columns with an ``x_embed`` hint; at normalize time the pipeline
materializes ``<col>__embedding array<float>`` siblings with the
configured embedder, so the loaded table is immediately usable by the
similarity operators (``dataops/similarity.py``).

Embedders are pluggable ``Column -> Column`` builders.  The default is a
deterministic hash-projection embedding (sha256-seeded pseudo-random
projection of the token multiset — no model weights involved, stable
across engines, useful for plumbing and tests).  Swap in a real model by
passing ``embedder=`` a function that returns an ``array<float>`` Column
(e.g. a pandas_udf over a sentence-transformer); the rest of the
pipeline — schema, hints, load, ANN — is identical.
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional, Sequence, Union

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

EMBED_HINT = "x_embed"


def hash_embedding(col: Column, dims: int = 16) -> Column:
    """Deterministic pseudo-embedding: project the token multiset into
    ``dims`` float components via per-dimension seeded xxhash64 of each
    token, averaged.  Pure Column expr (codegen, no Python); identical
    input text -> identical vector, cosine-comparable across runs.  A
    plumbing/test embedder, NOT a semantic model."""
    toks = F.split(F.lower(F.trim(col)), r"\s+")
    comps = []
    for d in range(dims):
        # xxhash64 is int64; normalize to [-0.5, 0.5]
        comps.append(
            F.aggregate(
                toks,
                F.lit(0.0),
                lambda acc, t: acc
                + (F.xxhash64(t, F.lit(d)) / F.lit(float(2**64))).cast("double"),
            )
            / F.greatest(F.size(toks), F.lit(1))
        )
    return F.array(*[c.cast("float") for c in comps])


def vector_adapter(
    resource: Any,
    embed: Union[str, Sequence[str]],
    embedder: Optional[Callable[[Column], Column]] = None,
    dims: int = 16,
) -> Any:
    """Tag ``embed`` columns of a resource (or raw data, which is wrapped
    like the reference's ``get_resource_for_adapter``) for embedding on
    load.  Returns the resource for chaining."""
    from ..pipeline.resources import DltResource, resource as make_resource

    if not embed:
        raise ValueError("embed must name at least one column")
    if isinstance(embed, str):
        embed = [embed]
    if not isinstance(resource, DltResource):
        resource = make_resource(resource, name="content")
    for name in embed:
        col = resource.columns.setdefault(name, {"name": name})
        col[EMBED_HINT] = True
    resource._embedder = embedder or (lambda c: hash_embedding(c, dims))  # type: ignore[attr-defined]
    return resource


def embed_columns(df, columns: List[str], embedder: Callable[[Column], Column]):
    """Materialize ``<col>__embedding`` siblings for the hinted columns —
    called by the pipeline during normalize (one projection, no shuffle)."""
    out = df
    for name in columns:
        if name in out.columns:
            out = out.withColumn(f"{name}__embedding", embedder(F.col(name)))
    return out


def lcg_weights(dim: int, seed: int = 7) -> List[float]:
    """Deterministic pseudo-random probe weights in (-1, 1) via the same
    seeded LCG as the LSH hyperplanes — reproducible in any engine as a
    literal list."""
    out: List[float] = []
    state = seed
    for _ in range(dim):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        out.append(((state >> 11) / float(1 << 53)) * 2.0 - 1.0)
    return out


def linear_probe(
    vec: Column, weights: Sequence[float], bias: float = 0.0, decimals: int = 6
) -> Column:
    """Apply a trained linear classifier head (quality/toxicity/domain
    probe — the fasttext-scorer analog) to an embedding column:
    ``logit = w·x + b``.  Pure mul/add column expression — codegen,
    zero shuffle, deterministic across engines and row order (the logit
    is emitted rather than the sigmoid: exp() is not ulp-identical
    between libm implementations, a scan-speed score does not need it,
    and any threshold on the sigmoid is a threshold on the logit)."""
    w = F.array(*[F.lit(float(x)) for x in weights])
    dot = F.aggregate(
        F.zip_with(vec, w, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.round(dot + F.lit(float(bias)), decimals)


def pool_embeddings(
    df: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
    decimals: int = 6,
    out_col: str = "pooled",
) -> DataFrame:
    """Mean-pool embeddings per group — the chunk->document (or
    doc->cluster-centroid) aggregation step of an embedding pipeline.

    Shape: posexplode -> one grouped aggregation keyed (group, position)
    with decimal-exact sums (order-independent partials) -> re-assemble
    the array by sorting the (position, mean) structs.  Shuffle volume
    is rows x dim scalars, the same data the scan already read; the
    quantization is the engine-portable integer HALF_UP
    (``floor(x*10^d + 0.5)/10^d``), so results are bit-identical across
    engines and partitionings.  Returns ``(group_col, n_vectors,
    out_col)``."""
    q = float(10 ** decimals)
    ex = df.select(
        F.col(group_col), F.posexplode(F.col(vec_col)).alias("_pos", "_v")
    )
    s = ex.groupBy(group_col, "_pos").agg(
        F.sum(F.col("_v").cast("double").cast("decimal(38,8)")).alias("_sv"),
        F.count(F.lit(1)).alias("_n"),
    )
    mean = F.floor(
        F.col("_sv").cast("double") / F.col("_n") * F.lit(q) + F.lit(0.5)
    ) / F.lit(q)
    return (
        s.select(group_col, "_pos", mean.alias("_m"), "_n")
        .groupBy(group_col)
        .agg(
            F.max("_n").alias("n_vectors"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_m"))),
                lambda x: x["_m"],
            ).alias(out_col),
        )
        .orderBy(group_col)
    )


def group_centroid_sim(
    df: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
    decimals: int = 6,
) -> DataFrame:
    """Pairwise cosine similarity between per-group MEAN embeddings
    (source/domain centroids) — the corpus-mixing diagnostic: which
    domains are semantically redundant, which eval split drifts from
    its train split.  Counts cancel in cosine (``cos(S/n, T/m) ==
    cos(S, T)``), so the centroids never divide: per (group, position)
    the component SUM aggregates decimal-exact, is quantized to integer
    micro-units, and all dot products / norms run as DECIMAL(38,0)
    integer sums — order-independent and engine-exact; only the final
    cosine divides (IEEE on exact integers, rounded).

    Shape: one posexplode + one (group, pos) aggregation (rows x dim
    scalars, the data the scan read anyway), then a pos-keyed join
    whose fan-out per position is |groups|² — groups are few.

    Returns ``(source_a, source_b, cos_sim)``.
    """
    ex = df.select(
        F.col(group_col).alias("_grp"),
        F.posexplode(F.col(vec_col)).alias("_pos", "_v"),
    )
    s = ex.groupBy("_grp", "_pos").agg(
        F.sum(F.col("_v").cast("double").cast("decimal(38,8)")).alias("_s")
    )
    q = s.select(
        "_grp",
        "_pos",
        F.floor(F.col("_s").cast("double") * F.lit(1e6) + F.lit(0.5))
        .cast("decimal(38,0)")
        .alias("_q"),
    ).localCheckpoint(eager=False)
    norms = q.groupBy("_grp").agg(
        F.sum(F.col("_q") * F.col("_q")).alias("_nq")
    )
    dots = (
        q.select(F.col("_grp").alias("_ga"), "_pos", F.col("_q").alias("_qa"))
        .join(
            q.select(F.col("_grp").alias("_gb"), "_pos", F.col("_q").alias("_qb")),
            "_pos",
        )
        .filter(F.col("_ga") < F.col("_gb"))
        .groupBy(F.col("_ga").alias("source_a"), F.col("_gb").alias("source_b"))
        .agg(F.sum(F.col("_qa") * F.col("_qb")).alias("_dp"))
    )
    nb = F.broadcast(norms)
    return (
        dots.join(nb.select(F.col("_grp").alias("source_a"), F.col("_nq").alias("_na")), "source_a")
        .join(nb.select(F.col("_grp").alias("source_b"), F.col("_nq").alias("_nb")), "source_b")
        .select(
            "source_a",
            "source_b",
            F.round(
                F.col("_dp").cast("double")
                / (
                    F.sqrt(F.col("_na").cast("double"))
                    * F.sqrt(F.col("_nb").cast("double"))
                ),
                decimals,
            ).alias("cos_sim"),
        )
    )


def kmeans_lloyd(
    df: "DataFrame",
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 6,
):
    """Fixed-iteration Lloyd k-means over an embedding column — the
    clustering step behind IVF cell training, semantic sharding, and
    topic-balanced corpus mixes (the reference ships embeddings to a
    vector destination and clusters there; on Spark the training loop
    is native).

    Engine-exact by construction, same discipline as :func:`pagerank`:

    * every component is quantized to integer micro-units
      (``round(v * 10^decimals)`` as BIGINT) BEFORE any arithmetic, so
      distances are exact integer sums (order-independent partials);
    * init is deterministic — the ``k`` lowest ``id_col`` vectors are
      centroids 0..k-1;
    * assignment breaks distance ties toward the lowest centroid id
      (``min(struct(dist, cid))``);
    * the centroid update is integer HALF_UP of the component mean:
      ``floor((2*S + n) / (2*n))`` on exact-in-double integers, so a
      SQL oracle replays the loop bit-identically as unrolled CTEs.

    Scale shape: the quantized ``(id, pos, qv)`` frame is checkpointed
    once and reused every iteration; centroids (``k * dim`` rows) are
    broadcast, so each iteration is one shuffle-free pos-join fan-out
    (rows x dim x k) followed by two grouped aggregations — the textbook
    distributed Lloyd layout.  ``k`` and ``dim`` are small constants;
    the data-sized frames never self-join.

    Returns ``(assign, centroids)``: ``assign = (id_col, cluster_id,
    dist_q)`` with ``dist_q`` the exact integer squared distance in
    micro-units^2; ``centroids = (cluster_id, pos, qc)`` integer
    micro-unit components after the final update.  The frames persisted
    internally are listed on ``assign._dlt_persisted``.
    """
    q = float(10**decimals)
    qv = (
        df.select(
            F.col(id_col).alias("_id"),
            F.posexplode(F.col(vec_col)).alias("_pos", "_v"),
        )
        .select(
            "_id",
            "_pos",
            F.floor(F.col("_v").cast("double") * F.lit(q) + F.lit(0.5))
            .cast("bigint")
            .alias("_qv"),
        )
        .localCheckpoint(eager=False)
    )

    init_ids = (
        df.select(F.col(id_col).alias("_id"))
        .orderBy("_id")
        .limit(k)
        .withColumn(
            "_cid",
            F.row_number().over(Window.orderBy("_id")) - F.lit(1),
        )
    )
    cent = (
        qv.join(F.broadcast(init_ids), "_id")
        .select("_cid", "_pos", F.col("_qv").alias("_qc"))
        .localCheckpoint(eager=False)
    )

    persisted = [qv, cent]
    assign = None
    for _ in range(iters):
        d = (
            qv.join(F.broadcast(cent), "_pos")
            .groupBy("_id", "_cid")
            .agg(
                F.sum(
                    (F.col("_qv") - F.col("_qc"))
                    * (F.col("_qv") - F.col("_qc"))
                ).alias("_d")
            )
        )
        assign = (
            d.groupBy("_id")
            .agg(F.min(F.struct("_d", "_cid")).alias("_m"))
            .select(
                "_id",
                F.col("_m._cid").alias("_cid"),
                F.col("_m._d").alias("_dist"),
            )
            .localCheckpoint(eager=False)
        )
        cent = (
            qv.join(assign.select("_id", "_cid"), "_id")
            .groupBy("_cid", "_pos")
            .agg(F.sum("_qv").alias("_s"), F.count(F.lit(1)).alias("_n"))
            .select(
                "_cid",
                "_pos",
                F.floor(
                    (F.lit(2) * F.col("_s") + F.col("_n")).cast("double")
                    / (F.lit(2) * F.col("_n")).cast("double")
                )
                .cast("bigint")
                .alias("_qc"),
            )
            .localCheckpoint(eager=False)
        )
        persisted.extend([assign, cent])

    out_assign = assign.select(
        F.col("_id").alias(id_col),
        F.col("_cid").alias("cluster_id"),
        F.col("_dist").alias("dist_q"),
    )
    out_cent = cent.select(
        F.col("_cid").alias("cluster_id"),
        F.col("_pos").alias("pos"),
        F.col("_qc").alias("qc"),
    )
    out_assign._dlt_persisted = persisted
    return out_assign, out_cent


def embedding_covariance(
    df: DataFrame,
    vec_col: str = "embedding",
    decimals: int = 9,
) -> DataFrame:
    """Covariance matrix of an embedding column — the distributed half
    of PCA / whitening / drift detection: the d x d covariance is the
    only corpus-sized computation, after which eigendecomposition runs
    on the driver over d^2 scalars (d is 16-4096 by construction, so
    the matrix is bytes, not data).

    Returns the upper triangle ``(i, j, n, cov)`` with ``i <= j`` and
    ``cov = (n * S_ij - S_i * S_j) / n^2`` (population covariance),
    rounded half-away-from-zero to ``decimals``.

    Engine-exactness: components quantize to integer micros BEFORE any
    aggregation, so ``S_ij = sum q_i q_j``, ``S_i = sum q_i`` are exact
    (decimal(38,0) accumulators — q_i q_j reaches 1e12 per row, 1e12 * n
    overall, past BIGINT at corpus scale), and the single floating-point
    step is the final division of two exact integers, identical under
    any partitioning and in the SQL oracle.

    Plan: one posexplode of the quantized vector, the pair fan-out
    (d*(d+1)/2 terms per row) generated in-task from the grouped array
    (same shape as the wedge fan-out in ``graph._wedge_fanout``), one
    groupBy (i, j) — a single shuffle of n * d^2/2 narrow rows with full
    map-side partial aggregation."""
    q = df.select(
        F.transform(
            F.col(vec_col),
            # floor(x*1e6 + 0.5): the repo's engine-portable quantizer
            # (identical for negative components, where round-half-up
            # and round-half-away diverge between engines)
            lambda x: F.floor(
                x.cast("double") * F.lit(1e6) + F.lit(0.5)
            ).cast("bigint"),
        ).alias("_q")
    )
    pairs = (
        q.select(F.posexplode("_q").alias("_i", "_vi"), F.col("_q"))
        .select("_i", "_vi", F.posexplode("_q").alias("_j", "_vj"))
        .filter(F.col("_i") <= F.col("_j"))
    )
    agg = pairs.groupBy(F.col("_i").alias("i"), F.col("_j").alias("j")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("_vi") * F.col("_vj")).cast("decimal(38,0)")).alias("_sij"),
        F.sum(F.col("_vi").cast("decimal(38,0)")).alias("_si"),
        F.sum(F.col("_vj").cast("decimal(38,0)")).alias("_sj"),
    )
    cov = (
        (F.col("n") * F.col("_sij") - F.col("_si") * F.col("_sj"))
        .cast("double")
        / (F.col("n") * F.col("n")).cast("double")
        / F.lit(1e12)
    )
    return agg.select(
        "i", "j", "n", F.round(cov, decimals).alias("cov")
    ).orderBy("i", "j")


def top_eigen(cov_rows, dim: int, iters: int = 50):
    """Driver-side power iteration over a collected upper-triangle
    covariance (list of ``(i, j, cov)`` rows): returns ``(eigenvalue,
    eigenvector)`` of the leading component.  The matrix is d^2 scalars
    — collecting it is the POINT of :func:`embedding_covariance`'s
    split; no Spark job runs here."""
    import numpy as np

    m = np.zeros((dim, dim))
    for r in cov_rows:
        m[r["i"], r["j"]] = m[r["j"], r["i"]] = r["cov"]
    v = np.ones(dim) / dim ** 0.5
    for _ in range(iters):
        w = m @ v
        nrm = np.linalg.norm(w)
        if nrm == 0:
            return 0.0, v.tolist()
        v = w / nrm
    return float(v @ m @ v), v.tolist()


def quantize_embeddings_report(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Int8 scalar quantization audit — the embedding-compression step
    before ANN serving (4x memory cut):every vector gets a max-abs scale,
    each component maps to a code in [-127, 127], and the report returns
    ``(id, maxabs_q6, sum_err_q, mse)`` — the per-vector squared
    reconstruction error in integer micro^2 units plus its rounded mean.

    Engine-exact: components quantize to integer micros first; codes are
    ``floor(q * 127 / maxabs + 0.5)`` (floor-based half-up — identical
    for negative components, where engine round() conventions diverge);
    per-component squared errors floor-quantize to BIGINT before the
    sum, so aggregation is order-independent.  Pure map + one explode /
    groupBy per vector — no cross-row shuffle at all (the group key is
    the vector id the explode carried)."""
    q = df.select(
        F.col(id_col),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(
                x.cast("double") * F.lit(1e6) + F.lit(0.5)
            ).cast("bigint"),
        ).alias("_q"),
    )
    q = q.withColumn(
        "_ma",
        F.array_max(F.transform(F.col("_q"), lambda v: F.abs(v))),
    )
    ex = q.select(id_col, "_ma", F.explode("_q").alias("_v"))
    code = F.when(F.col("_ma") == 0, F.lit(0).cast("bigint")).otherwise(
        F.floor(
            F.col("_v").cast("double") * F.lit(127.0)
            / F.col("_ma").cast("double")
            + F.lit(0.5)
        ).cast("bigint")
    )
    recon = (
        code.cast("double") * F.col("_ma").cast("double") / F.lit(127.0)
    )
    err_q = F.floor(
        (F.col("_v").cast("double") - recon)
        * (F.col("_v").cast("double") - recon)
        + F.lit(0.5)
    ).cast("bigint")
    return (
        ex.select(id_col, "_ma", err_q.alias("_e"))
        .groupBy(id_col, F.col("_ma").alias("maxabs_q6"))
        .agg(
            F.sum("_e").alias("sum_err_q"),
            F.count(F.lit(1)).alias("_n"),
        )
        .select(
            id_col,
            "maxabs_q6",
            "sum_err_q",
            # mse rounded to 12 decimals == round-half-up(sum/n) at
            # micro^2 precision.  Computed as EXACT integer division —
            # engine round(double, 12) implementations diverge by one
            # ULP on boundary values (r9: two sf0.1 vectors hashed
            # differently vs DuckDB); one int->double cast + one IEEE
            # divide is bit-identical everywhere.
            (
                F.expr("(2 * sum_err_q + _n) div (2 * _n)").cast("double")
                / F.lit(1e12)
            ).alias("mse"),
        )
        .orderBy(id_col)
    )
