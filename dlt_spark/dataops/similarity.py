"""Similarity search over embedding columns (array<float>).

Beyond-reference operators (BASELINE.json north star):

- :func:`cosine_topk` — exact brute-force top-k: one narrow projection
  computing the dot product via ``zip_with``/``aggregate`` (JVM codegen),
  then a k-row ``orderBy``+``limit`` which Spark executes as TakeOrdered
  (per-partition heaps + driver merge of k·P rows, never a full sort);
- :func:`lsh_index` / :func:`lsh_topk` — random-hyperplane LSH: sign
  signature via deterministic seeded hyperplanes, candidates share a
  signature prefix bucket, exact re-rank inside the bucket.  The scale
  path: index once, probe with a bucket equi-join instead of a full scan;
- :func:`ivf_index` / :func:`ivf_topk` — IVF-flat: k-means-lite
  centroids (seeded sample, few Lloyd iterations computed as DataFrame
  aggregations), vectors assigned to nearest centroid partition; queries
  probe the ``nprobe`` nearest centroids only.

Everything is pure DataFrame ops; the only driver-side data is the query
vector and the (small) centroid set.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import cosine_sim


def _vec_lit(vec: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vec])


# -- SQL-string builders for literal-vector expressions (r10) ---------
#
# Building a literal-vector cosine through the Python Column API costs
# one py4j round-trip per element PLUS per lambda/function: profiling
# semantic_dedup's 8-centroid assignment showed 5,124 py4j commands /
# 16.6s of socket wait in query CONSTRUCTION alone.  Emitting the same
# expression as ONE parsed SQL string is a single round-trip; the
# operator tree (zip_with/aggregate folds, cast placement, op order) is
# kept structurally identical to the Column builders, so results are
# bit-identical.  Doubles ride as CAST('<repr>' AS DOUBLE) — exact
# round-trip on any engine, no lexer edge cases.


def _dlit_sql(x: float) -> str:
    return f"CAST('{float(x)!r}' AS DOUBLE)"


def _arr_lit_sql(vec: Sequence[float]) -> str:
    return "array(" + ",".join(_dlit_sql(x) for x in vec) + ")"


def _dot_lit_sql(vec_col: str, vec: Sequence[float], cast_y: bool) -> str:
    """``vec_dot(col, literal)`` as SQL; ``cast_y`` mirrors whether the
    Column form casts the literal side (vec_dot does, the LSH
    signature/projection dots do not)."""
    y = "CAST(y AS DOUBLE)" if cast_y else "y"
    return (
        f"aggregate(zip_with(`{vec_col}`, {_arr_lit_sql(vec)}, "
        f"(x, y) -> CAST(x AS DOUBLE) * {y}), {_dlit_sql(0.0)}, "
        f"(acc, v) -> acc + v)"
    )


def _norm_sql(vec_expr: str) -> str:
    return (
        f"sqrt(aggregate({vec_expr}, {_dlit_sql(0.0)}, "
        f"(acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"
    )


def _cos_lit_sql(vec_col: str, vec: Sequence[float]) -> str:
    """``cosine_sim(col, literal)`` as SQL — same structure as
    ``dedup.cosine_sim``: dot / (norm(col) * norm(lit))."""
    return (
        f"({_dot_lit_sql(vec_col, vec, True)} / "
        f"({_norm_sql('`' + vec_col + '`')} * {_norm_sql(_arr_lit_sql(vec))}))"
    )


def cosine_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    decimals: int = 6,
) -> DataFrame:
    """Exact top-k by cosine similarity against a literal query vector.
    Returns (id, cosine) ordered desc, ties broken by id asc for
    determinism."""
    scored = df.select(
        F.col(id_col),
        F.round(F.expr(_cos_lit_sql(vec_col, query_vec)), decimals).alias(
            "cosine"
        ),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


# ------------------------------------------------------ hyperplane LSH


def _hyperplanes(dim: int, num_planes: int, seed: int = 42) -> List[List[float]]:
    """Deterministic pseudo-random hyperplanes via a seeded LCG — no
    numpy requirement at call sites, reproducible across engines."""
    out: List[List[float]] = []
    state = seed
    for _ in range(num_planes):
        plane = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            # map to (-1, 1)
            plane.append(((state >> 11) / float(1 << 53)) * 2.0 - 1.0)
        out.append(plane)
    return out


def lsh_signature(vec_col, planes: List[List[float]]) -> Column:
    """Sign-bit signature string, e.g. '1011...' — one bit per plane.

    Pass the column NAME to use the single-round-trip SQL builder
    (structurally identical expression — see ``_cos_lit_sql``); a
    Column keeps the per-element Python construction."""
    if isinstance(vec_col, str):
        bits = [
            f"(CASE WHEN {_dot_lit_sql(vec_col, p, False)} >= 0 "
            f"THEN '1' ELSE '0' END)"
            for p in planes
        ]
        return F.expr("concat(" + ",".join(bits) + ")")
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(vec_col, _vec_lit(p), lambda x, y: x.cast("double") * y),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            >= 0,
            F.lit("1"),
        ).otherwise(F.lit("0"))
        for p in planes
    ]
    return F.concat(*bits)


def lsh_index(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Attach the LSH bucket signature; persist/bucket-by this column for
    repeated probes (`df.write.bucketBy(num_buckets, '_lsh_bucket')`)."""
    planes = _hyperplanes(dim, num_planes, seed)
    return df.withColumn("_lsh_bucket", lsh_signature(vec_col, planes))


def lsh_topk(
    indexed: DataFrame,
    query_vec: Sequence[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    num_planes: int = 16,
    max_hamming: int = 2,
    seed: int = 42,
    decimals: int = 6,
) -> DataFrame:
    """Probe an LSH index: candidates whose signature is within
    ``max_hamming`` bits of the query signature, exact cosine re-rank.
    Recall/cost dial: ``max_hamming`` (0 = single bucket)."""
    planes = _hyperplanes(len(query_vec), num_planes, seed)
    qsig = "".join(
        "1" if sum(q * w for q, w in zip(query_vec, p)) >= 0 else "0" for p in planes
    )
    # hamming distance between signature strings, JVM-side
    diff = sum(
        (F.substring(F.col("_lsh_bucket"), i + 1, 1) != qsig[i]).cast("int")
        for i in range(num_planes)
    )
    candidates = indexed.filter(diff <= max_hamming)
    return cosine_topk(candidates, query_vec, id_col, vec_col, k, decimals)


# ----------------------------------------------------------- IVF-flat


def _assign_cells(
    frame: DataFrame, vec_col: str, centroids: list, keep_centrality: bool = False
) -> DataFrame:
    """Shared centroid assignment: all centroid cosines land in ONE
    array column so each is evaluated once — a when-chain argmax
    re-inlines every (interpreted, higher-order-function) cosine into
    the nested branches and blows the expression tree up combinatorially
    (measured ~6x slower at 8 centroids).  ``array_position`` of the max
    takes the FIRST hit, preserving smallest-index tie-breaks.  With
    ``keep_centrality`` the max cosine survives as ``_ivf_cos_max``."""
    from .dedup import cosine_sim

    cos_arr = F.expr(
        "array(" + ",".join(_cos_lit_sql(vec_col, c) for c in centroids) + ")"
    )
    out = frame.withColumn("_ivf_cos", cos_arr).withColumn(
        "_ivf_cell",
        (F.array_position(F.col("_ivf_cos"), F.array_max(F.col("_ivf_cos"))) - 1).cast("int"),
    )
    if keep_centrality:
        out = out.withColumn("_ivf_cos_max", F.array_max(F.col("_ivf_cos")))
    return out.drop("_ivf_cos")


def ivf_index(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_centroids: int = 16,
    iters: int = 2,
    seed: int = 42,
) -> tuple:
    """Build an IVF-flat index: hash-ranked seed centroids refined with a
    few Lloyd iterations, each a ``groupBy(centroid).avg`` DataFrame
    pass.  Returns (assigned_df_with `_ivf_cell`, centroids list).  At
    100 TB the assignment pass is one scan; centroids stay driver-side
    (tiny).

    Seeds are the ``num_centroids`` vectors with the smallest
    ``sha256(seed:id)`` — deterministic across partitioning, task
    retries, and engines (``df.sample`` is per-partition seeded, so its
    output changes with the partition layout).  With ``iters=0`` the
    whole index is bit-reproducible (Lloyd's float averages are
    order-dependent), which is what the DuckDB oracle checks."""
    hcol = F.conv(
        F.substring(
            F.sha2(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")), 256), 1, 13
        ),
        16,
        10,
    ).cast("bigint")
    sample_rows = (
        df.select(F.col(vec_col), hcol.alias("_h")).orderBy("_h").limit(num_centroids).collect()
    )
    if len(sample_rows) < num_centroids:
        raise ValueError("not enough vectors to build IVF index")
    centroids = [list(map(float, sample_rows[i][0])) for i in range(num_centroids)]

    def assign(frame: DataFrame) -> DataFrame:
        return _assign_cells(frame, vec_col, centroids)

    for _ in range(iters):
        assigned = assign(df)
        dim = len(centroids[0])
        agg = assigned.groupBy("_ivf_cell").agg(
            *[F.avg(F.col(vec_col)[i]).alias(f"c{i}") for i in range(dim)]
        )
        for row in agg.collect():
            centroids[row["_ivf_cell"]] = [row[f"c{i}"] for i in range(dim)]
    return assign(df), centroids


def ivf_topk(
    indexed: DataFrame,
    centroids: List[List[float]],
    query_vec: Sequence[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 4,
    decimals: int = 6,
) -> DataFrame:
    """Probe the ``nprobe`` nearest cells, exact re-rank inside them —
    partition pruning does the rest when the index is written
    ``partitionBy('_ivf_cell')``."""

    def cos(a: Sequence[float], b: Sequence[float]) -> float:
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        return dot / (na * nb) if na and nb else -1.0

    order = sorted(range(len(centroids)), key=lambda i: -cos(query_vec, centroids[i]))
    cells = order[:nprobe]
    return cosine_topk(
        indexed.filter(F.col("_ivf_cell").isin(cells)), query_vec, id_col, vec_col, k, decimals
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_centroids: int = 16,
    threshold: float = 0.95,
    iters: int = 0,
    seed: int = 42,
    decimals: int = 6,
    max_cell_size: Optional[int] = 8000,
    use_kernel: bool = True,
    quantize_bits: int = 20,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: cluster embeddings (IVF
    cells), compare pairs ONLY within a cell, and drop every row whose
    cell contains a lower-id row with cosine >= ``threshold``.

    This is the scalable form of embedding near-dedup for corpora where
    even LSH-bucket candidate generation is too wide: the cell
    assignment is one scan, and the quadratic comparison is confined to
    single cells.  Size ``num_centroids`` so the expected cell is a few
    thousand rows (k ~ n / target_cell_size) — the intra-cell join is
    then bounded regardless of corpus size, and cells parallelize
    across the cluster.  Cross-cell duplicates are missed by design
    (the SemDeDup approximation); raise ``iters`` for tighter cells
    when determinism vs an external oracle is not required.

    ``max_cell_size`` bounds the quadratic stage when ``num_centroids``
    was sized for a smaller corpus than the one that arrived (fixed k
    over growing n is the classic way this goes quadratic): cells above
    the cap are subdivided by a hash-salt into ceil(size/cap) sub-cells
    and pairs are confined to sub-cells, making total pair count
    <= n * cap / 2 — LINEAR in n at fixed cap.  Subdivision is one more
    approximation of the same kind SemDeDup already makes at cell
    boundaries; it only activates on oversized cells, so small-corpus
    results (and the oracle) are unchanged.  ``None`` disables.

    ``use_kernel`` (default) runs the intra-cell pairwise stage as an
    Arrow-batched numpy kernel over INTEGER-QUANTIZED vectors
    (``round(x * 2^quantize_bits)``): every dot product is a sum of
    integers below 2^52, exact in float64 regardless of summation
    order, so BLAS matmul, the JVM fold, and the SQL oracle agree
    bit-for-bit — and the kernel is ~100x faster than the interpreted
    per-pair fold (measured 167s -> seconds on a 100k-vector cell set).
    ``use_kernel=False`` keeps the pure-Column float path (rounded to
    ``decimals`` before the threshold compare).

    Returns the surviving rows with their ``cell`` id.
    """
    from .dedup import vec_dot, vec_norm

    indexed, _ = ivf_index(
        df, id_col=id_col, vec_col=vec_col, num_centroids=num_centroids,
        iters=iters, seed=seed,
    )
    # the assignment (k interpreted cosines per row) feeds BOTH the
    # loser search and the final anti-join — truncate the lineage so it
    # is computed once, not twice (it dominates once the pairwise stage
    # is the vectorized kernel)
    indexed = indexed.localCheckpoint(eager=False)
    # norm precomputed per ROW (not per pair): the intra-cell join then
    # evaluates one interpreted dot per pair instead of three
    # higher-order aggregations — bit-identical cosine, ~3x less work
    slim = indexed.select(
        F.col("_ivf_cell").alias("cell"),
        F.col(id_col),
        F.col(vec_col),
        vec_norm(F.col(vec_col)).alias("_nrm"),
    )
    if max_cell_size:
        sizes = slim.groupBy("cell").agg(F.count(F.lit(1)).alias("_csz"))
        nsub = F.ceil(F.col("_csz") / F.lit(max_cell_size)).cast("int")
        slim = slim.join(F.broadcast(sizes), "cell").withColumn(
            "_sub",
            F.when(
                F.col("_csz") <= max_cell_size, F.lit(0)
            ).otherwise(
                F.pmod(
                    F.conv(
                        F.substring(
                            F.sha2(F.concat(F.lit("sub:"), F.col(id_col).cast("string")), 256),
                            1, 13,
                        ),
                        16, 10,
                    ).cast("bigint"),
                    nsub,
                )
            ),
        ).drop("_csz")
    else:
        slim = slim.withColumn("_sub", F.lit(0))
    if use_kernel:
        qscale = float(1 << quantize_bits)
        qv = F.transform(
            F.col(vec_col), lambda x: F.round(x.cast("double") * F.lit(qscale))
        )
        qbase = slim.select("cell", "_sub", F.col(id_col), qv.alias("_qv"))
        id_type = qbase.schema[id_col].dataType.simpleString()
        thr = float(threshold)

        def _losers(pdf):
            import numpy as np
            import pandas as pd

            if len(pdf) < 2:
                return pd.DataFrame({id_col: pdf[id_col][:0]})
            order = pdf[id_col].to_numpy().argsort(kind="stable")
            ids = pdf[id_col].to_numpy()[order]
            M = np.stack(pdf["_qv"].to_numpy()[order]).astype(np.float64)
            G = M @ M.T                      # exact: integer-valued < 2^52
            n = np.sqrt(np.diag(G))
            with np.errstate(divide="ignore", invalid="ignore"):
                C = G / np.outer(n, n)
            # loser = any LOWER id in the group with cosine >= threshold
            mask = np.zeros(len(ids), dtype=bool)
            tri = np.tril(C >= thr, -1)      # rows vs strictly-lower ids
            mask = tri.any(axis=1)
            return pd.DataFrame({id_col: ids[mask]})

        losers = qbase.groupBy("cell", "_sub").applyInPandas(
            _losers, schema=f"{id_col} {id_type}"
        )
    else:
        a = slim.alias("a")
        b = slim.alias("b")
        cos = F.round(
            vec_dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
            / (F.col("a._nrm") * F.col("b._nrm")),
            decimals,
        )
        losers = (
            a.join(
                b,
                (F.col("a.cell") == F.col("b.cell")) & (F.col("a._sub") == F.col("b._sub")),
            )
            .filter(F.col(f"a.{id_col}") > F.col(f"b.{id_col}"))
            .filter(cos >= threshold)
            .select(F.col(f"a.{id_col}").alias(id_col))
            .distinct()
        )
    return (
        indexed.withColumnRenamed("_ivf_cell", "cell")
        .join(losers, id_col, "left_anti")
    )


# ------------------------------------------------ product quantization


def pq_codebooks(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_subspaces: int = 8,
    num_codes: int = 16,
    seed: int = 42,
) -> list:
    """Deterministic PQ codebooks: the vector is split into
    ``num_subspaces`` contiguous slices; subspace s's ``num_codes``
    codewords are the s-slices of the ``num_codes`` vectors with the
    smallest ``sha256(seed:id)`` — the same hash-ranked seeding as
    :func:`ivf_index` (``iters=0``), so the whole codebook is
    bit-reproducible across partitioning, retries, and engines.

    Returns ``codebooks[s][c] -> list[float]`` (len dim/num_subspaces).
    Memory story at 100 TB: a 64-dim float32 vector (256 B) encodes to
    8 nibble codes (≈4 B) — a 64x smaller table to scan for candidate
    generation, with exact re-ranking only on the survivors."""
    hcol = F.conv(
        F.substring(
            F.sha2(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")), 256),
            1,
            13,
        ),
        16,
        10,
    ).cast("bigint")
    rows = (
        df.select(F.col(vec_col), hcol.alias("_h"))
        .orderBy("_h")
        .limit(num_codes)
        .collect()
    )
    if len(rows) < num_codes:
        raise ValueError("not enough vectors to build PQ codebooks")
    seeds = [list(map(float, r[0])) for r in rows]
    dim = len(seeds[0])
    if dim % num_subspaces:
        raise ValueError(f"dim {dim} not divisible by {num_subspaces} subspaces")
    sd = dim // num_subspaces
    return [
        [seeds[c][s * sd : (s + 1) * sd] for c in range(num_codes)]
        for s in range(num_subspaces)
    ]


def _pq_encode_arrow(codebooks: list):
    """pandas_udf: vector -> array<int> PQ codes.  The squared-diff
    accumulation runs SEQUENTIALLY over the in-subspace dimension (a
    Python loop of vectorized adds, not numpy's pairwise-summed
    ``.sum()``), so every distance is bit-identical to the left-
    associated Column/SQL formulation; ``argmin`` takes the first hit =
    smallest code, matching the oracle's ``ORDER BY d, code``."""
    import numpy as np

    CB = np.array(codebooks, dtype=np.float64)  # (S, C, sd)
    S, C, sd = CB.shape

    @F.pandas_udf("array<int>")
    def _udf(vecs: pd.Series) -> pd.Series:
        out = []
        vals = [None if v is None else np.asarray(v, dtype=np.float64) for v in vecs]
        idx = [i for i, v in enumerate(vals) if v is not None]
        codes_all: list = [None] * len(vals)
        if idx:
            X = np.stack([vals[i] for i in idx])
            codes = np.empty((len(idx), S), dtype=np.int32)
            for s in range(S):
                Xs = X[:, s * sd : (s + 1) * sd]
                acc = np.zeros((len(idx), C))
                for i in range(sd):
                    d = Xs[:, i : i + 1] - CB[s, :, i][None, :]
                    acc = acc + d * d
                codes[:, s] = acc.argmin(axis=1)
            for j, i in enumerate(idx):
                codes_all[i] = codes[j]
        return pd.Series(codes_all)

    return _udf


def pq_encode(
    df: DataFrame,
    codebooks: list,
    vec_col: str = "embedding",
    use_arrow: bool = True,
) -> DataFrame:
    """Attach ``_pq_codes`` (array<int>, one code per subspace): per
    subspace the L2²-nearest codeword, ties to the smallest code.

    Default path is the Arrow/numpy kernel — the explicit Column
    formulation expands to subspaces × codes × dims squared-diff terms
    (1024 for 64-dim/8×16), a tree big enough to fall out of efficient
    codegen (measured ~10s for 600 rows vs ~0.1s vectorized).  Both
    paths produce bit-identical codes (fixed accumulation order; parity
    pinned by unit test), and the Column path remains the 1:1 mirror of
    the DuckDB oracle SQL."""
    if use_arrow:
        return df.withColumn("_pq_codes", _pq_encode_arrow(codebooks)(F.col(vec_col)))
    codes = []
    for s, cb in enumerate(codebooks):
        sd = len(cb[0])
        dists = []
        for cw in cb:
            acc = None
            for i, c in enumerate(cw):
                d = F.element_at(F.col(vec_col), s * sd + i + 1).cast("double") - F.lit(c)
                t = d * d
                acc = t if acc is None else acc + t
            dists.append(acc)
        arr = F.array(*dists)
        codes.append((F.array_position(arr, F.array_min(arr)) - 1).cast("int"))
    return df.withColumn("_pq_codes", F.array(*codes))


def pq_adc_topk(
    encoded: DataFrame,
    codebooks: list,
    query_vec: Sequence[float],
    id_col: str = "vec_id",
    k: int = 10,
    decimals: int = 6,
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: the query→codeword L2²
    table (num_subspaces × num_codes doubles) is computed driver-side
    and inlined; each row's approximate distance is ``num_subspaces``
    array lookups + adds — the scan never touches the original vectors.
    Returns ``(id, approx_dist)`` ascending, ties to smallest id, as a
    TakeOrdered (per-partition heaps, no global sort)."""
    approx = None
    for s, cb in enumerate(codebooks):
        sd = len(cb[0])
        qs = [float(v) for v in query_vec[s * sd : (s + 1) * sd]]
        dt = []
        for cw in cb:
            acc = 0.0
            for i in range(sd):
                d = qs[i] - cw[i]
                acc = acc + d * d
            dt.append(acc)
        term = F.element_at(
            F.array(*[F.lit(v) for v in dt]),
            F.element_at(F.col("_pq_codes"), s + 1) + 1,
        )
        approx = term if approx is None else approx + term
    scored = encoded.select(
        F.col(id_col), F.round(approx, decimals).alias("approx_dist")
    )
    return scored.orderBy(F.col("approx_dist").asc(), F.col(id_col).asc()).limit(k)


# ------------------------------------------------- hard-negative mining


def hard_negatives(
    corpus: DataFrame,
    anchors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
    min_cosine: Optional[float] = None,
    decimals: int = 6,
) -> DataFrame:
    """Contrastive hard-negative mining: for each anchor vector, the
    top-``k`` most cosine-similar corpus vectors carrying a DIFFERENT
    label (the anchor itself excluded) — the standard negatives source
    for training retrieval / embedding models.

    Scale shape: the anchor side is a training batch (bounded, e.g.
    <=4096 rows) and is broadcast, so the corpus is scanned ONCE with a
    BroadcastNestedLoopJoin scoring n*a pairs JVM-side; the per-anchor
    top-k runs as one window over (anchor_id).  ``min_cosine`` prunes
    the scored stream BEFORE the shuffle — with a sane floor (e.g. 0.0)
    the exchanged volume drops from n*a to roughly the candidates that
    could place.  For unbounded anchor sets use :func:`ivf_topk` per
    anchor over an IVF index instead of this exact form.
    """
    from pyspark.sql import Window

    a = anchors.select(
        F.col(id_col).alias("anchor_id"),
        F.col(vec_col).alias("_avec"),
        F.col(label_col).alias("_albl"),
    )
    scored = corpus.join(
        F.broadcast(a),
        (F.col(label_col) != F.col("_albl"))
        & (F.col(id_col) != F.col("anchor_id")),
    ).select(
        "anchor_id",
        F.col(id_col).alias("negative_id"),
        F.round(cosine_sim(F.col(vec_col), F.col("_avec")), decimals).alias(
            "cosine"
        ),
    )
    if min_cosine is not None:
        scored = scored.filter(F.col("cosine") >= float(min_cosine))
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cosine").desc(), F.col("negative_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .orderBy("anchor_id", "rank")
    )


# -------------------------------------- random-projection reduction


def random_projection(
    df: DataFrame,
    dim: int,
    out_dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    decimals: int = 6,
    out_col: str = "rp_embedding",
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction: project each
    embedding onto ``out_dim`` deterministic seeded hyperplanes (the
    same generator the LSH index uses) scaled by ``1/sqrt(out_dim)``,
    so pairwise distances are preserved in expectation.

    The standard pre-step before brute-force or IVF search when the
    raw dimension dominates cost: a 64->16 projection cuts every
    downstream cosine to a quarter of the work for a bounded recall
    loss.  Pure ``zip_with``/``aggregate`` column expressions — one
    narrow projection, no shuffle, whole-stage codegen."""
    planes = _hyperplanes(dim, out_dim, seed)
    scale = 1.0 / math.sqrt(out_dim)
    q = float(10 ** decimals)
    comps = [
        # explicit integer HALF_UP (floor(x*10^d + 0.5)/10^d) — engine-
        # portable quantization (round() tie-breaking differs between
        # engines: Spark half-up, DuckDB half-even).  One parsed SQL
        # string per component (see _cos_lit_sql): the Column form cost
        # a py4j round-trip per plane element in construction.
        f"(floor({_dot_lit_sql(vec_col, p, False)} * {_dlit_sql(scale * q)} "
        f"+ {_dlit_sql(0.5)}) / {_dlit_sql(q)})"
        for p in planes
    ]
    return df.select(
        F.col(id_col), F.expr("array(" + ",".join(comps) + ")").alias(out_col)
    )


def cell_representatives(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_centroids: int = 16,
    per_cell: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Coverage-driven diverse subset selection: keep the ``per_cell``
    most central vectors of every IVF cell — the scalable stand-in for
    facility-location / MMR selection (greedy MMR is inherently
    sequential; per-cluster representatives are the standard distributed
    relaxation, cf. SemDeDup's cluster pruning).

    Returns ``(id_col, cell, centrality, rep_rank)``; ``centrality`` is
    the cosine to the assigned centroid rounded to 6 decimals (ranking
    happens on the rounded value with an id tie-break, so selection is
    total-ordered and engine-exact).

    Scale shape: centroid seeding is a TakeOrdered over sha-ranked ids
    (deterministic under any partitioning); assignment + centrality is
    one codegen scan with all centroid cosines in a single array column
    (each evaluated once); the per-cell rank compiles to
    WindowGroupLimit — per-partition top-k, no global sort."""
    from pyspark.sql import Window

    _, centroids = ivf_index(df, id_col, vec_col, num_centroids, iters=0, seed=seed)
    assigned = (
        _assign_cells(df, vec_col, centroids, keep_centrality=True)
        .withColumnRenamed("_ivf_cell", "cell")
        .withColumn("centrality", F.round(F.col("_ivf_cos_max"), 6))
        .drop("_ivf_cos_max")
    )
    w = Window.partitionBy("cell").orderBy(
        F.col("centrality").desc(), F.col(id_col).asc()
    )
    return (
        assigned.withColumn("rep_rank", F.row_number().over(w))
        .filter(F.col("rep_rank") <= per_cell)
        .select(id_col, "cell", "centrality", "rep_rank")
    )
