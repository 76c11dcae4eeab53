"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Beyond-reference operators (BASELINE.json north star) for training-data
pipelines, each designed for the 100 TB regime:

- **exact**: hash-groupBy on a content fingerprint — one shuffle on a
  short hash key, min-id winner is deterministic;
- **n-gram Jaccard**: shingle -> inverted-index self-join -> pair counts.
  The join key is the shingle hash, so common-shingle skew is the risk at
  scale: pass ``max_shingle_freq`` to drop stop-shingles (standard
  positional-filtering trick) before the join;
- **MinHash + LSH**: k portable hash functions (sha256-based, engine- and
  oracle-reproducible), banded into b bands x r rows; candidate pairs
  only form inside a band bucket — the join fan-out is controlled by the
  band width, never all-pairs;
- **SimHash**: 64-bit signed-projection hash; near-dups differ in few
  bits — bucket by bit-blocks for candidate generation;
- **embedding cosine**: exact threshold-join for bounded sets, LSH
  (random hyperplane) bucketing as the scale path.

Two execution paths per text operator: a pure-column reference path
(engine-portable, mirrors the DuckDB oracle SQL 1:1) and an Arrow-batched
numpy kernel (default) for the shingle/MinHash math — Spark's
higher-order functions are CodegenFallback (always interpreted), so the
vectorized Arrow kernel is ~6-8x faster while producing bit-identical
hashes (pinned by parity test).  Joins, aggregations and filters stay
JVM-side in both paths.
"""

from __future__ import annotations

import hashlib
import re
from typing import List, Optional, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import fingerprint, tokens


def portable_hash64(col: Column, seed: int = 0) -> Column:
    """Deterministic 60-bit hash reproducible in any engine with sha256:
    ``('0x' || substr(sha256(seed || ':' || x), 1, 15))::BIGINT``.
    (xxhash64 would be faster but is not reproducible in the DuckDB
    oracle; swap via the ``fast=True`` path when parity is not needed.)"""
    return F.conv(
        F.substring(F.sha2(F.concat(F.lit(f"{seed}:"), col), 256), 1, 15), 16, 10
    ).cast("bigint")


def shingles(text: Column, n: int = 5) -> Column:
    """Word n-gram shingles as an array<string>.
    SQL: ``list_transform(generate_series(1, greatest(len(toks)-n+1, 1)),
    i -> array_to_string(list_slice(toks, i, i+n-1), ' '))``."""
    t = tokens(F.lower(text))
    cnt = F.greatest(F.size(t) - n + 1, F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), cnt), lambda i: F.array_join(F.slice(t, i, n), " ")
        )
    )


# Arrow-batched fast path.  Spark's higher-order functions (transform /
# aggregate / zip_with) are CodegenFallback — they ALWAYS run on the
# interpreted expression evaluator, never in whole-stage codegen, and the
# shingle+minhash pipeline nests three of them.  Measured on the bench
# corpus, the interpreted tree is ~6-8x slower than the same math done in
# an Arrow-batched numpy kernel, so the Arrow path is the default and the
# pure-column path stays as the engine-portable reference (both produce
# bit-identical signatures: same tokenizer regex, same sha256 recipe,
# same permutation constants — pinned by test_dataops parity test).

# Java's \s is ASCII-only ([ \t\n\x0B\f\r]); mirror it exactly so the
# Python tokenizer splits identically to tokens() = split(trim(x),'\s+').
_WS_RE = re.compile("[ \t\n\x0b\f\r]+")


def _shingle_set_py(text: Optional[str], n: int) -> List[str]:
    """Exact Python replica of ``shingles()``: lower, ASCII-ws split of
    the trimmed text, word n-grams (at least one, possibly short), dedup
    preserving first occurrence (array_distinct semantics)."""
    if text is None:
        return None
    # Spark's trim() strips only the space character — mirror exactly
    t = text.lower().strip(" ")
    toks = _WS_RE.split(t) if t else [""]
    cnt = max(len(toks) - n + 1, 1)
    seen: dict = {}
    for i in range(cnt):
        s = " ".join(toks[i : i + n])
        if s not in seen:
            seen[s] = None
    return list(seen)


def _shingles_arrow(n: int):
    """pandas_udf: text -> array<string> shingle set (parity with
    ``shingles``)."""

    @F.pandas_udf("array<string>")
    def _udf(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: _shingle_set_py(t, n))

    return _udf


def _minhash_signature_arrow(num_hashes: int, shingle_n: int):
    """pandas_udf: text -> array<bigint> MinHash signature, bit-identical
    to ``minhash_signature`` (sha256 base hash + universal-hash perms),
    with the k permutations vectorized in numpy."""
    params = minhash_params(num_hashes)
    av = np.array([a for a, _ in params], dtype=np.int64)[:, None]
    bv = np.array([b for _, b in params], dtype=np.int64)[:, None]

    @F.pandas_udf("array<bigint>")
    def _udf(texts: pd.Series) -> pd.Series:
        def sig(t):
            shs = _shingle_set_py(t, shingle_n)
            if shs is None:
                return None
            hs = np.fromiter(
                (
                    int(hashlib.sha256(("0:" + s).encode("utf-8")).hexdigest()[:15], 16)
                    % MINHASH_PRIME
                    for s in shs
                ),
                dtype=np.int64,
                count=len(shs),
            )
            return ((hs[None, :] * av + bv) % MINHASH_PRIME).min(axis=1)

        return texts.map(sig)

    return _udf


def _shingles_and_signature_arrow(num_hashes: int, shingle_n: int):
    """pandas_udf: text -> struct(sh array<string>, sig array<bigint>) —
    the fused kernel for :func:`minhash_dedup`, which needs BOTH the
    shingle sets (Jaccard verification) and the signatures (LSH
    buckets).  Separate kernels shingle every document twice; fusing
    them halves the Python-side text pass.  Bit-identical outputs to
    ``_shingles_arrow`` / ``_minhash_signature_arrow``."""
    params = minhash_params(num_hashes)
    av = np.array([a for a, _ in params], dtype=np.int64)[:, None]
    bv = np.array([b for _, b in params], dtype=np.int64)[:, None]

    @F.pandas_udf("struct<sh: array<string>, sig: array<bigint>>")
    def _udf(texts: pd.Series) -> pd.DataFrame:
        shs_list, sig_list = [], []
        for t in texts:
            shs = _shingle_set_py(t, shingle_n)
            if shs is None:
                shs_list.append(None)
                sig_list.append(None)
                continue
            hs = np.fromiter(
                (
                    int(hashlib.sha256(("0:" + s).encode("utf-8")).hexdigest()[:15], 16)
                    % MINHASH_PRIME
                    for s in shs
                ),
                dtype=np.int64,
                count=len(shs),
            )
            shs_list.append(shs)
            sig_list.append(((hs[None, :] * av + bv) % MINHASH_PRIME).min(axis=1))
        return pd.DataFrame({"sh": shs_list, "sig": sig_list})

    return _udf


# ---------------------------------------------------------------- exact


def exact_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    keep: str = "min",
) -> DataFrame:
    """Exact dedup on the normalized content fingerprint; keeps the
    min (or max) id per group.  One shuffle on the 64-hex-char hash."""
    agg = F.min(id_col) if keep == "min" else F.max(id_col)
    return (
        df.withColumn("_fp", fingerprint(F.col(text_col)))
        .groupBy("_fp")
        .agg(agg.alias(id_col), F.count(F.lit(1)).alias("dup_count"))
        .withColumnRenamed("_fp", "fingerprint")
    )


def drop_exact_dups(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Return df minus all-but-first duplicate rows (window, no join)."""
    w = Window.partitionBy(fingerprint(F.col(text_col))).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# ------------------------------------------------------- n-gram jaccard


def _common_shingle_counts(
    df: DataFrame,
    id_col: str,
    sh_expr,
    max_shingle_freq: Optional[int],
):
    """Shared inverted-index pair-counting core for
    :func:`jaccard_pairs` / :func:`containment_pairs`: returns
    ``(pairs, persisted)`` where ``pairs = (id_a, id_b, _common, _sza,
    _szb)`` — common-shingle count plus both docs' distinct-shingle-set
    sizes — and ``persisted`` is the DISK_ONLY handle to unpersist.

    r11 restructure (guide §2.3/§2.4), value-identical by construction:

    - doc sizes come from ``size()`` of the shingle ARRAY before the
      explode (the kernels emit distinct shingles, so the array size
      equals the old exploded ``groupBy(_id).count()``) — removes one
      full-index shuffle;
    - the sizes ride the inverted-index rows through the self-join as
      per-doc constants (4 bytes/row) and come out of the pair
      aggregation as ``min()`` — removes BOTH post-aggregation
      pair-table joins against the sizes table.

    Measured and REJECTED here (r11, VERDICT r10 #3): grouping the pair
    aggregation on the single-long packed key (``graph._pack_pair``).
    The gate needs a min/max stats job over the input ids (a full
    id-column scan at corpus scale, ~0.2s of fixed job latency at
    sf0.1), and unlike the wedge probe — where the pack switches the
    broadcast join's build to a primitive ``LongHashedRelation`` — a
    groupBy's map-side partial aggregation already collapses the pair
    rows, leaving only 8 bytes/row of key width on the exchange.  Warm
    interleaved A/B, 3 cycles: pack LOST every cycle vs this form
    (jaccard 1.10 vs 1.41 median) and vs the old two-join form; this
    form beat old 2/3 cycles on both queries.
    """
    from pyspark import StorageLevel

    arr = df.select(F.col(id_col).alias("_id"), sh_expr.alias("_shs"))
    sh = arr.select(
        "_id", F.size("_shs").alias("_sz"), F.explode("_shs").alias("_sh")
    )
    # the inverted index is consumed up to three times (the frequency
    # guard + both sides of the self-join) — persist it so the shingle
    # computation runs once.  DISK_ONLY: the exploded index is ~10-50x
    # input size; caching it deserialized in executor memory evicts
    # everything else at corpus scale.
    sh = persisted = sh.persist(StorageLevel.DISK_ONLY)
    if max_shingle_freq:
        freq_ok = (
            sh.groupBy("_sh")
            .agg(F.count(F.lit(1)).alias("_f"))
            .filter(F.col("_f") <= max_shingle_freq)
        )
        sh = sh.join(freq_ok.select("_sh"), "_sh", "left_semi")
    a = sh.select(F.col("_id").alias("id_a"), F.col("_sz").alias("_sza"), "_sh")
    b = sh.select(F.col("_id").alias("id_b"), F.col("_sz").alias("_szb"), "_sh")
    pairs = (
        a.join(b, "_sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("_common"),
            # _sza/_szb are constants per doc id, so min() just carries
            # them through the aggregation; cast back to bigint AFTER
            # the shuffle (the old sizes were count() longs — keeps
            # downstream arithmetic types identical)
            F.min("_sza").cast("bigint").alias("_sza"),
            F.min("_szb").cast("bigint").alias("_szb"),
        )
    )
    return pairs, persisted


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.8,
    max_shingle_freq: Optional[int] = 1000,
    use_arrow: bool = True,
) -> DataFrame:
    """Near-duplicate pairs by word-``n``-gram Jaccard similarity.

    Inverted-index plan: explode distinct shingles, self-join on the
    shingle, count common shingles per (a,b) pair, compute
    ``|A∩B| / (|A|+|B|-|A∩B|)``.  ``max_shingle_freq`` drops shingles
    appearing in more than that many docs before the join — the skew
    guard that keeps the self-join linear-ish at corpus scale.  It is ON
    by default (1000): one boilerplate stop-shingle shared by k docs
    contributes k² join rows, which is quadratic death on a web corpus.
    A dropped stop-shingle can only LOWER a pair's measured jaccard
    below true (never invent a false pair); pass ``None`` to disable for
    exact small-corpus audits.  Returns (id_a, id_b, jaccard) with
    id_a < id_b, jaccard rounded to 6.
    """
    sh_expr = (
        _shingles_arrow(n)(F.col(text_col)) if use_arrow else shingles(F.col(text_col), n)
    )
    # the returned DataFrame carries the persist handle in
    # ``_dlt_persisted`` — long-lived sessions should unpersist after
    # materializing the result.
    pairs, sh_persisted = _common_shingle_counts(df, id_col, sh_expr, max_shingle_freq)
    out = (
        pairs.withColumn(
            "jaccard",
            F.round(
                F.col("_common") / (F.col("_sza") + F.col("_szb") - F.col("_common")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    out._dlt_persisted = [sh_persisted]  # unpersist these after materializing
    return out


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.8,
    max_shingle_freq: Optional[int] = 1000,
    use_arrow: bool = True,
) -> DataFrame:
    """Asymmetric near-dup pairs by shingle CONTAINMENT:
    ``|A∩B| / min(|A|,|B|)`` — flags a short document quoted/excerpted
    inside a long one, which symmetric Jaccard structurally misses (the
    union term dilutes the score).  Same inverted-index plan and skew
    guard as :func:`jaccard_pairs`; output ``(id_a, id_b, containment,
    contained)`` with ``contained`` naming the smaller (contained) doc.
    """
    sh_expr = (
        _shingles_arrow(n)(F.col(text_col)) if use_arrow else shingles(F.col(text_col), n)
    )
    # shared restructured core — see _common_shingle_counts (r11)
    pairs, sh_persisted = _common_shingle_counts(df, id_col, sh_expr, max_shingle_freq)
    out = (
        pairs.withColumn(
            "containment",
            F.round(F.col("_common") / F.least(F.col("_sza"), F.col("_szb")), 6),
        )
        .filter(F.col("containment") >= threshold)
        .withColumn(
            "contained",
            F.when(F.col("_sza") <= F.col("_szb"), F.col("id_a")).otherwise(F.col("id_b")),
        )
        .select("id_a", "id_b", "containment", "contained")
    )
    out._dlt_persisted = [sh_persisted]  # unpersist these after materializing
    return out


# --------------------------------------------------------- minhash lsh

# 30-bit prime field for the universal-hash permutation family: products
# a*h stay < 2^60, overflow-free in any engine's signed 64-bit arithmetic
MINHASH_PRIME = 1073741789


def minhash_params(num_hashes: int) -> List[tuple]:
    """Deterministic (a_k, b_k) pairs for h_k(x) = (a_k*x + b_k) mod p —
    reproducible in the SQL oracle (shared constants, no RNG)."""
    p = MINHASH_PRIME
    return [
        (((k * 2654435761 + 1013904223) % (p - 1)) + 1, (k * 1013904223 + 12345) % p)
        for k in range(num_hashes)
    ]


def minhash_signature(text: Column, num_hashes: int = 64, shingle_n: int = 5) -> Column:
    """MinHash signature as array<bigint>.

    One sha256 **base hash per shingle** (the only expensive op), then
    ``num_hashes`` arithmetic permutations ``(a_k*h + b_k) mod p`` —
    the standard universal-hashing construction.  This keeps the codegen
    expression tree small and the per-row cost O(shingles + k) instead of
    O(shingles * k) sha256 calls.  Fully JVM-side."""
    base = F.transform(
        shingles(text, shingle_n), lambda s: portable_hash64(s, seed=0) % MINHASH_PRIME
    )

    def permute(a: int, b: int):
        return lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(MINHASH_PRIME)

    return F.array(
        *[
            F.array_min(F.transform(base, permute(a, b)))
            for a, b in minhash_params(num_hashes)
        ]
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 5,
    use_arrow: bool = True,
) -> DataFrame:
    """LSH candidate pairs: signatures banded into ``bands`` groups of
    ``num_hashes/bands`` rows; docs sharing any band bucket pair up.
    Join key = (band index, band hash) — tight buckets, no all-pairs.
    Returns distinct (id_a, id_b).

    ``use_arrow=True`` computes signatures in the Arrow-batched numpy
    kernel (bit-identical, ~6-8x faster: the column path's nested
    higher-order functions are CodegenFallback/interpreted); ``False``
    keeps the pure-column reference path."""
    buckets = minhash_buckets(df, id_col, text_col, num_hashes, bands, shingle_n, use_arrow)
    a = buckets.withColumnRenamed("_id", "id_a")
    b = buckets.withColumnRenamed("_id", "id_b")
    return (
        a.join(b, "_bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def _sig_to_buckets(
    sig: DataFrame, num_hashes: int, bands: int, checkpoint: bool = True
) -> DataFrame:
    """(_id, _sig array) → exploded (_id, _bucket) band-bucket table."""
    rows_per_band = num_hashes // bands
    # materialize the signatures once: (a) CollapseProject would otherwise
    # inline the signature expression into every per-band element access,
    # recomputing the whole shingle+hash pipeline per band (measured 30x+
    # slower), and (b) the bucket join consumes the lineage twice.
    # The signature table is tiny relative to the corpus ((id, k x int64)
    # per doc) — at full scale this is exactly the "persist the signature
    # index" step, so the materialization is the intended design, not a
    # workaround.  ``checkpoint=False`` when the caller already did.
    if checkpoint:
        # lazy (r10): eager ran the whole signature job during query
        # CONSTRUCTION — ~1-2s of driver latency per build before any
        # action; the lazy form materializes once at first use with the
        # same once-only compute
        sig = sig.localCheckpoint(eager=False)
    band_cols = [
        F.sha2(
            F.concat_ws(",", *[F.col("_sig")[b * rows_per_band + r].cast("string") for r in range(rows_per_band)]),
            256,
        ).alias(f"_band{b}")
        for b in range(bands)
    ]
    banded = sig.select("_id", *band_cols)
    return banded.select(
        "_id",
        F.explode(
            F.array(*[
                F.concat_ws("#", F.lit(str(b)), F.col(f"_band{b}")) for b in range(bands)
            ])
        ).alias("_bucket"),
    )


def minhash_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 5,
    use_arrow: bool = True,
) -> DataFrame:
    """Banded MinHash bucket table ``(_id, _bucket)`` for a corpus — the
    persistable LSH index consumed by self-join (within-corpus) and
    cross-corpus (:func:`dedup_against`) candidate generation.

    Null texts produce null signatures, which would all collapse onto one
    constant band hash (concat_ws skips nulls) — at corpus scale that is
    a quadratic candidate blow-up verification would then discard; they
    can never be near-dups, so they are dropped before signing."""
    df = df.filter(F.col(text_col).isNotNull())
    if use_arrow:
        sig = df.select(
            F.col(id_col).alias("_id"),
            _minhash_signature_arrow(num_hashes, shingle_n)(F.col(text_col)).alias("_sig"),
        )
    else:
        # two projections: base hashes materialize once per row, then the k
        # permutations reference the column (no 32x re-inline of the sha256);
        # flat array_min per permutation — nested higher-order functions
        # fall back to the interpreted evaluator (~6x slower, measured)
        base = df.select(
            F.col(id_col).alias("_id"),
            F.transform(
                shingles(F.col(text_col), shingle_n),
                lambda s: portable_hash64(s, seed=0) % MINHASH_PRIME,
            ).alias("_bh"),
        )

        def permute(a: int, b: int):
            return lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(MINHASH_PRIME)

        sig = base.select(
            "_id",
            F.array(
                *[
                    F.array_min(F.transform(F.col("_bh"), permute(a, b)))
                    for a, b in minhash_params(num_hashes)
                ]
            ).alias("_sig"),
        )
    return _sig_to_buckets(sig, num_hashes, bands)


def minhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 5,
    jaccard_threshold: float = 0.8,
    use_arrow: bool = True,
    max_candidates_per_doc: Optional[int] = 16,
) -> DataFrame:
    """Full MinHash-LSH near-dedup: candidates from LSH, verified by true
    shingle Jaccard, greedy keep-min-id.  Returns rows to KEEP.

    ``max_candidates_per_doc`` bounds the verification join on
    duplicate-DENSE corpora (measured: a corpus where every doc has ~100
    near-copies generates ~n*50 candidate pairs, and exact Jaccard over
    shingle arrays for tens of millions of pairs dominated a 100x scale
    probe at 777s).  Per id_b only the ``P`` smallest id_a partners are
    verified, ranked by SIGNATURE-estimated similarity (fraction of
    equal minhash components — a 32-int compare, ~10x cheaper than the
    exact shingle Jaccard it gates) with id as the tie-break: true
    near-dups outrank band-collision false positives, so the cap sheds
    the junk pairs first.  The greedy drop rule needs ONE similar lower
    id; in a full-group LSH bucket every partner estimates alike and
    the id tie-break keeps the group minimum, so the dup-dense case
    resolves unchanged while verification cost becomes O(n*P).  On
    sparse candidate graphs the cap rarely binds (and when it does, the
    estimate ordering keeps the pairs most likely to verify).  The
    ``use_arrow=False`` parity path caps by id order alone (signatures
    are not materialized there).  ``None`` disables.
    """
    # the input lineage is consumed three times (signatures, the shingle
    # verification table, the final anti-join); persist so an upstream
    # pipeline (filters, a prior window dedup) runs once, not three times
    df = df.persist()
    if use_arrow:
        # fused kernel: one Python text pass yields BOTH the shingle sets
        # (verification) and the signatures (buckets) — separate kernels
        # shingle every document twice
        both = df.filter(F.col(text_col).isNotNull()).select(
            F.col(id_col).alias("_id"),
            _shingles_and_signature_arrow(num_hashes, shingle_n)(F.col(text_col)).alias("_ss"),
        )
        both = both.localCheckpoint(eager=False)  # lazy — see _sig_to_buckets (r10)
        sig = both.select("_id", F.col("_ss.sig").alias("_sig"))
        buckets = _sig_to_buckets(sig, num_hashes, bands, checkpoint=False)
        ba = buckets.withColumnRenamed("_id", "id_a")
        bb = buckets.withColumnRenamed("_id", "id_b")
        cand = (
            ba.join(bb, "_bucket")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        sh = both.select("_id", F.col("_ss.sh").alias("_sh"))
    else:
        cand = minhash_lsh_candidates(
            df, id_col, text_col, num_hashes, bands, shingle_n, use_arrow=False
        )
        sh = df.select(
            F.col(id_col).alias("_id"), shingles(F.col(text_col), shingle_n).alias("_sh")
        )
    if max_candidates_per_doc:
        if use_arrow:
            # rank partners by minhash-signature agreement so the cap
            # drops likely-false-positive pairs, not arbitrary ones
            sa = sig.select(F.col("_id").alias("id_a"), F.col("_sig").alias("_siga"))
            sb = sig.select(F.col("_id").alias("id_b"), F.col("_sig").alias("_sigb"))
            est = F.size(
                F.filter(
                    F.zip_with("_siga", "_sigb", lambda x, y: x == y),
                    lambda v: v,
                )
            )
            cand = (
                cand.join(sa, "id_a")
                .join(sb, "id_b")
                .withColumn("_est", est)
                .drop("_siga", "_sigb")
            )
            wcap = Window.partitionBy("id_b").orderBy(
                F.col("_est").desc(), F.col("id_a").asc()
            )
        else:
            cand = cand.withColumn("_est", F.lit(0))
            wcap = Window.partitionBy("id_b").orderBy("id_a")
        cand = (
            cand.withColumn("_rn", F.row_number().over(wcap))
            .filter(F.col("_rn") <= max_candidates_per_doc)
            .drop("_rn", "_est")
        )
    verified = (
        cand.join(sh.withColumnRenamed("_id", "id_a").withColumnRenamed("_sh", "_sha"), "id_a")
        .join(sh.withColumnRenamed("_id", "id_b").withColumnRenamed("_sh", "_shb"), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("_sha", "_shb"))
            / F.size(F.array_union("_sha", "_shb")),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
    )
    # greedy: drop the larger id of each verified pair
    losers = verified.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


def build_dedup_index(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 5,
    use_arrow: bool = True,
) -> tuple:
    """Build the persistable cross-corpus dedup index for
    :func:`dedup_against`: ``(fingerprints, buckets)`` where
    fingerprints is the distinct content-hash set (`_fp`) and buckets
    the MinHash band table (`_id`, `_bucket`).

    Write both to the table store once per corpus version; per-batch
    dedup then never re-fingerprints or re-signs the corpus — the 100 TB
    ingest loop signs only the new batch.  After loading survivors,
    append THEIR fingerprints/buckets to the index tables (both are
    row-wise unions, no recompute) to keep the index current."""
    from .text import fingerprint

    nn = df.filter(F.col(text_col).isNotNull())
    fp = nn.select(fingerprint(F.col(text_col)).alias("_fp")).distinct()
    buckets = minhash_buckets(
        nn, id_col, text_col, num_hashes, bands, shingle_n, use_arrow
    )
    # stamp the hash-family params so dedup_against can refuse an index
    # built with a different recipe (silently-wrong buckets otherwise)
    buckets._dlt_index_params = (num_hashes, bands, shingle_n)
    return fp, buckets


def dedup_against(
    new: DataFrame,
    ref: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 5,
    jaccard_threshold: float = 0.8,
    use_arrow: bool = True,
    bloom_bits: int = 0,
    bloom_hashes: int = 5,
    ref_index: "Optional[tuple]" = None,
) -> DataFrame:
    """Incremental (cross-corpus) dedup: drop rows of ``new`` that are
    exact or near duplicates of the existing ``ref`` corpus — the
    "dedup this crawl against everything already ingested" operator.

    ``ref_index`` — the ``(fingerprints, buckets)`` pair from
    :func:`build_dedup_index`, persisted once per corpus version (e.g.
    two TableStore tables) — makes the per-batch cost independent of
    corpus size: only ``new`` is fingerprinted and signed, and the ref
    corpus is scanned solely to shingle the candidate ids the bucket
    join surfaces.  Results are identical with or without the index
    (same hash family, same banding).

    ``bloom_bits > 0`` additionally builds a broadcastable Bloom filter
    over the ref fingerprints (:func:`..sketches.bloom_sketch`) and
    prefilters the exact layer with it: rows the bloom rejects are
    definite non-duplicates and never enter the fingerprint anti-join
    shuffle.  Blooms have no false negatives, so the result set is
    IDENTICAL with the prefilter on or off — it is purely a shuffle-
    volume knob for the 100 TB case, where the ref corpus's bloom is
    built once per corpus version and broadcast per batch.  The build
    is an extra eager job over the ref fingerprints: turn it on when
    ``new`` is large relative to its bloom-hit fraction, not by
    default.

    Two layers, both bucketed (never all-pairs):

    1. exact — content-fingerprint anti-join (one shuffle on the hash);
    2. near — MinHash band buckets of both corpora joined on bucket,
       candidates verified by true shingle Jaccard.  The ref side of the
       verification is first semi-joined down to candidate ids, so the
       ref corpus is never re-shingled in full.

    At production scale the ref fingerprint and bucket tables are
    persisted once per corpus version and only ``new`` is signed per
    batch (:func:`minhash_buckets` is the persistable index).
    """
    from .text import fingerprint

    new = new.filter(F.col(text_col).isNotNull()).persist()
    ref_nn = ref.filter(F.col(text_col).isNotNull())

    # exact layer — the ref fingerprint set comes from the persisted
    # index when one is supplied (ref scanned zero times here)
    if ref_index is not None:
        ref_fp = ref_index[0].select("_fp")
    else:
        ref_fp = ref_nn.select(
            fingerprint(F.col(text_col)).alias("_fp")
        ).distinct()
    new_fp = new.withColumn("_fp", fingerprint(F.col(text_col)))
    if bloom_bits:
        from .sketches import bloom_might_contain, bloom_sketch

        bloom = bloom_sketch(ref_fp, "_fp", bloom_bits, bloom_hashes)
        new_fp = (
            bloom_might_contain(new_fp, "_fp", bloom, bloom_bits, bloom_hashes)
            .filter(F.col("_bloom_maybe"))
            .drop("_bloom_maybe")
        )
    exact_losers = new_fp.join(ref_fp, "_fp", "left_semi").select(
        F.col(id_col).alias("_loser")
    )

    # near layer: cross-corpus bucket join (ref side from the index
    # when supplied — the corpus is only touched to shingle the
    # candidate ids the bucket join surfaces)
    nb = minhash_buckets(new, id_col, text_col, num_hashes, bands, shingle_n, use_arrow)
    if ref_index is not None:
        stamped = getattr(ref_index[1], "_dlt_index_params", None)
        if stamped is not None and stamped != (num_hashes, bands, shingle_n):
            raise ValueError(
                f"ref_index was built with (num_hashes, bands, shingle_n)="
                f"{stamped}, but dedup_against was called with "
                f"{(num_hashes, bands, shingle_n)} — bucket joins would be"
                " silently wrong; rebuild the index or pass matching params"
            )
        rb = ref_index[1].select("_id", "_bucket")
    else:
        rb = minhash_buckets(
            ref_nn, id_col, text_col, num_hashes, bands, shingle_n, use_arrow
        )
    cand = (
        nb.withColumnRenamed("_id", "new_id")
        .join(rb.withColumnRenamed("_id", "ref_id"), "_bucket")
        .select("new_id", "ref_id")
        .distinct()
    )
    sh_expr = (
        _shingles_arrow(shingle_n)(F.col(text_col))
        if use_arrow
        else shingles(F.col(text_col), shingle_n)
    )
    ref_cand = ref_nn.join(
        cand.select(F.col("ref_id").alias(id_col)).distinct(), id_col, "left_semi"
    )
    new_sh = new.select(F.col(id_col).alias("new_id"), sh_expr.alias("_sha"))
    ref_sh = ref_cand.select(F.col(id_col).alias("ref_id"), sh_expr.alias("_shb"))
    near_losers = (
        cand.join(new_sh, "new_id")
        .join(ref_sh, "ref_id")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("_sha", "_shb"))
            / F.size(F.array_union("_sha", "_shb")),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select(F.col("new_id").alias("_loser"))
        .distinct()
    )

    losers = exact_losers.union(near_losers).distinct().withColumnRenamed("_loser", id_col)
    out = new.join(losers, id_col, "left_anti")
    out._dlt_persisted = [new]  # unpersist after materializing the survivors
    return out


# ------------------------------------------------------------- simhash


def simhash64(text: Column, shingle_n: int = 2) -> Column:
    """64-bit SimHash over shingle hashes: sign-sum each bit position.
    Pure Column expression (for per-row use inside wider selects); each
    shingle is sha256-hashed ONCE and all 60 bit votes accumulate in a
    single array-accumulator pass — the earlier 60-aggregate formulation
    recomputed the (expensive, interpreted) hash per bit and was ~60x
    slower.  For whole-table signatures prefer :func:`simhash_table`,
    whose explode+groupBy shape stays in whole-stage codegen."""
    sh = shingles(text, shingle_n)
    hashes = F.transform(sh, lambda s: portable_hash64(s, seed=7))
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), 60),
        lambda acc, h: F.array(*[
            F.element_at(acc, i + 1)
            + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            for i in range(60)
        ]),
    )
    # fold winning bits; distinct powers of two, so sum == bitwise OR
    # (2^i via pow() is exact: powers of two are exact doubles)
    bitvals = F.zip_with(
        votes,
        F.sequence(F.lit(0), F.lit(59)),
        lambda v, i: F.when(v > 0, F.pow(F.lit(2.0), i).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        ),
    )
    return F.aggregate(bitvals, F.lit(0).cast("bigint"), lambda acc, b: acc + b)


def simhash_table(
    df: DataFrame, id_col: str, text_col: str = "text", shingle_n: int = 2
) -> DataFrame:
    """Per-row 64-bit SimHash as ``(_id, _sim)`` via explode + grouped
    bit-vote sums.  Unlike the Column recipe, every expression here is
    whole-stage-codegen-able (no higher-order functions in the hot path
    after the explode): one sha256 per shingle, 60 conditional sums in
    one hash aggregate, one shuffle on the id.  This is the scale path —
    the same shape the DuckDB oracle uses."""
    hashes = F.transform(shingles(F.col(text_col), shingle_n), lambda s: portable_hash64(s, seed=7))
    hs = df.select(F.col(id_col).alias("_id"), F.explode(hashes).alias("_h"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("_h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"_v{i}")
        for i in range(60)
    ]
    agg = hs.groupBy("_id").agg(*votes)
    sim = None
    for i in range(60):
        bit = F.when(F.col(f"_v{i}") > 0, F.lit(1 << i).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        sim = bit if sim is None else sim + bit
    return agg.select("_id", sim.alias("_sim"))


def simhash_candidates(
    df: DataFrame, id_col: str, text_col: str = "text", max_hamming: int = 3, blocks: int = 4
) -> DataFrame:
    """Candidate near-dups: equal SimHash block in >=1 of ``blocks``
    15-bit blocks (pigeonhole: hamming<=blocks-1 guarantees a match)."""
    sim = simhash_table(df, id_col, text_col)
    width = 60 // blocks
    buckets = sim.select(
        "_id",
        "_sim",
        F.explode(
            F.array(*[
                F.concat_ws("#", F.lit(str(b)),
                            F.shiftright(F.col("_sim"), b * width).bitwiseAND(F.lit((1 << width) - 1)).cast("string"))
                for b in range(blocks)
            ])
        ).alias("_bucket"),
    )
    a = buckets.select(F.col("_id").alias("id_a"), F.col("_sim").alias("_sima"), "_bucket")
    b = buckets.select(F.col("_id").alias("id_b"), F.col("_sim").alias("_simb"), "_bucket")
    pairs = (
        a.join(b, "_bucket").filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("_sima").bitwiseXOR(F.col("_simb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )
    return pairs


# ------------------------------------------------ duplicate clustering


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Resolve near-dup pairs into clusters: iterative smallest-label
    propagation with path halving.  Each iteration takes the min over
    neighbor labels (propagates one hop) and then jumps every label to
    its label's label (halves pointer chains), so convergence is
    O(log(diameter)) iterations — neighbor-min alone is O(diameter),
    which a pathological near-dup chain (boilerplate ladders) can make
    large at corpus scale.  Dup-cluster diameters are tiny in practice;
    the halving join is insurance, not the common-case cost.  Returns
    (id, component) where component is the smallest id in the cluster."""
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    # the label table is one row per CANDIDATE-PAIR node — near-dup
    # members, usually a small fraction of the corpus.  Under the gate,
    # broadcast it into every propagation join so the edge table never
    # shuffles (same dial as graph.NODE_BROADCAST_LIMIT); past the gate
    # the joins shuffle, the right plan for duplicate-dense corpora.
    from .graph import NODE_BROADCAST_LIMIT

    n_nodes = labels.count()
    _b = (
        (lambda df: F.broadcast(df))
        if n_nodes <= NODE_BROADCAST_LIMIT
        else (lambda df: df)
    )
    for it in range(max_iterations):
        neighbor_min = (
            edges.join(_b(labels), edges["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        # carry the old label through the update so convergence can be
        # checked on the CHECKPOINTED result — checking before
        # materializing would execute the whole join lineage twice per
        # iteration (once for the check, again for the checkpoint)
        upd = labels.join(_b(neighbor_min), labels["id"] == neighbor_min["src"], "left").select(
            "id",
            F.col("component").alias("old_c"),
            F.least(
                F.col("component"), F.coalesce(F.col("nbr_component"), F.col("component"))
            ).alias("new_c"),
        )
        # path halving: jump each label to its label's label (labels are
        # node ids, so the lookup table is the update itself).  Skipped
        # on the first pass: typical dup clusters have diameter ≤ 2 and
        # converge before halving helps — it pays only on long chains,
        # where it turns O(diameter) into O(log diameter).
        if it > 0:
            jump = upd.select(F.col("id").alias("jid"), F.col("new_c").alias("jcomp"))
            upd = upd.join(_b(jump), upd["new_c"] == jump["jid"], "left").select(
                "id",
                "old_c",
                F.least(F.col("new_c"), F.coalesce(F.col("jcomp"), F.col("new_c"))).alias(
                    "new_c"
                ),
            )
        # ONE action per iteration (r10): the lazy checkpoint is
        # materialized by the convergence aggregate itself (a full-scan
        # max computes every partition, which caches the checkpointed
        # RDD) — the old eager-checkpoint-then-count shape paid two
        # driver round-trips per iteration, and at dup-cluster sizes the
        # loop is pure job latency (probe: 53 stages, 0.56s executor
        # time, 3.7s wall)
        upd = upd.localCheckpoint(eager=False)
        changed = upd.agg(
            F.max((F.col("new_c") < F.col("old_c")).cast("int"))
        ).collect()[0][0]
        labels = upd.select("id", F.col("new_c").alias("component"))
        if not changed:
            break
    return labels


# --------------------------------------------------- embedding near-dup


def vec_dot(a: Column, b: Column) -> Column:
    """Dot product of two array<float/double> columns, double math.
    SQL: ``list_dot_product(a, b)`` (DuckDB)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def vec_norm(a: Column) -> Column:
    """L2 norm.  SQL: ``sqrt(list_dot_product(a, a))``."""
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity between two array<float/double> columns, double
    math.  SQL: ``list_dot_product(a,b)/sqrt(...)*...`` (DuckDB) —
    built from zip_with + aggregate, JVM-side.

    For PAIRWISE workloads (self-joins) prefer precomputing ``vec_norm``
    per row and dividing ``vec_dot`` by the norm product — bit-identical
    result, one higher-order aggregation per pair instead of three."""
    return vec_dot(a, b) / (vec_norm(a) * vec_norm(b))


def embedding_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    dim: Optional[int] = None,
    threshold: float = 0.95,
    num_planes: int = 12,
    seed: int = 42,
    max_bucket_size: Optional[int] = 2000,
) -> DataFrame:
    """Embedding near-dup removal at scale: hyperplane-LSH bucketing
    (same-signature candidates only — no all-pairs), exact cosine
    verification inside buckets, then greedy keep-min-id via connected
    components.  Returns the rows to KEEP.

    ``max_bucket_size`` is the hot-bucket skew guard (same role as
    ``max_shingle_freq`` on the shingle path): a degenerate bucket —
    near-constant embeddings, zero vectors — would otherwise produce k²
    candidate pairs in the self-join.  Oversized buckets are skipped
    (their members simply aren't deduped); pass ``None`` for exact
    small-corpus audits."""
    from .similarity import lsh_index

    if dim is None:
        first = df.select(vec_col).first()
        dim = len(first[0])
    indexed = lsh_index(df, dim, id_col=id_col, vec_col=vec_col, num_planes=num_planes, seed=seed)
    if max_bucket_size:
        bucket_ok = (
            indexed.groupBy("_lsh_bucket")
            .agg(F.count(F.lit(1)).alias("_bsz"))
            .filter(F.col("_bsz") <= max_bucket_size)
            .select("_lsh_bucket")
        )
        indexed = indexed.join(bucket_ok, "_lsh_bucket", "left_semi")
    a = indexed.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"), "_lsh_bucket"
    )
    b = indexed.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"), "_lsh_bucket"
    )
    pairs = (
        a.join(b, "_lsh_bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine_sim(F.col("_va"), F.col("_vb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b")
        .distinct()
    )
    comps = connected_components(pairs)
    losers = comps.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def embedding_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    threshold: float = 0.95,
    decimals: int = 6,
    max_rows: Optional[int] = 100_000,
) -> DataFrame:
    """Exact cosine near-dup pairs (brute force — bounded sets / the
    verification stage after LSH bucketing at scale).

    HARD GUARD: this is O(n²).  If the input exceeds ``max_rows`` the call
    raises and points at :func:`embedding_dedup` (LSH-bucketed), so a
    corpus can't be pointed at the quadratic path by accident.  ``None``
    disables the count check (callers that already bounded the input)."""
    if max_rows is not None:
        n_rows = df.count()
        if n_rows > max_rows:
            raise ValueError(
                f"embedding_dup_pairs is brute-force O(n²) and got {n_rows}"
                f" rows (> max_rows={max_rows}); use embedding_dedup()"
                " (LSH-bucketed) for corpora, or pass max_rows=None if the"
                " input is intentionally this large"
            )
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cosine_sim(F.col("_va"), F.col("_vb")), decimals))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def pick_canonical(
    components: DataFrame,
    quality: DataFrame,
    id_col: str = "id",
    comp_col: str = "component",
    quality_col: str = "quality",
) -> DataFrame:
    """Canonical-document selection after duplicate clustering: for each
    connected component (:func:`connected_components` output) keep the
    highest-``quality_col`` member, ties to the smallest id.

    Returns ``(component, canonical_id, n_members, quality)``.  One
    equi-join (id), one grouped max, and a tie-filtered grouped min —
    all map-side-combinable aggregates, no per-component sort, and the
    id tie-break is type-agnostic (string doc ids / URLs work; a unary
    minus would null out or ANSI-fail on non-numeric ids).  This is the
    "which copy do we train on" step that follows near-dedup: dedup
    finds the groups, this picks the survivor by signal (length,
    quality score, recency) instead of by accident of id order."""
    j = components.join(quality, id_col)
    stats = j.groupBy(comp_col).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.max(quality_col).alias("_qmax"),
    )
    return (
        j.join(stats, comp_col)
        .filter(F.col(quality_col) == F.col("_qmax"))
        .groupBy(comp_col)
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.max("n_members").alias("n_members"),
            F.max("_qmax").alias(quality_col),
        )
        .select(comp_col, "canonical_id", "n_members", quality_col)
    )


# ------------------------------------------------- fuzzy record linkage


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    block_cols: Optional[Sequence[str]] = None,
    prefix_len: int = 24,
    verify_len: int = 80,
    max_edit: int = 8,
    max_block_size: Optional[int] = 1000,
) -> DataFrame:
    """Blocked edit-distance record linkage: near-identical rows found by
    a cheap blocking key, verified by bounded Levenshtein distance.

    The classic two-phase shape (Fellegi-Sunter blocking, dedupe-style):
    candidates must agree on ``block_cols`` plus the first
    ``prefix_len`` characters (recall knob), then each candidate pair is
    verified with ``levenshtein(prefix_a, prefix_b, max_edit)`` — the
    THRESHOLDED variant, which abandons a pair the moment its edit
    distance exceeds ``max_edit`` (O(max_edit * len) per pair, not
    O(len^2)).  Complements the set-similarity family (MinHash/Jaccard
    is word-set overlap; edit distance catches character-level variants
    — OCR noise, typo twins, near-identical boilerplate).

    Scale design: the self-join shuffles on the block key only; block
    sizes are bounded by ``max_block_size`` (a degenerate block — empty
    prefix, template pages — would otherwise contribute k^2 pairs; same
    guard role as ``max_shingle_freq``).  Verification cost is bounded
    per pair by the threshold.  Returns ``(id_a, id_b, edit_distance)``
    with ``id_a < id_b``.
    """
    cols = list(block_cols or [])
    block = F.sha2(
        F.concat_ws(
            "\x1f",
            *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cols],
            F.substring(F.col(text_col), 1, prefix_len),
        ),
        256,
    )
    base = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("_id"),
        block.alias("_block"),
        F.substring(F.col(text_col), 1, verify_len).alias("_vtext"),
    )
    if max_block_size:
        ok = (
            base.groupBy("_block")
            .agg(F.count(F.lit(1)).alias("_bsz"))
            .filter(F.col("_bsz") <= max_block_size)
            .select("_block")
        )
        base = base.join(ok, "_block", "left_semi")
    a = base.select(
        F.col("_block"), F.col("_id").alias("id_a"), F.col("_vtext").alias("_ta")
    )
    b = base.select(
        F.col("_block"), F.col("_id").alias("id_b"), F.col("_vtext").alias("_tb")
    )
    # equality fast path: in duplicate-dense corpora most candidate
    # pairs have IDENTICAL verify prefixes — a memcmp instead of the
    # O(max_edit * len) banded DP (measured 1683s -> ~privileged path
    # at the 100x duplicate-stress tier, where ~all 25M pairs are
    # byte-equal).  No final distinct: each id lands in exactly ONE
    # block (the block key is a function of the row), so every
    # (id_a, id_b) pair is produced exactly once already — a distinct
    # here would re-shuffle the entire result for nothing.
    dist = F.when(F.col("_ta") == F.col("_tb"), F.lit(0)).otherwise(
        F.levenshtein(F.col("_ta"), F.col("_tb"), max_edit)
    )
    return (
        a.join(b, "_block")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("edit_distance", dist)
        .filter(F.col("edit_distance") >= 0)
        .select("id_a", "id_b", "edit_distance")
    )


def lsh_params(
    threshold: float,
    num_perm: int,
    fp_weight: float = 0.5,
) -> "tuple[int, int]":
    """Choose MinHash-LSH banding ``(bands, rows)`` for a target Jaccard
    ``threshold`` — the standard s-curve optimization (Leskovec/Rajaraman
    /Ullman ch.3, the datasketch-style parameter search): the candidate
    probability of a pair at similarity s is ``1 - (1 - s^rows)^bands``;
    pick the factorization of ``num_perm`` minimizing the weighted sum
    of false-positive area below the threshold and false-negative area
    above it (``fp_weight`` : ``1 - fp_weight``).

    Driver-side pure math (integrates the s-curve on a fixed grid) —
    call it once to size :func:`minhash_dedup`'s banding before a run
    instead of hand-picking bands."""
    if not 0.0 < threshold < 1.0:
        raise ValueError("threshold must be in (0, 1)")
    if num_perm < 2:
        raise ValueError("num_perm must be >= 2")
    fn_weight = 1.0 - fp_weight
    steps = 200
    best, best_err = (1, num_perm), float("inf")
    for bands in range(1, num_perm + 1):
        if num_perm % bands:
            continue
        rows = num_perm // bands
        fp = fn = 0.0
        # integrate P(candidate | s) on each side of the threshold
        for i in range(steps):
            s = threshold * (i + 0.5) / steps
            fp += (1.0 - (1.0 - s ** rows) ** bands) * (threshold / steps)
        for i in range(steps):
            s = threshold + (1.0 - threshold) * (i + 0.5) / steps
            fn += (1.0 - (1.0 - (1.0 - s ** rows) ** bands)) * (
                (1.0 - threshold) / steps
            )
        err = fp_weight * fp + fn_weight * fn
        if err < best_err:
            best, best_err = (bands, rows), err
    return best
