"""Deterministic, key-based sampling and dataset splitting.

``df.sample()`` is seeded per-partition, so its output changes with
partitioning, task retries, and cluster size — unacceptable for training
pipelines where "the 1% sample" and "the validation split" must be the
same rows on every run, every cluster, and in every downstream engine.
These operators derive a uniform [0,1) value from a sha256 of the key
column, giving:

- reproducibility: the sample/split of a row depends only on its key;
- stability under growth: new rows join a split without reshuffling old
  ones (the property behind hash-bucketed A/B assignment);
- cross-engine verifiability: the exact recipe is one SQL expression
  (see the DuckDB oracles in ``__spark_entry__``).

All pure Column expressions — codegen, zero shuffle, scan-speed.
The hash uses 13 hex chars (52 bits) so the int is exactly
representable in a double: both engines compute bit-identical
fractions, with no float-rounding drift at split boundaries.
"""

from __future__ import annotations

from typing import Dict, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BITS = 52  # 13 hex chars: exact in IEEE double
_SCALE = float(1 << _BITS)


def hash_fraction(key: Column, salt: str = "") -> Column:
    """Uniform [0,1) from the key: ``sha256(salt:key)`` first 52 bits /
    2^52.  ``salt`` decorrelates independent sampling decisions on the
    same key (sampling vs splitting vs A/B arms).
    SQL: ``CAST(('0x' || substr(sha256(salt || ':' || CAST(k AS
    VARCHAR)), 1, 13)) AS BIGINT) / 2^52``."""
    h = F.sha2(F.concat(F.lit(f"{salt}:"), key.cast("string")), 256)
    return F.conv(F.substring(h, 1, 13), 16, 10).cast("double") / F.lit(_SCALE)


def deterministic_sample(
    df: DataFrame, key: str, rate: float, salt: str = "sample"
) -> DataFrame:
    """Keep ~``rate`` of rows, chosen by key hash — same rows every run,
    every cluster, every engine."""
    return df.filter(hash_fraction(F.col(key), salt) < rate)


def stratified_sample(
    df: DataFrame,
    key: str,
    strata_col: str,
    rates: Dict[str, float],
    default_rate: float = 0.0,
    salt: str = "stratified",
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-balancing
    primitive (e.g. keep 100% of rare languages, 10% of English).
    ``rates`` maps stratum value → keep fraction; strata not listed get
    ``default_rate``.  Row-local Column expression: no shuffle, no
    per-group pass — scan speed at any number of strata."""
    frac = hash_fraction(F.col(key), salt)
    rate = None
    for value, r in rates.items():
        cond = F.col(strata_col) == value
        rate = F.when(cond, F.lit(r)) if rate is None else rate.when(cond, F.lit(r))
    rate = F.lit(default_rate) if rate is None else rate.otherwise(F.lit(default_rate))
    return df.filter(frac < rate)


def cap_per_group(
    df: DataFrame,
    key: str,
    group_col: str,
    cap: int,
    salt: str = "cap",
) -> DataFrame:
    """Per-domain/source cap: keep at most ``cap`` rows per group,
    selected deterministically by key hash (so the kept set is stable
    under reruns and only changes minimally as the group grows — the
    web-crawl "max N pages per domain" primitive).

    One shuffle on the group column; the rank-filter pattern compiles to
    WindowGroupLimit, so no group ever materializes more than ``cap``
    rows per partition at scale."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        hash_fraction(F.col(key), salt).asc(), F.col(key).asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= cap)
        .drop("_rk")
    )


def hash_split(
    df: DataFrame,
    key: str,
    weights: Dict[str, float],
    salt: str = "split",
    label_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split with probabilities ``weights``
    (e.g. ``{"train": .9, "val": .05, "test": .05}``).  Weights must sum
    to 1; assignment is the interval the key's hash fraction falls in,
    in the given insertion order."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    frac = hash_fraction(F.col(key), salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = frac < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(label_col, expr)


def percentile_tiers(
    df: DataFrame,
    col: str,
    tiles: int = 4,
    tier_col: str = "tier",
) -> DataFrame:
    """Tier rows by value quantiles WITHOUT a global sort: compute the
    tile boundaries with one aggregation (interpolated percentiles),
    then assign tiers with a scan-speed CASE comparison.  ntile() over a
    global window would funnel every row through ONE partition — the
    classic non-scalable formulation; this is two scan-shaped jobs.
    Tier 1 holds the highest values.  Ties at a boundary go to the
    higher tier (value-based, not count-based, so tiles can be uneven
    under heavy ties — the price of scale-safety).

    At extreme scale swap the exact percentile for approx_percentile —
    same plan shape, sketch-merged boundaries."""
    if tiles < 1:
        raise ValueError(f"tiles must be >= 1, got {tiles}")
    if tiles == 1:
        return df.withColumn(tier_col, F.lit(1).cast("bigint"))
    probs = [i / tiles for i in range(1, tiles)]
    cuts = df.agg(
        F.percentile(F.col(col), F.array(*[F.lit(p) for p in probs])).alias("c")
    ).collect()[0]["c"]
    if cuts is None or any(c is None for c in cuts):
        # empty or all-null input: no boundaries exist; everything is
        # tier `tiles` (NULL values sort lowest, matching the CASE below)
        return df.withColumn(tier_col, F.lit(tiles).cast("bigint"))
    expr = None
    for i, cut in enumerate(reversed(cuts)):  # highest boundary first
        cond = F.col(col) >= F.lit(float(cut))
        branch = F.lit(i + 1)
        expr = F.when(cond, branch) if expr is None else expr.when(cond, branch)
    expr = expr.otherwise(F.lit(tiles)).cast("bigint")
    return df.withColumn(tier_col, expr)


def mix_corpus(
    df: DataFrame,
    key: str,
    strata_col: str,
    proportions: Dict[str, float],
    total_rows: int,
    salt: str = "mix",
) -> DataFrame:
    """Deterministic data mixing: sample so the output approximates
    ``total_rows`` rows with the given per-stratum proportions (the
    training-mixture step — e.g. 60% web / 30% code / 10% books).

    Per-stratum keep rates are ``min(1, total*p_s / n_s)`` from one
    counts aggregation (strata with too little data keep everything —
    upsampling/repetition is a separate, explicit choice).  Rows are
    then kept by the usual key-hash fraction: reproducible, growth-
    stable, one aggregation + one scan, no shuffle of the data itself.
    Strata not named in ``proportions`` are dropped.
    """
    counts = {
        r[strata_col]: r["n"]
        for r in df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n")).collect()
        if r[strata_col] in proportions
    }
    rates = {
        s: min(1.0, total_rows * p / counts[s]) if counts.get(s) else 0.0
        for s, p in proportions.items()
    }
    return stratified_sample(df, key, strata_col, rates, default_rate=0.0, salt=salt)


def temperature_proportions(
    counts: Dict[str, int], temperature: float
) -> Dict[str, float]:
    """Mixture proportions ∝ n_s^(1/T) (the multilingual-training
    upsampling rule, e.g. T5/XLM-R): T=1 keeps natural proportions,
    T→∞ approaches uniform — boosting small strata (rare languages,
    niche domains) without hand-tuned weights."""
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    weights = {s: float(n) ** (1.0 / temperature) for s, n in counts.items()}
    z = sum(weights.values()) or 1.0
    return {s: w / z for s, w in weights.items()}


def mix_corpus_temperature(
    df: DataFrame,
    key: str,
    strata_col: str,
    temperature: float,
    total_rows: int,
    salt: str = "mix",
) -> DataFrame:
    """Temperature-controlled corpus mixing: derive the per-stratum
    proportions from the data itself via :func:`temperature_proportions`
    and sample to them — one counts aggregation plus the usual
    hash-fraction scan (no shuffle of the data)."""
    counts = {
        r[strata_col]: r["n"]
        for r in df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    props = temperature_proportions(counts, temperature)
    rates = {
        s: min(1.0, total_rows * p / counts[s]) if counts.get(s) else 0.0
        for s, p in props.items()
    }
    return stratified_sample(df, key, strata_col, rates, default_rate=0.0, salt=salt)


def sample_exact_k(
    df: DataFrame, key: str, k: int, salt: str = "samplek"
) -> DataFrame:
    """Exactly ``k`` rows, chosen deterministically: the k smallest key
    hashes.  Rate-based sampling gives a binomial-sized output; this
    gives a fixed size — and executes as TakeOrdered (per-partition
    heaps of k), never a global sort.  Replacing a rate with a size
    changes stability: adding rows can displace up to the new rows'
    share of the old selection (bounded turnover, like consistent
    hashing)."""
    return (
        df.withColumn("_hf", hash_fraction(F.col(key), salt))
        .orderBy(F.col("_hf").asc(), F.col(key).asc())
        .limit(k)
        .drop("_hf")
    )


def weighted_sample_k(
    df: DataFrame,
    key: str,
    weight_col: str,
    k: int,
    salt: str = "wsample",
) -> DataFrame:
    """Exactly ``k`` rows drawn WITHOUT replacement with probability
    proportional to ``weight_col`` — deterministic A-ES weighted
    reservoir sampling (Efraimidis & Spirakis 2006): each row scores
    ``u^(1/w)`` with ``u`` the key's hash fraction, and the k highest
    scores win.  Same engine shape as :func:`sample_exact_k`:
    TakeOrdered per-partition heaps of k, no global sort, and the
    selection is a pure function of (key, weight, salt) — stable across
    layouts, reruns, and engines.

    Rows with null/non-positive weight are excluded (zero weight means
    zero probability; A-ES is undefined there).  Scores are kept as
    ``ln(u)/w`` (monotone in u^(1/w), numerically safer than pow for
    tiny u / large w) and rounded to 12 decimals with the key as tie
    break, so rank order is bit-stable.
    """
    u = hash_fraction(F.col(key), salt)
    score = F.round(F.log(u) / F.col(weight_col).cast("double"), 12)
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("_ws", score)
        .orderBy(F.col("_ws").desc(), F.col(key).asc())
        .limit(k)
        .drop("_ws")
    )


def percentile_normalize(
    df: DataFrame, group_col: str, score_col: str, out_col: str = "pct"
) -> DataFrame:
    """Within-group percentile normalization of a score column:
    ``pct = percent_rank()`` over ``score_col`` inside each group,
    rounded to 9 decimals.  The curation use case: raw quality scores
    are not comparable ACROSS sources (different length/style
    distributions); normalizing to within-source percentiles first
    makes one global keep-threshold fair to every source (the
    per-domain analog of quality_tiers' corpus-wide tiers).

    Scale shape: one shuffle on the group key, per-group sort inside
    the window — no global sort; ties share a rank (standard
    percent_rank), so the output is engine-exact."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(F.col(score_col).asc())
    return df.withColumn(out_col, F.round(F.percent_rank().over(w), 9))


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    components: DataFrame,
    weights: Dict[str, float],
    salt: str = "split",
    label_col: str = "split",
) -> DataFrame:
    """Train/val/test split that never separates near-duplicates: rows
    are split by their duplicate-CLUSTER id (``components`` =
    ``(id, component)`` from
    :func:`dlt_spark.dataops.dedup.connected_components`), so every
    member of a near-dup cluster lands in the SAME split — the leakage
    guard a per-document :func:`hash_split` cannot give (a train doc's
    near-copy in the eval split inflates every metric it touches).

    Rows absent from ``components`` (no duplicates found) split by
    their own id.  One broadcast-ready left join + the same
    sha-fraction assignment as :func:`hash_split` — deterministic under
    any partitioning, retry, or engine."""
    rep = components.select(
        F.col("id").alias(id_col), F.col("component").alias("_split_key")
    )
    joined = df.join(rep, id_col, "left").withColumn(
        "_split_key", F.coalesce(F.col("_split_key"), F.col(id_col))
    )
    return hash_split(joined, "_split_key", weights, salt, label_col).drop(
        "_split_key"
    )
