"""Corpus sampling / mixing operators — the curation steps between
"filtered corpus" and "training mix".

All sampling here is DETERMINISTIC (content-hash Bernoulli), not
``df.sample``:

- reproducible: the same (salt, id) always lands on the same side, so
  a re-run, a backfill, and the DuckDB oracle agree row-for-row;
- stable under repartitioning: membership depends only on the row,
  never on partition layout or a seed stream — the property that
  makes the sample re-computable at 100 TB without materializing it;
- disjoint splits for free: different salts give independent draws
  (train/holdout = two salts).

The hash is the engine-wide portable 48-bit md5 prefix
(``datapipe.text.hash48``); a fraction f keeps rows with
``hash48(salt || id) < floor(f · 2^48)`` — integer threshold, no float
comparison drift between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .._exact import DEC
from .text import TOKEN_RE, doc_stats, hash48

HASH_SPACE = 1 << 48


def _keep(id_col: str, fraction_col, salt: str):
    thr = F.floor(fraction_col * F.lit(float(HASH_SPACE))).cast("long")
    h = hash48(F.concat(F.lit(salt), F.lit("|"), F.col(id_col).cast("string")))
    return h < thr


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "split0",
) -> DataFrame:
    """Per-stratum deterministic Bernoulli sample.

    ``fractions`` maps stratum value → keep fraction; strata not listed
    fall back to ``default_fraction``.  The per-stratum fraction rides a
    broadcast literal map — one scan, no shuffle, no state.
    """
    pairs: list = []
    for k, v in sorted(fractions.items()):
        pairs += [F.lit(k), F.lit(float(v))]
    frac = (
        F.coalesce(
            F.create_map(*pairs)[F.col(strata_col)],
            F.lit(float(default_fraction)),
        )
        if pairs
        else F.lit(float(default_fraction))
    )
    return df.filter(_keep(id_col, frac, salt))


def quality_deciles(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Decile-bin the corpus by quality score (curriculum / ablation
    building block: "train on the top-3 deciles").

    ``ntile`` needs a total order to be deterministic — ties broken by
    id.  At 100 TB a single global sort is the wrong plan; swap the
    exact ntile for ``approx_percentile`` bin edges + a broadcast
    range lookup (same output contract, no global sort); the exact
    version ships because it is oracle-checkable.
    """
    stats = doc_stats(df, text_col).select(
        id_col, F.round("quality_score", 6).alias("quality_score")
    )
    # order on the ROUNDED score: cross-engine double drift below 1e-6
    # must not be able to flip the ordering (and thus the bin)
    w = Window.orderBy("quality_score", id_col)
    return stats.withColumn("decile", F.ntile(10).over(w))


def source_mix(
    df: DataFrame,
    budget_tokens: int,
    weights: dict[str, float],
    strata_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Training-mix plan: given a total token budget and per-source mix
    weights, compute each source's available tokens, its target, and
    the deterministic sampling fraction that hits the target
    (capped at 1 — a source cannot contribute more than it has).

    One aggregate over the corpus + a broadcast literal weight map;
    the output (a handful of rows) feeds straight into
    :func:`stratified_sample` to materialize the mix.
    """
    pairs: list = []
    for k, v in sorted(weights.items()):
        pairs += [F.lit(k), F.lit(float(v))]
    wcol = F.coalesce(F.create_map(*pairs)[F.col(strata_col)], F.lit(0.0))
    toks = F.size(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
    )
    agg = (
        df.select(F.col(strata_col), toks.alias("__t"))
        .groupBy(strata_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("__t").cast(DEC)).cast("long").alias("avail_tokens"),
        )
    )
    target = F.floor(wcol * F.lit(float(budget_tokens))).cast("long")
    return agg.select(
        strata_col,
        "n_docs",
        "avail_tokens",
        F.round(wcol, 6).alias("weight"),
        target.alias("target_tokens"),
        F.round(
            F.least(
                F.lit(1.0),
                target / (F.col("avail_tokens") + F.lit(1e-9)),
            ),
            6,
        ).alias("sample_fraction"),
    )


def training_order(
    df: DataFrame,
    n_epochs: int = 2,
    n_shards: int = 8,
    id_col: str = "doc_id",
    salt: str = "ord",
) -> DataFrame:
    """Deterministic global training-order shuffle: assign every doc,
    for every epoch, a shard and an in-shard position from the portable
    content hash — the "shuffled dataset" a training job reads, WITHOUT
    ever materializing a random permutation.

    - reshuffled per epoch (the hash mixes the epoch number), the
      property data loaders want so epoch boundaries don't repeat
      ordering;
    - reproducible and repartition-stable: position depends only on
      (salt, epoch, doc_id), so a backfilled shard is byte-identical;
    - shard-parallel: the only ordered step is a per-(epoch, shard)
      rank — shards are the write/read unit, so parallelism is
      n_shards × n_epochs and no global sort exists. Scale n_shards
      with the cluster (one shard ≈ one output file).

    Output: (doc_id, epoch, shard, pos) with pos = 1-based rank of the
    doc's hash inside its (epoch, shard).
    """
    h = hash48(
        F.concat(
            F.lit(salt),
            F.lit("|"),
            F.col("epoch").cast("string"),
            F.lit("|"),
            F.col(id_col).cast("string"),
        )
    )
    d = (
        df.select(id_col)
        .withColumn(
            "epoch", F.explode(F.sequence(F.lit(0), F.lit(int(n_epochs) - 1)))
        )
        .withColumn("__h", h)
        .withColumn("shard", F.pmod(F.col("__h"), F.lit(int(n_shards))).cast("int"))
    )
    w = Window.partitionBy("epoch", "shard").orderBy("__h", id_col)
    return d.select(
        id_col, "epoch", "shard", F.row_number().over(w).alias("pos")
    )


def mixture_schedule(
    df: DataFrame,
    alpha: float = 0.5,
    budget_factor: float = 2.0,
    max_epochs: float = 4.0,
    strata_col: str = "source",
    size_col: str = "n_chars",
) -> DataFrame:
    """Temperature-based mixture/epoch schedule per source — the
    "how many epochs of each source at this token budget" planner
    (the public UnifiedQA/Pile/PaLM α-smoothed sampling recipe:
    p_s ∝ size_s^α with α < 1 upweights small high-quality sources).

    With α = 0.5 the weight is an exact ``sqrt`` (IEEE-correctly
    rounded on both engines — no transcendental drift, so the whole
    plan is hash-gated).  Epochs are capped at ``max_epochs``; the
    effective mix share re-normalizes over the capped effective sizes.

    Shapes: one grouped aggregate over the corpus (map-side combined),
    then all remaining algebra on the per-source frame (tiny).  The
    cross-engine sum of the irrational weights is made order-independent
    by rounding each weight to 6 decimals BEFORE the decimal-exact sum.
    """
    per = df.groupBy(strata_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col(size_col).cast(DEC)).cast("long").alias("size"),
    )
    per = per.withColumn(
        "weight_raw", F.round(F.sqrt(F.col("size").cast("double")), 6)
    )
    tot = per.agg(
        F.sum(F.col("weight_raw").cast(DEC)).cast("double").alias("__wsum"),
        F.sum(F.col("size").cast(DEC)).cast("long").alias("__tsize"),
    )
    out = per.crossJoin(F.broadcast(tot))
    p = F.col("weight_raw") / F.col("__wsum")
    budget = F.lit(float(budget_factor)) * F.col("__tsize").cast("double")
    epochs = F.least(
        F.lit(float(max_epochs)), budget * p / F.col("size").cast("double")
    )
    out = out.withColumn("p_alpha", p).withColumn("epochs", epochs).withColumn(
        "effective_size", F.round(epochs * F.col("size").cast("double"), 6)
    )
    eff_tot = out.agg(
        F.sum(F.col("effective_size").cast(DEC)).cast("double").alias("__esum")
    )
    return (
        out.crossJoin(F.broadcast(eff_tot))
        .select(
            strata_col,
            "n_docs",
            "size",
            F.round("p_alpha", 6).alias("p_alpha"),
            F.round("epochs", 6).alias("epochs"),
            "effective_size",
            F.round(F.col("effective_size") / F.col("__esum"), 6).alias(
                "mix_share"
            ),
        )
    )


def importance_weights(
    df: DataFrame,
    target_frac: float = 0.1,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "target",
) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023: Data Selection for
    LMs via Importance Resampling): score each raw doc by how much its
    hashed-unigram profile looks like the TARGET distribution vs the
    RAW distribution, so a quality-targeted subset can be drawn from a
    web-scale corpus with one scan + two broadcast-sized count tables.

    DSIR's weight is ``exp(sum_g c_g (log p_t(g) - log p_r(g)))``;
    logs are transcendental and would drift the hash cross-engine
    (house rule), so the engine scores the monotone-equivalent-in-
    spirit LIKELIHOOD RATIO OF EXPECTATIONS in pure rational form:

        score(d) = [ sum_g c_d(g) * t(g) / T ]  /  [ sum_g c_d(g) * r(g) / R ]
                 = (sum_g c_d(g) t(g)) * R  /  ( (sum_g c_d(g) r(g)) * T )

    where t(g)/r(g) are bucket counts over the target/raw splits and
    T/R their token totals — every numerator is an INTEGER sum, the
    single final division is IEEE-identical, so the gate hashes it
    bit-exactly.  ``selected = score > 1`` (more target-like than
    raw-like).

    The target split is hash-carved from the corpus (``target_frac``,
    same recipe as ``decontaminate``) so the operator is self-contained
    and oracle-checkable; production points the target side at the
    curated seed corpus.  Plan: tokenize once, explode to (doc,
    bucket, c) counts, aggregate the two n_buckets-row profile tables,
    broadcast them back onto the doc-bucket frame — the corpus is
    scanned once and never self-joined.

    Output: one row per NON-target doc — ``(doc_id, n_tokens, t_num,
    r_num, score, selected)``.
    """
    from .text import tokenize

    is_target = (
        hash48(F.concat(F.lit(salt), F.lit("|"), F.col(id_col).cast("string")))
        < F.lit(int(target_frac * (1 << 48)))
    )
    toks = tokenize(df, text_col).select(
        id_col,
        is_target.alias("__t"),
        F.explode("tokens").alias("__tok"),
    )
    db = toks.select(
        id_col,
        "__t",
        (hash48(F.col("__tok")) % F.lit(int(n_buckets))).alias("__b"),
    )
    # per-doc bucket counts (the c_d(g) vector, exploded)
    dc = db.groupBy(id_col, "__t", "__b").agg(F.count("*").alias("__c"))
    # corpus-side profiles: n_buckets rows each — broadcast
    prof = (
        db.groupBy("__b")
        .agg(
            F.sum(F.when(F.col("__t"), 1).otherwise(0)).alias("__tg"),
            F.sum(F.when(F.col("__t"), 0).otherwise(1)).alias("__rg"),
        )
    )
    totals = prof.agg(
        F.sum("__tg").alias("__T"), F.sum("__rg").alias("__R")
    )
    scored = (
        dc.filter(~F.col("__t"))
        .join(F.broadcast(prof), "__b")
        .groupBy(id_col)
        .agg(
            F.sum("__c").alias("n_tokens"),
            F.sum(F.col("__c") * F.col("__tg")).alias("t_num"),
            F.sum(F.col("__c") * F.col("__rg")).alias("r_num"),
        )
        .crossJoin(F.broadcast(totals))
    )
    # products in DOUBLE (bigint*bigint could overflow at corpus scale;
    # double products of exact integers are IEEE-identical cross-engine)
    score = (
        F.col("t_num").cast("double") * F.col("__R").cast("double")
    ) / F.nullif(
        F.col("r_num").cast("double") * F.col("__T").cast("double"),
        F.lit(0.0),
    )
    return scored.select(
        id_col,
        "n_tokens",
        "t_num",
        "r_num",
        score.alias("score"),
        F.when(score > F.lit(1.0), 1)
        .otherwise(0)
        .cast("int")
        .alias("selected"),
    )
