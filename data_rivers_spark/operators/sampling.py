"""Deterministic sampling / splitting for corpus curation.

A 100 TB training-data pipeline cannot use ``df.sample`` for anything that
must be reproducible across runs, engines, or partitioning changes:
``sample`` draws per-partition from a seeded RNG, so adding one file to the
input reshuffles every draw. These operators key every decision off a stable
content hash of a caller-chosen key column — the same row makes the same
decision everywhere, the sample is a pure per-row filter (no shuffle, pushes
below joins), and any engine with md5 can replicate it (the DuckDB oracles
do exactly that).

Hash choice: md5 rather than xxhash64 because the oracle side must reproduce
it; we compare the first 8 hex chars as a STRING against a hex threshold —
lexicographic order on fixed-width lowercase hex equals numeric order, so no
engine-specific hex→int conversion is needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_SPACE = 16**8  # first 8 md5 hex chars ≈ uniform on [0, 16^8)


def hash_bucket(key: Column, seed: int | str = 0) -> Column:
    """Stable uniform 8-hex-char bucket for a key: substr(md5(seed ':' key), 1, 8)."""
    return F.substring(
        F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string"))), 1, 8
    )


def fraction_threshold(fraction: float) -> str:
    """String threshold t such that P[hash_bucket < t] = fraction.

    fraction >= 1.0 returns the sentinel 'g' — lexicographically above every
    8-hex-char bucket, so the strict '<' keeps EVERY row. Capping at
    'ffffffff' would silently drop rows whose md5 prefix is exactly
    'ffffffff' (~2^-32 each) from a keep-everything stratum; unlike
    deterministic_sample, the per-stratum CASE in stratified_sample cannot
    special-case 1.0 outside the expression. Oracles mirror the same
    sentinel (any engine compares '0'..'f' < 'g' identically)."""
    f = min(max(fraction, 0.0), 1.0)
    if f >= 1.0:
        return "g"
    return format(min(int(f * _HEX_SPACE), _HEX_SPACE - 1), "08x")


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, seed: int | str = 0
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by content hash of ``key_col``.

    Pure per-row filter: no shuffle, no RNG state, stable under repartitioning
    and engine changes. fraction >= 1 keeps everything; <= 0 keeps nothing."""
    if fraction >= 1.0:
        return df
    if fraction <= 0.0:
        return df.filter(F.lit(False))
    return df.filter(hash_bucket(F.col(key_col), seed) < F.lit(fraction_threshold(fraction)))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    seed: int | str = 0,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-mixing primitive
    (downsample boilerplate-heavy sources, upweight scarce languages).

    ``fractions`` maps stratum value → keep fraction; strata not listed keep
    ``default_fraction``. Same hash contract as deterministic_sample, so a
    row's fate changes only if its stratum's fraction does."""
    thr: Column = F.lit(fraction_threshold(default_fraction))
    for value, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == F.lit(value), F.lit(fraction_threshold(frac))
        ).otherwise(thr)
    return df.filter(hash_bucket(F.col(key_col), seed) < thr)


def train_test_split(
    df: DataFrame,
    key_col: str,
    test_fraction: float = 0.1,
    seed: int | str = 0,
    out_col: str = "split",
) -> DataFrame:
    """Tag every row 'test' or 'train' by content hash — the leakage-safe
    split: a document keeps its assignment across reruns and re-partitioning,
    so no example ever migrates between train and eval sets."""
    is_test = hash_bucket(F.col(key_col), seed) < F.lit(fraction_threshold(test_fraction))
    return df.withColumn(out_col, F.when(is_test, F.lit("test")).otherwise(F.lit("train")))


def cluster_safe_split(
    df: DataFrame,
    text_col: str,
    id_col: str,
    test_fraction: float = 0.1,
    threshold: float = 0.8,
    seed: int | str = 0,
    out_col: str = "split",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    bucket_cap: int = 1000,
    cc_max_iterations: int = 20,
) -> DataFrame:
    """``train_test_split`` that also closes over NEAR-DUP clusters: every
    connected component of the verified near-dup graph lands entirely on one
    side, so a test document's paraphrase can't leak into train.

    The row-level split hashes each doc's own id; here the hash key is the
    component representative (minimum reachable id via MinHash-LSH verified
    pairs + exact connected components), with singletons keying on their own
    id — which makes this a strict refinement: a corpus with no near-dups
    splits identically to ``train_test_split(df, id_col, ...)``.

    Scale: the pair graph and component frame are near-dup-sized (orders of
    magnitude smaller than the corpus); the only corpus-sized operations are
    the LSH pipeline itself (banded, capped — see minhash_lsh_verified_pairs)
    and one id-keyed left join against the component frame. The assignment
    stays a deterministic md5 decision, so reruns, repartitioning, and
    incremental corpus growth never migrate an already-assigned cluster
    unless its component representative changes.

    Guarantees: connected_components runs strict — a near-dup chain whose
    diameter exceeds ``cc_max_iterations`` raises instead of silently
    returning labels that would let one chain straddle the split. The
    component frame joins under a collision-proof internal name, so a
    caller column named 'component' survives untouched."""
    from .dedup import connected_components, minhash_lsh_verified_pairs

    pairs = minhash_lsh_verified_pairs(
        df, text_col, id_col, threshold,
        num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
        bucket_cap=bucket_cap,
    )
    comps = connected_components(pairs, max_iterations=cc_max_iterations).select(
        F.col("id").alias(id_col), F.col("component").alias("__csplit_component")
    )
    tagged = df.join(comps, id_col, "left")
    rep = F.coalesce(F.col("__csplit_component"), F.col(id_col))
    is_test = hash_bucket(rep, seed) < F.lit(fraction_threshold(test_fraction))
    return tagged.withColumn(
        out_col, F.when(is_test, F.lit("test")).otherwise(F.lit("train"))
    ).drop("__csplit_component")


def hash_unit_int(key: Column, seed: int | str = 0) -> Column:
    """Stable uniform integer in [0, 16^8) for a key — the numeric twin of
    ``hash_bucket`` for decisions whose threshold varies per row (weighted
    sampling), where a string compare against a constant no longer works."""
    return F.conv(hash_bucket(key, seed), 16, 10).cast("bigint")


def weighted_sample(
    df: DataFrame, key_col: str, weight_col: str, rate: float, seed: int | str = 0
) -> DataFrame:
    """Deterministic weighted (Poisson) sampling: keep each row independently
    with probability ``1 - exp(-rate * weight)`` — the quality-weighted
    corpus-mixing primitive ("sample documents proportionally to their
    quality/length score"). For small rate*weight the inclusion probability
    is ≈ rate*weight (proportional-to-weight); it saturates smoothly toward 1
    for heavy rows instead of needing an explicit cap.

    Same contract as deterministic_sample: a pure per-row filter (no shuffle,
    pushes below joins), reproducible across runs / engines / partitioning.
    The per-row threshold is floored to an INTEGER in the hash space before
    comparing, so both engines compare exact integers and a 1-ulp difference
    in exp() can only matter when the true threshold sits within one ulp of
    an integer boundary (~1e-16/1 per distinct weight — negligible, and flagged
    nowhere near the driver's 500-row sample)."""
    u = hash_unit_int(F.col(key_col), seed)
    thr = F.floor(
        (F.lit(1.0) - F.exp(-F.lit(rate) * F.col(weight_col).cast("double")))
        * F.lit(float(_HEX_SPACE))
    ).cast("bigint")
    return df.filter(u < thr)


def weighted_topk_sample(
    df: DataFrame, key_col: str, weight_col: str, k: int, seed: int | str = 0
) -> DataFrame:
    """Fixed-size weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    A-ES): each row draws u ~ U(0,1) from its content hash and the k largest
    ``u^(1/w)`` win — equivalently the k largest ``ln(u)/w``, which is what
    both engines actually order by (monotone transform, no pow() parity risk).

    Scale: orderBy(...).limit(k) compiles to TakeOrderedAndProject — a
    per-partition top-k heap plus a k-row driver merge, NOT a global sort;
    the only data movement is k rows per partition. Deterministic tiebreak on
    the key column keeps the selection stable under ulp-equal ranks
    (possible only for equal hashes, i.e. never for distinct keys)."""
    u01 = (hash_unit_int(F.col(key_col), seed).cast("double") + F.lit(0.5)) / F.lit(
        float(_HEX_SPACE)
    )
    rank = F.log(u01) / F.col(weight_col).cast("double")
    return (
        df.withColumn("__aes_rank", rank)
        .orderBy(F.col("__aes_rank").desc(), F.col(key_col).asc())
        .limit(k)
        .drop("__aes_rank")
    )


def token_budget_trim(
    df: DataFrame,
    key_col: str,
    group_col: str,
    tokens_col: str,
    budget: int,
    seed: int | str = 0,
) -> DataFrame:
    """Trim each group (source / language / shard) to a HARD per-group token
    budget: rows are admitted in content-hash order until the group's
    cumulative ``tokens_col`` exceeds ``budget`` — the corpus-mixing
    primitive ("at most N tokens of source X in this training mix").

    Hash-ordered admission makes the kept set an unbiased, reproducible
    sample: the order is a pure function of (seed, key), so the same rows
    are admitted regardless of partitioning, engine, or when the group
    gained new rows — a group that grows only ever APPENDS to the back of
    its admission order, it never swaps already-admitted rows out... unless
    a new row hashes into the admitted prefix; for strict append-only
    admission across batches, snapshot the admitted keys instead.

    Scale: one window keyed on the group hash (the only shuffle); groups
    stream through their own sorted partition slice. A fractional
    (expectation-based) cap would be a pure filter — use
    ``deterministic_sample`` with fraction = budget/total when an
    approximate cap is acceptable and the extra shuffle is not.

    Ties: two keys with equal 8-hex hash prefixes order by the key itself,
    so admission stays deterministic."""
    from pyspark.sql import Window

    h = hash_bucket(F.col(key_col), seed)
    w = (
        Window.partitionBy(group_col)
        .orderBy(h.asc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum(F.col(tokens_col)).over(w)
    return df.withColumn("__cum", cum).filter(F.col("__cum") <= F.lit(budget)).drop(
        "__cum"
    )


def domain_mixture_sample(
    df: DataFrame,
    key_col: str,
    domain_col: str,
    temperature: float = 0.5,
    budget_frac: float = 0.5,
    seed: int | str = 0,
) -> DataFrame:
    """Temperature-based domain rebalancing: derive per-domain keep rates
    FROM the corpus's own domain counts (unlike stratified_sample, whose
    rates are caller-specified) and hash-filter to them.

    Target mixture p_d ∝ n_d^temperature (the multilingual-sampling rule of
    Conneau & Lample 2019 §3.1 / mT5: temperature 1 preserves the natural
    mixture, 0 equalizes domains, 0.5 is the usual compromise), scaled to a
    total budget of ``budget_frac`` × corpus size:

        rate_d = min(1, budget_frac · N · p_d / n_d),  rounded to 6 dp.

    Over-asked domains saturate at 1 (this operator only downsamples — the
    deterministic-decision contract cannot mint duplicate rows; pair with
    an explicit repeat-epochs step for true upsampling).

    Scale: the count aggregate is domain-cardinality-sized (map-side
    combined), rates ride back on a broadcast join, and the decision is the
    same per-row hash filter as every other sampler here — reproducible
    across runs, engines, and partitioning. The rate is rounded to 6
    decimals BEFORE the floor-to-integer threshold so both engines compare
    identical integers (a last-ulp pow()/sum-order difference cannot
    survive the rounding except within 5e-13 of a rounding boundary)."""
    from pyspark.sql import Window

    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("__n"))
    # empty-frame windows are single-partition by construction — harmless
    # here because `counts` is domain-cardinality-sized, never corpus-sized
    tot = F.sum("__n").over(Window.partitionBy())
    totp = F.sum(F.pow(F.col("__n").cast("double"), F.lit(temperature))).over(
        Window.partitionBy()
    )
    rates = counts.select(
        domain_col,
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(budget_frac)
                * tot.cast("double")
                * F.pow(F.col("__n").cast("double"), F.lit(temperature))
                / (totp * F.col("__n").cast("double")),
            ),
            6,
        ).alias("__rate"),
    )
    u = hash_unit_int(F.col(key_col), seed)
    thr = F.floor(F.col("__rate") * F.lit(float(_HEX_SPACE))).cast("bigint")
    return (
        df.join(F.broadcast(rates), domain_col)
        .filter(u < thr)
        .drop("__rate")
    )


def domain_mixture_upsample(
    df: DataFrame,
    key_col: str,
    domain_col: str,
    temperature: float = 0.5,
    budget_frac: float = 1.0,
    seed: int | str = 0,
    epoch_col: str = "epoch",
) -> DataFrame:
    """Temperature-based domain remixing WITH repeat epochs — the
    upsampling counterpart of domain_mixture_sample for targets that
    overshoot a domain's natural size (rate_d > 1): every row is emitted
    floor(rate_d) times and one extra time with probability frac(rate_d),
    decided by the same content hash as every sampler here. rate_d < 1
    degenerates to plain downsampling (0 or 1 copies). Output rows carry
    ``epoch_col`` (0-based copy index), so downstream shuffles/splits can
    keep copies distinguishable.

    The expected copy count per domain is exactly rate_d — the scarce-
    domain oversampling rule multilingual training mixes use (Conneau & Lample
    2019 §3.1) without an RNG: reruns, repartitions, and engine ports
    reproduce the identical multiset.

    Scale: identical posture to domain_mixture_sample (domain-sized count
    agg + broadcast rates), plus a per-row explode of at most
    ceil(max rate) sequence elements — output-proportional, no shuffle."""
    from pyspark.sql import Window

    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("__n"))
    tot = F.sum("__n").over(Window.partitionBy())
    totp = F.sum(F.pow(F.col("__n").cast("double"), F.lit(temperature))).over(
        Window.partitionBy()
    )
    rates = counts.select(
        domain_col,
        F.round(
            F.lit(budget_frac)
            * tot.cast("double")
            * F.pow(F.col("__n").cast("double"), F.lit(temperature))
            / (totp * F.col("__n").cast("double")),
            6,
        ).alias("__rate"),
    )
    u = hash_unit_int(F.col(key_col), seed)
    frac_thr = F.floor(
        (F.col("__rate") - F.floor(F.col("__rate"))) * F.lit(float(_HEX_SPACE))
    ).cast("bigint")
    n_copies = (F.floor(F.col("__rate")).cast("int") + F.when(u < frac_thr, 1).otherwise(0))
    return (
        df.join(F.broadcast(rates), domain_col)
        .withColumn("__nc", n_copies)
        .filter(F.col("__nc") > 0)
        .withColumn(epoch_col, F.explode(F.sequence(F.lit(0), F.col("__nc") - 1)))
        .drop("__rate", "__nc")
    )


def unimax_allocation(
    df: DataFrame,
    group_col: str,
    total_budget: float,
    epoch_cap: float = 4.0,
    weight_col: str | None = None,
) -> DataFrame:
    """UniMax budget allocation (Chung et al., ICLR 2023): split a total
    token/doc budget across groups (languages/sources) as UNIFORMLY as
    possible, subject to no group being repeated more than ``epoch_cap``
    epochs — the mixing rule that replaced temperature sampling for mT5/umT5
    because temperature both starves head languages and over-epochs tail
    ones.

    Water-filling with capacities c_d = n_d × epoch_cap (n_d = group row
    count, or sum(weight_col) when given — pass the token column for token
    budgets): groups too small to absorb a uniform share are fully allocated
    (all epoch_cap epochs), and the leftover budget is re-split uniformly
    among the rest. Sorted by capacity ascending, the fully-allocated set is
    provably a PREFIX (if c_d·(L−r+1) > remaining then c_{d+1}·(L−r) >
    remaining − c_d follows from the sort), so the whole allocation is two
    ordered window sums over the GROUP-CARDINALITY frame — no iteration, no
    driver loop, nothing corpus-sized past the one count/sum aggregate.

    If total_budget ≥ Σ c_d every group saturates at epoch_cap and the
    budget is underfilled (allocated sum < budget) — UniMax's own behavior:
    the cap exists to stop memorization, not to force-spend the budget.

    Output (one row per group): (group, n, capacity, allocated, epochs),
    allocated/epochs rounded to 6 dp so an IEEE-double replay (the DuckDB
    oracle) compares identical values.

    Scale: the corpus is touched once by the count/sum aggregate (map-side
    combined); everything after is group-cardinality-sized on a single
    partition — languages/sources number in the hundreds, not millions."""
    from pyspark.sql import Window

    n = (
        F.sum(F.col(weight_col).cast("double")) if weight_col else F.count(F.lit(1)).cast("double")
    )
    counts = df.groupBy(group_col).agg(n.alias("__n"))
    cap = F.col("__n") * F.lit(float(epoch_cap))
    # group-cardinality frame: the single-partition windows are deliberate
    w_ord = Window.orderBy(cap.asc(), F.col(group_col).asc())
    w_all = Window.partitionBy()
    sized = counts.select(
        group_col,
        "__n",
        cap.alias("__cap"),
        F.row_number().over(w_ord).alias("__r"),
        F.sum(cap).over(w_ord.rowsBetween(Window.unboundedPreceding, 0)).alias("__cum"),
        F.count(F.lit(1)).over(w_all).alias("__L"),
    )
    flag = (
        F.col("__cap") * (F.col("__L") - F.col("__r") + 1).cast("double")
        <= F.lit(float(total_budget)) - (F.col("__cum") - F.col("__cap"))
    )
    flagged = sized.withColumn("__sat", flag)
    p = F.sum(F.col("__sat").cast("int")).over(w_all)
    cumsat = F.coalesce(
        F.sum(F.when(F.col("__sat"), F.col("__cap"))).over(w_all), F.lit(0.0)
    )
    level = F.when(
        p < F.col("__L"),
        (F.lit(float(total_budget)) - cumsat) / (F.col("__L") - p).cast("double"),
    )
    alloc = F.when(F.col("__sat"), F.col("__cap")).otherwise(level)
    return flagged.select(
        F.col(group_col),
        F.col("__n").alias("n"),
        F.col("__cap").alias("capacity"),
        F.round(alloc, 6).alias("allocated"),
        F.round(alloc / F.col("__n"), 6).alias("epochs"),
    )


def unimax_sample(
    df: DataFrame,
    key_col: str,
    group_col: str,
    tokens_col: str,
    total_budget: float,
    epoch_cap: float = 4.0,
    seed: int | str = 0,
    epoch_col: str = "epoch",
) -> DataFrame:
    """Materialize a UniMax mix: every group repeats for floor(epochs) full
    passes, plus one partial pass trimmed to the leftover budget in
    content-hash order (the token_budget_trim admission rule, so the partial
    epoch is an unbiased reproducible sample of the group). Output rows
    carry ``epoch_col`` (0-based pass index); the summed ``tokens_col`` per
    group lands within one document of unimax_allocation's ``allocated``.

    Scale: allocation is group-sized (see unimax_allocation); the corpus
    pays one broadcast join, an explode of at most ceil(epoch_cap) copies
    (output-proportional), and one group-keyed window for the partial-epoch
    trim — the same posture as domain_mixture_upsample + token_budget_trim
    composed, which is exactly what this is."""
    from pyspark.sql import Window

    alloc = unimax_allocation(
        df, group_col, total_budget, epoch_cap, weight_col=tokens_col
    )
    full = F.floor(F.col("allocated") / F.col("n")).cast("int")
    rates = F.broadcast(
        alloc.select(
            group_col,
            full.alias("__full"),
            (F.col("allocated") - full.cast("double") * F.col("n")).alias("__rem"),
        )
    )
    joined = df.join(rates, group_col)
    h = hash_bucket(F.col(key_col), seed)
    w = (
        Window.partitionBy(group_col)
        .orderBy(h.asc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum(F.col(tokens_col).cast("double")).over(w)
    n_copies = F.col("__full") + F.when(cum <= F.col("__rem"), 1).otherwise(0)
    return (
        joined.withColumn("__nc", n_copies)
        .filter(F.col("__nc") > 0)
        .withColumn(epoch_col, F.explode(F.sequence(F.lit(0), F.col("__nc") - 1)))
        .drop("__full", "__rem", "__nc")
    )
