"""One-pass bounded-memory sketches — cardinality (KMV, HyperLogLog)
and frequency (count-min) estimation, the workhorse operators for
profiling a 100 TB corpus without a full distinct/groupBy shuffle:
vocabulary sizes, distinct-URL counts, heavy-hitter tokens.

Cross-engine exactness is the design constraint (the DuckDB oracle
hash-compares values): every sketch is built on a deterministic 60-bit
md5-derived hash (``h60``), all register/counter state is INTEGER, and
the only floating-point steps are single multiply/divide/round chains
on identical operands — IEEE-exact on both engines (no float folds, no
libm transcendentals; the HLL small-range ``ln`` correction is
deliberately omitted and documented below).

Scale shape:
* KMV — one ``h < threshold``-prunable pass; the k smallest distinct
  hashes are a TakeOrdered (no full sort); merge = union + re-take-k.
* HLL — one pass folding to m=256 integer registers (groupBy on an
  8-bit key, map-side partial max); merge = element-wise register max;
  estimate from the EXACT integer S = Σ 2^(53−ρ) (≤ 256·2^53 < 2^62,
  no float fold).  Small-range correction (m·ln(m/V)) is omitted
  because ``ln`` is not correctly-rounded identically across engines —
  callers counting < ~3·m distinct values should use KMV (exact there).
* Count-min — d=4 × w=1024 integer counter matrix (one groupBy over
  (row, bucket)), point estimate = min over rows; merge = element-wise
  add.  Overestimate-only by construction.  The d row hashes are
  disjoint 20-bit slices of ONE md5 digest (Kirsch & Mitzenmacher
  2006: two—here d—hash functions derived from a single digest keep
  the CM guarantees), so the token stream is hashed once, not d times.

References: Bar-Yossef et al. 2002 (KMV), Flajolet et al. 2007 (HLL),
Cormode & Muthukrishnan 2005 (count-min) — all public papers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sequin_spark.plan_capture import ckpt as _plan_ckpt

HLL_M = 256          # registers (8-bit bucket index)
CM_DEPTH = 4         # count-min hash rows
CM_WIDTH = 1024      # count-min buckets per row
_ALPHA_256 = 0.7182725932495458  # 0.7213 / (1 + 1.079/256), HLL constant
_POW2_53 = float(2 ** 53)
_POW2_60 = float(2 ** 60)


def h60(col) -> F.Column:
    """Deterministic 60-bit hash: first 15 hex chars of md5 — portable
    to the DuckDB oracle digit-for-digit (verified in tests)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def kmv_from_hashes(hashes: DataFrame, k: int = 256) -> DataFrame:
    """KMV estimate from a DISTINCT-hash column ``h``: one row
    (k, kth_min_hash, est_distinct).  est = (k−1)·2^60 / h_k — exact
    product (k−1 ≤ 2^10, 2^60 a power of two), one IEEE division.
    Shared by the batch sketch and the streaming twin's finalize so the
    estimate arithmetic cannot diverge between the two paths."""
    kth = (hashes.orderBy("h").limit(k)
           .agg(F.max("h").alias("hk"), F.count("*").alias("n")))
    return kth.select(
        F.lit(k).alias("k"),
        F.col("hk").alias("kth_min_hash"),
        F.when(F.col("n") < k, F.col("n").cast("double"))  # fewer than k: exact
        .otherwise(F.round(F.lit(float(k - 1)) * F.lit(_POW2_60) / F.col("hk"), 2))
        .alias("est_distinct"),
    )


def kmv_distinct(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """K-minimum-values distinct estimate over a raw column."""
    return kmv_from_hashes(df.select(h60(F.col(col)).alias("h")).distinct(), k)


def hll_registers(df: DataFrame, col: str) -> DataFrame:
    """The m=256 integer HLL register table (register, max_rho):
    register = h60 % 256, ρ = leading-zero count of the remaining
    52-bit word + 1 (= 53 − bitlength(w), via length(bin(w)) — exact
    integer on both engines; w = 0 → ρ = 53).  Mergeable by
    element-wise max."""
    base = df.select(h60(F.col(col)).alias("_h")).select(
        (F.col("_h") % HLL_M).cast("int").alias("register"),
        F.expr(f"_h div {HLL_M}").alias("_w"),  # top 52 bits, integer div
    )
    rho = F.when(F.col("_w") == 0, F.lit(53)).otherwise(
        F.lit(53) - F.length(F.expr("bin(_w)")))
    return (
        base.select("register", rho.cast("int").alias("rho"))
        .groupBy("register")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_estimate(registers: DataFrame) -> DataFrame:
    """One row (m, s_int, n_zero_registers, est_distinct) from a
    register table.  S = Σ_m 2^(53−ρ) with ρ=0 for absent registers —
    an EXACT bigint; est = α·m²·2^53 / S (two exact products of
    literals, one IEEE division, one round)."""
    # coalesce: sum() over an EMPTY register table is NULL — without it
    # an empty corpus yields NULL s_int/est instead of the all-absent-
    # registers state (S = m·2^53, est = α·m²/m = α·m ≈ 183.9 for
    # m=256 — the defined raw-HLL answer; we document the
    # no-small-range-correction tradeoff rather than special-case it)
    s_present = registers.agg(
        F.coalesce(
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 53 - max_rho)")),
            F.lit(0)).alias("s_p"),
        F.count("*").alias("n_present"),
        F.coalesce(F.sum(F.when(F.col("max_rho") == 0, 1).otherwise(0)),
                   F.lit(0)).alias("z_p"),
    )
    return s_present.select(
        F.lit(HLL_M).alias("m"),
        # absent registers contribute 2^53 each (rho = 0)
        (F.col("s_p") + (F.lit(HLL_M) - F.col("n_present")) * F.lit(2 ** 53))
        .cast("long").alias("s_int"),
        (F.lit(HLL_M) - F.col("n_present") + F.col("z_p"))
        .cast("long").alias("n_zero_registers"),
    ).select(
        "m", "s_int", "n_zero_registers",
        F.round(F.lit(_ALPHA_256 * HLL_M * HLL_M) * F.lit(_POW2_53)
                / F.col("s_int"), 1).alias("est_distinct"),
    )


def hll_distinct(df: DataFrame, col: str) -> DataFrame:
    return hll_estimate(hll_registers(df, col))


def _cm_row_buckets(digest: F.Column) -> F.Column:
    """array of (row, bucket) structs from ONE md5 digest: row r's
    bucket is the r-th disjoint 20-bit (5-hex-digit) slice mod w.
    Kirsch–Mitzenmacher-style derivation of the d hash functions from a
    single digest — 1 md5 per value instead of d, which is 4× less
    hashing on the 100 TB token stream; each slice is exactly uniform
    mod w because 2^20 % CM_WIDTH == 0."""
    assert (1 << 20) % CM_WIDTH == 0
    return F.array(*[
        F.struct(
            F.lit(r).alias("row"),
            (F.conv(F.substring(digest, 1 + 5 * r, 5), 16, 10)
             .cast("long") % CM_WIDTH).cast("int").alias("bucket"),
        )
        for r in range(CM_DEPTH)
    ])


def cm_counters(df: DataFrame, col: str, weight: str | None = None) -> DataFrame:
    """The d×w count-min counter table (row, bucket, cnt); the d row
    hashes are disjoint slices of one md5 digest (_cm_row_buckets).
    Mergeable by element-wise add."""
    wcol = F.col(weight) if weight else F.lit(1)
    return (
        df.select(F.md5(F.col(col).cast("string")).alias("_m"),
                  wcol.alias("_w"))
        .select(F.explode(_cm_row_buckets(F.col("_m"))).alias("rb"), "_w")
        .select(F.col("rb.row").alias("row"),
                F.col("rb.bucket").alias("bucket"), "_w")
        .groupBy("row", "bucket")
        .agg(F.sum("_w").cast("long").alias("cnt"))
    )


def cm_point_estimates(counters: DataFrame, candidates: DataFrame,
                       col: str) -> DataFrame:
    """min over rows of counter[r, h_r(value)] for each candidate —
    the count-min point query (never under-estimates)."""
    probes = (
        candidates.select(F.col(col).cast("string").alias("_v"))
        .select("_v", F.explode(_cm_row_buckets(
            F.md5(F.col("_v")))).alias("rb"))
        .select("_v", F.col("rb.row").alias("row"),
                F.col("rb.bucket").alias("bucket"))
    )
    return (
        probes.join(counters, ["row", "bucket"])
        .groupBy("_v")
        .agg(F.min("cnt").alias("cm_estimate"))
        .select(F.col("_v").alias(col), "cm_estimate")
    )


def kmv_jaccard(df_a: DataFrame, df_b: DataFrame, col: str,
                k: int = 256) -> DataFrame:
    """KMV set-operation sketch (Beyer et al. 2007 "On synopses for
    distinct-value estimation"): from the k smallest hashes of A∪B,
    the fraction also present in BOTH sides estimates Jaccard
    similarity, and |A∪B|·J estimates the intersection size — the
    vocabulary-overlap probe between two corpora without a full
    distinct-join.  One row: (k, n_union_sample, jaccard,
    est_union, est_intersection).

    All-integer membership logic on the shared h60 hash; the only
    float steps are the same exact-product/divide/round chains as
    kmv_from_hashes — cross-engine exact."""
    # origin flags folded in the SAME groupBy that dedups the union —
    # one shuffle on h, then a TakeOrdered for the k-sample; no outer
    # joins (which would shuffle the big sides a second time)
    tagged = (
        df_a.select(h60(F.col(col)).alias("h"),
                    F.lit(1).alias("_a"), F.lit(0).alias("_b"))
        .unionByName(
            df_b.select(h60(F.col(col)).alias("h"),
                        F.lit(0).alias("_a"), F.lit(1).alias("_b")))
        .groupBy("h")
        .agg(F.max("_a").alias("_a"), F.max("_b").alias("_b"))
    )
    marked = tagged.orderBy("h").limit(k)
    agg = marked.agg(
        F.count("*").alias("n"),
        F.max("h").alias("hk"),
        F.sum(F.when((F.col("_a") == 1) & (F.col("_b") == 1), 1)
              .otherwise(0)).alias("n_both"),
    )
    est_union = (
        F.when(F.col("n") < k, F.col("n").cast("double"))
        .otherwise(F.round(F.lit(float(k - 1)) * F.lit(_POW2_60)
                           / F.col("hk"), 2)))
    return agg.select(
        F.lit(k).alias("k"),
        F.col("n").cast("long").alias("n_union_sample"),
        F.round(F.col("n_both") / F.col("n"), 4).alias("jaccard"),
        est_union.alias("est_union"),
        F.round(est_union * F.col("n_both") / F.col("n"), 2)
        .alias("est_intersection"),
    )


def hll_union_intersection(df_a: DataFrame, df_b: DataFrame, col: str) -> DataFrame:
    """HLL set operations: |A∪B| from the element-wise MAX of the two
    register tables (the lossless HLL merge), |A∩B| by
    inclusion–exclusion est_A + est_B − est_union.  One row:
    (est_a, est_b, est_union, est_intersection).

    Inclusion–exclusion inherits both sketches' error and can go
    slightly negative for near-disjoint sets — standard HLL behavior
    (callers wanting guarded overlap estimates use kmv_jaccard, whose
    intersection estimate is nonnegative by construction); we clamp at
    0 like every production HLL library.  The merge itself is the same
    register-max the streaming twin exercises across micro-batches.

    Plan shape (r13 optimization round): BOTH sides' register tables
    come from ONE side-tagged aggregation pass — the old shape
    evaluated hll_registers(df_a) and hll_registers(df_b) twice each
    (once for its estimate, once inside the union merge), i.e. four
    full hash passes over the inputs.  The ≤2·m-row keyed register
    table is lazily localCheckpointed, so the three estimates and the
    merge all read the same materialized 512 rows; register values are
    bit-identical to the per-side builder's."""
    tagged = (
        df_a.select(h60(F.col(col)).alias("_h"), F.lit(0).alias("_side"))
        .unionByName(
            df_b.select(h60(F.col(col)).alias("_h"),
                        F.lit(1).alias("_side"))))
    base = tagged.select(
        "_side",
        (F.col("_h") % HLL_M).cast("int").alias("register"),
        F.expr(f"_h div {HLL_M}").alias("_w"))
    rho = F.when(F.col("_w") == 0, F.lit(53)).otherwise(
        F.lit(53) - F.length(F.expr("bin(_w)")))
    regs = (base.select("_side", "register", rho.cast("int").alias("rho"))
            .groupBy("_side", "register")
            .agg(F.max("rho").alias("max_rho")))
    regs = _plan_ckpt(regs)
    ra = regs.filter(F.col("_side") == 0).select("register", "max_rho")
    rb = regs.filter(F.col("_side") == 1).select("register", "max_rho")
    merged = (regs.groupBy("register")
              .agg(F.max("max_rho").alias("max_rho")))
    ea = hll_estimate(ra).select(F.col("est_distinct").alias("est_a"))
    eb = hll_estimate(rb).select(F.col("est_distinct").alias("est_b"))
    eu = hll_estimate(merged).select(
        F.col("est_distinct").alias("est_union"))
    return (ea.join(eb).join(eu)
            .select(
                "est_a", "est_b", "est_union",
                F.greatest(
                    F.round(F.col("est_a") + F.col("est_b")
                            - F.col("est_union"), 1),
                    F.lit(0.0)).alias("est_intersection")))


def sample_quantile_sketch(df: DataFrame, key_col: str, value_col: str,
                           k: int = 256,
                           quantiles: tuple = (0.5, 0.9, 0.99)) -> DataFrame:
    """Mergeable quantile ESTIMATION — the sketch family KMV/HLL/CM do
    not cover: empirical quantiles of a hash-order-statistic uniform
    k-sample (the same device as reservoir_sample/KMV: the k smallest
    h60(key) rows ARE a uniform sample, deterministic, mergeable by
    keeping the k smallest of any union).  No global sort ever touches
    the value column — the plan is a TakeOrdered on the hash (k·
    partitions rows to the driver-side merge) + a ≤k-row quantile
    rank, vs the full per-group sort exact_quantiles pays.  Error is
    the usual sampling error (≈ ±1.3/√k per quantile at q(1−q)=¼).

    Emits one row per q: (q, k_sample, est_value) — estimate only;
    pair with exact order statistics outside when measuring error
    (the registry query does)."""
    sample = (df.select(h60(F.col(key_col)).alias("_h"),
                        F.col(value_col).alias("v"))
              .orderBy("_h").limit(k))
    from pyspark.sql import Window
    w = Window.orderBy("v")
    ranked = (sample.select("v")
              .withColumn("_rn", F.row_number().over(w))
              .withColumn("_n", F.count("*").over(
                  Window.partitionBy())))
    qarr = F.array(*[F.lit(float(q)) for q in quantiles])
    return (ranked.withColumn("q", F.explode(qarr))
            .filter(F.col("_rn") == F.ceil(F.col("q") * F.col("_n")))
            .select("q", F.col("_n").cast("long").alias("k_sample"),
                    F.col("v").alias("est_value")))


def hll_per_key(df: DataFrame, group_col: str, col: str) -> DataFrame:
    """Per-KEY distinct-count sketch: one m=256 HLL per group value —
    "distinct users per event type" at 100 TB without a per-group
    exact distinct shuffle of the full key space.  State is
    |groups|×256 ints, mergeable register-wise (same fold the
    streaming twin maintains).  Emits (group, s_int, est_distinct)
    with the same exact-integer S as the global sketch, PLUS the
    Flajolet small-range correction the global sketch documents away:
    per-key cardinalities are routinely ≪ m, where raw HLL floors at
    α·m ≈ 184 — when raw ≤ 2.5·m and zero registers exist, linear
    counting m·ln(m/V) applies (V = zero registers; one ln() per
    GROUP, not per row — the ≤1-ulp libm variance sits under the
    0.1 rounding for any value off an exact .05 boundary)."""
    return hll_per_key_finalize(
        hll_per_key_registers(df, group_col, col), group_col)


def hll_per_key_registers(df: DataFrame, group_col: str,
                          col: str) -> DataFrame:
    """The (g, register, max_rho) table — a SINGLE max-fold keyed on
    (group, register), so on a streaming DataFrame the state store
    maintains it across micro-batches directly (complete mode; Spark
    allows one streaming aggregation per query, which is exactly what
    this is — finalize runs on the materialized registers, the KMV
    pattern)."""
    return (
        df.select(F.col(group_col).alias("g"),
                  h60(F.col(col)).alias("_h"))
        .select(
            "g",
            (F.col("_h") % HLL_M).cast("int").alias("register"),
            F.expr(f"_h div {HLL_M}").alias("_w"))
        .select(
            "g", "register",
            F.when(F.col("_w") == 0, F.lit(53)).otherwise(
                F.lit(53) - F.length(F.expr("bin(_w)")))
            .cast("int").alias("rho"))
        .groupBy("g", "register")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_per_key_finalize(regs: DataFrame, group_col: str) -> DataFrame:
    """(g, register, max_rho) → (group, s_int, est_distinct) with the
    small-range correction; shared by batch and the streaming twin so
    the estimate arithmetic cannot diverge."""
    per_g = regs.groupBy("g").agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 53 - max_rho)"))
        .alias("s_p"),
        F.count("*").alias("n_present"),
    )
    staged = per_g.select(
        F.col("g").alias(group_col),
        (F.col("s_p") + (F.lit(HLL_M) - F.col("n_present"))
         * F.lit(2 ** 53)).cast("long").alias("s_int"),
        (F.lit(HLL_M) - F.col("n_present")).cast("long").alias("_v"),
    ).withColumn(
        "_raw",
        F.lit(_ALPHA_256 * HLL_M * HLL_M) * F.lit(_POW2_53)
        / F.col("s_int"))
    corrected = F.when(
        (F.col("_raw") <= 2.5 * HLL_M) & (F.col("_v") > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / F.col("_v")),
    ).otherwise(F.col("_raw"))
    return staged.select(
        group_col, "s_int",
        F.round(corrected, 1).alias("est_distinct"))


BLOOM_BITS = 1 << 16   # m: 2^16 bits — 2^20 % m == 0 keeps slices uniform
BLOOM_DEPTH = 4        # d hash functions (the 4 disjoint md5 slices)


def bloom_positions(col: F.Column) -> F.Column:
    """array<int> of the d bit positions for a value — the d hashes are
    disjoint 20-bit md5 slices mod m (the count-min derivation device;
    exact uniformity since 2^20 % m == 0)."""
    assert (1 << 20) % BLOOM_BITS == 0
    digest = F.md5(col.cast("string"))
    return F.array(*[
        (F.conv(F.substring(digest, 1 + 5 * r, 5), 16, 10)
         .cast("long") % BLOOM_BITS).cast("int")
        for r in range(BLOOM_DEPTH)
    ])


def bloom_build(df: DataFrame, col: str) -> DataFrame:
    """The set-bit table (bit_pos) of a Bloom filter over ``col`` —
    distinct positions only, mergeable by UNION (bitwise OR).  At
    100 TB the build is one map + one distinct on ≤m ints; the result
    broadcasts (≤ 8 KB packed, ≤ 65k rows relational) to probe any
    stream without touching the corpus again."""
    return (df.select(F.explode(bloom_positions(F.col(col)))
                      .alias("bit_pos"))
            .dropDuplicates(["bit_pos"]))


def bloom_probe(bits: DataFrame, probes: DataFrame, col: str) -> DataFrame:
    """Probe verdict per candidate: maybe_present ⇔ ALL d positions
    set.  Join shape: explode probes to (value, pos), broadcast
    LEFT-join the (deduped) bit table and count matched positions per
    value in the SAME aggregation — the corpus never rejoins, and
    unlike the old semi-join + rejoin shape the probe stream is
    evaluated once, not twice (unmatched rows survive the left join
    with a NULL marker, so no second probes pass is needed to recover
    the all-miss values)."""
    from pyspark.sql import functions as _F
    probed = (probes.select(F.col(col).alias("v")).dropDuplicates()
              .select("v", F.explode(bloom_positions(F.col("v")))
                      .alias("bit_pos")))
    marked = _F.broadcast(
        bits.dropDuplicates(["bit_pos"]).withColumn("_hit", _F.lit(1)))
    return (probed.join(marked, "bit_pos", "left")
            .groupBy("v")
            .agg((_F.coalesce(_F.sum("_hit"), _F.lit(0))
                  == BLOOM_DEPTH).alias("maybe_present")))


def sample_quantile_sketch_per_key(
    df: DataFrame, group_col: str, key_col: str, value_col: str,
    k: int = 128, quantiles: tuple = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Per-GROUP quantile sketch — "p99 latency per event type" at
    100 TB without a per-group sort of the value column: keep the k
    smallest h60(key) rows PER GROUP (a deterministic uniform k-sample
    per group, same hash-order-statistic device as the global sketch),
    then rank the ≤k-row samples.  Plan: ONE shuffle keyed on the
    group; the row_number ≤ k filter executes as a partial top-k per
    partition (WindowGroupLimit), so only k rows per group survive the
    exchange; the quantile rank then runs over |groups|·k rows.
    Mergeable: the union of two groups' samples re-ranked is the sample
    of the union (k smallest of a union of k-smallest sets).

    Emits (group, q, k_sample, est_value) per group × quantile."""
    from pyspark.sql import Window

    w_h = Window.partitionBy("g").orderBy("_h")
    sample = (
        df.select(F.col(group_col).alias("g"),
                  h60(F.col(key_col)).alias("_h"),
                  F.col(value_col).alias("v"))
        .withColumn("_sn", F.row_number().over(w_h))
        .filter(F.col("_sn") <= k)
    )
    w_v = Window.partitionBy("g").orderBy("v")
    ranked = (
        sample.select("g", "v")
        .withColumn("_rn", F.row_number().over(w_v))
        .withColumn("_n", F.count("*").over(Window.partitionBy("g")))
    )
    qarr = F.array(*[F.lit(float(q)) for q in quantiles])
    return (ranked.withColumn("q", F.explode(qarr))
            .filter(F.col("_rn") == F.ceil(F.col("q") * F.col("_n")))
            .select(F.col("g").alias(group_col), "q",
                    F.col("_n").cast("long").alias("k_sample"),
                    F.col("v").alias("est_value")))


def ams_f2(df: DataFrame, col: str, groups: int = 5,
           per_group: int = 11) -> DataFrame:
    """AMS second-frequency-moment sketch (Alon-Matias-Szegedy 1996),
    median-of-means form: groups × per_group sign estimators, each
    est_j = (sum_w s_j(w)·f_w)^2 with the ±1 sign s_j(w) = bit j of
    h60(w) (one digest feeds all estimators — the same single-digest
    slicing the count-min rows use; needs groups·per_group <= 60
    bits).  Group mean = integer-floor sum div per_group; released
    estimate = the MEDIAN group mean (odd ``groups`` → a pure order
    statistic).  Everything is 64-bit integer, engine-exact.

    F2 = Σ f_w² is the self-join size / skew statistic query planners
    and salting heuristics need; the sketch gets it in one pass over
    a (distinct value, count) table with O(groups·per_group) state
    per merge.

    Plan: one value-keyed count shuffle → narrow ±f_w array explode
    (one row per estimator per DISTINCT value, not per token) → one
    (groups·per_group)-row aggregate.  Returns one row (k, f2_est).
    """
    from pyspark.sql import Window

    k = groups * per_group
    assert k <= 60 and groups % 2 == 1
    counts = (
        df.select(F.col(col).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
        .withColumn("_h", h60(F.col("w")))
    )
    signed = counts.select(
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {k - 1}), "
                "j -> CASE WHEN (shiftright(_h, j) & 1) = 1 "
                "THEN f ELSE -f END)")
        ).alias("j", "sf")
    )
    gmeans = (
        signed.groupBy("j")
        .agg(F.sum("sf").alias("s"))
        .select((F.col("j") % groups).alias("g"),
                (F.col("s") * F.col("s")).cast("long").alias("est"))
        .groupBy("g")
        .agg(F.expr(f"sum(est) div {per_group}").alias("gmean"))
    )
    med = (groups + 1) // 2
    w_e = Window.orderBy(F.col("gmean").asc(), F.col("g").asc())
    return (
        gmeans.withColumn("_rk", F.row_number().over(w_e))
        .filter(F.col("_rk") == med)
        .select(F.lit(k).cast("int").alias("k"),
                F.col("gmean").alias("f2_est"))
    )


def sql_ams_f2(values_cte: str, h60_of, groups: int = 5,
               per_group: int = 11) -> str:
    """DuckDB oracle for :func:`ams_f2`: ``values_cte`` yields one row
    per element (column ``w``); the series cross join replaces the
    posexplode (DuckDB has no plan gate; values are identical)."""
    k = groups * per_group
    med = (groups + 1) // 2
    return f"""
WITH vals AS MATERIALIZED ({values_cte}),
counts AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS f, {h60_of("w")} AS h
  FROM vals GROUP BY w),
signed AS (
  SELECT j, CASE WHEN (h >> j) & 1 = 1 THEN f ELSE -f END AS sf
  FROM counts, (SELECT unnest(generate_series(0, {k - 1})) AS j)),
ests AS (
  SELECT j, CAST(sum(sf) * sum(sf) AS BIGINT) AS est
  FROM signed GROUP BY j),
gmeans AS (
  SELECT j % {groups} AS g, CAST(sum(est) // {per_group} AS BIGINT) AS gmean
  FROM ests GROUP BY j % {groups}),
ranked AS (
  SELECT gmean, row_number() OVER (ORDER BY gmean ASC, g ASC) AS rk
  FROM gmeans)
SELECT CAST({k} AS INTEGER) AS k, gmean AS f2_est FROM ranked WHERE rk = {med}
"""
