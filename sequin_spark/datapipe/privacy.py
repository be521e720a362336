"""DP-mechanism release operators (replayable pseudo-DP).

Training corpora increasingly ship with per-source / per-cell summary
statistics; when those summaries leave the trust boundary they need DP
noise (the same reason the PII scrub in ``datapipe/text.py`` exists).
This module implements the **discrete Laplace (two-sided geometric)
mechanism** for count histograms:

    P(K = k)  ∝  alpha^|k|,   alpha = exp(-eps / sensitivity)

**What the determinism contract buys — and costs.**  A replayable
pipeline (and a cross-engine oracle) demands a seeded draw, so noise
is a keyed PRF per release cell:

    u(cell) = h60(cell_key || salt) / 2^60  ∈ [0, 1)

and K = the inverse-CDF bucket of ``u``.  With the default checked-in
``salt`` the draw is exactly reconstructible by anyone with the source
(this repo's own tests replay it), which means the released ``n_dp`` /
``sum_dp`` reveal the true values to such an observer — the outputs
here are **replayable pseudo-DP for pipeline testing and shape
validation, not a privacy guarantee**.  A production release MUST pass
a caller-supplied secret ``salt`` (kept out of the release artifact);
under a secret uniformly-chosen salt the PRF draw stands in for the
mechanism's randomness and the DP analysis below applies against
observers without the salt.

**Mechanism accounting.**  The CDF is truncated to |k| <= trunc_k and
renormalized.  Truncation makes outputs beyond the band
probability-zero, so adjacent datasets can disagree with unbounded
likelihood ratio at the boundary: the truncated mechanism is NOT pure
eps-DP but **(eps, delta)-DP with delta ≈ the truncated tail mass**
(~1.3% at the default alpha=0.9, trunc_k=40; shrink delta by widening
trunc_k — alpha^trunc_k decays geometrically).  Every threshold is a
Python-computed double injected as a literal into BOTH the Spark plan
and the DuckDB oracle, and the bucket lookup is a pure array-lambda
scan (`size(filter(cums, c -> c <= u))`) — no joins, no RNG state, no
cross-engine libm calls.

Scale shape: the histogram is one group-keyed shuffle with map-side
combine; the noise attach is a narrow per-row expression over the
(bounded, |cells|-row) aggregate.  At 100 TB the cost IS the count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sequin_spark.plan_capture import ckpt as _plan_ckpt

TWO60 = float(1 << 60)


def geometric_cdf_thresholds(alpha: float = 0.9, trunc_k: int = 40) -> list[float]:
    """Cumulative CDF thresholds c_i = P(K <= -trunc_k - 1 + i) of the
    truncated two-sided geometric, i = 1..2*trunc_k+1 (last = 1.0).
    Noise k for a uniform u is  -trunc_k + |{c_i <= u}|."""
    ks = list(range(-trunc_k, trunc_k + 1))
    weights = [alpha ** abs(k) for k in ks]
    total = sum(weights)
    cums, acc = [], 0.0
    for w in weights:
        acc += w / total
        cums.append(min(acc, 1.0))
    cums[-1] = 1.0
    return cums


def _noise_expr_spark(u_col: str, cums: list[float]) -> str:
    arr = ", ".join(f"{c!r}D" for c in cums)
    k0 = (len(cums) - 1) // 2
    return f"CAST(size(filter(array({arr}), c -> c <= {u_col})) - {k0} AS BIGINT)"


def noise_expr_sql(u_expr: str, cums: list[float]) -> str:
    """The identical inverse-CDF bucket scan as a DuckDB expression."""
    arr = ", ".join(repr(c) for c in cums)
    k0 = (len(cums) - 1) // 2
    return (f"CAST(len(list_filter([{arr}], c -> c <= {u_expr})) - {k0}"
            " AS BIGINT)")


def attach_dp_noise(
    counts: DataFrame,
    keys: list[str],
    count_col: str = "n_true",
    salt: str = "dp1",
    alpha: float = 0.9,
    trunc_k: int = 40,
) -> DataFrame:
    """Attach the keyed-PRF discrete-Laplace noise to an ALREADY
    AGGREGATED per-cell count table — the release step, shared by the
    batch histogram and its streaming twin (the noise is a pure
    deterministic function of the cell key, so releasing from a
    streaming aggregation's final state produces the identical
    release the batch path computes)."""
    from sequin_spark.datapipe.sketch import h60

    cums = geometric_cdf_thresholds(alpha, trunc_k)
    cell_key = F.concat_ws("|", *[F.col(c) for c in keys], F.lit(salt))
    return (
        counts.withColumn("_u", h60(cell_key) / F.lit(TWO60))
        .withColumn("k_noise", F.expr(_noise_expr_spark("_u", cums)))
        .select(
            *keys,
            F.col(count_col).cast("long").alias("n_true"),
            "k_noise",
            F.greatest(F.lit(0).cast("long"),
                       F.col(count_col).cast("long")
                       + F.col("k_noise")).alias("n_dp"),
        )
    )


def dp_count_histogram(
    df: DataFrame,
    keys: list[str],
    salt: str = "dp1",
    alpha: float = 0.9,
    trunc_k: int = 40,
) -> DataFrame:
    """DP-mechanism count histogram over ``keys`` cells (sensitivity 1:
    one row added/removed moves one cell count by one; replayable
    pseudo-DP under the default salt — module docstring).  Per cell:
    n_true (pre-noise, for audit builds only — a production release
    would drop it), k_noise, and n_dp = max(0, n_true + k_noise)
    (non-negativity is post-processing, DP-free)."""
    counts = df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_true"))
    return attach_dp_noise(counts, keys, "n_true", salt, alpha, trunc_k)


def dp_clamped_sum(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    clamp: int,
    salt: str = "dpsum1",
    alpha: float = 0.9,
    trunc_k: int = 40,
) -> DataFrame:
    """DP sum release with contribution bounding: each row's value is
    clamped to [0, clamp] BEFORE aggregation (the user-level-DP
    prerequisite — one row can move the sum by at most ``clamp``), then
    discrete-Laplace noise scaled by the sensitivity is added:

        n_dp = max(0, sum(clamped) + clamp * K)

    with K drawn from the same truncated two-sided geometric as the
    histogram (scaling the geometric by the sensitivity is the
    standard integer-valued calibration; effective eps divides by
    ``clamp``).  Same shape: one keyed shuffle, narrow noise attach."""
    from sequin_spark.datapipe.sketch import h60

    cums = geometric_cdf_thresholds(alpha, trunc_k)
    cell_key = F.concat_ws("|", *[F.col(c) for c in keys], F.lit(salt))
    clamped = F.least(
        F.greatest(F.col(value_col).cast("long"), F.lit(0).cast("long")),
        F.lit(int(clamp)).cast("long"))
    agg = (
        df.groupBy(*keys)
        .agg(F.sum(clamped).alias("sum_clamped"),
             F.count(F.lit(1)).cast("long").alias("n_rows"))
        .withColumn("_u", h60(cell_key) / F.lit(TWO60))
    )
    return (
        agg.withColumn("k_noise", F.expr(_noise_expr_spark("_u", cums)))
        .select(
            *keys,
            "n_rows",
            "sum_clamped",
            "k_noise",
            F.greatest(
                F.lit(0).cast("long"),
                F.col("sum_clamped") + F.lit(int(clamp)) * F.col("k_noise"),
            ).alias("sum_dp"),
        )
    )


def sql_dp_clamped_sum(
    table_sql: str,
    keys: list[str],
    value_col: str,
    clamp: int,
    h60_of,
    salt: str = "dpsum1",
    alpha: float = 0.9,
    trunc_k: int = 40,
) -> str:
    cums = geometric_cdf_thresholds(alpha, trunc_k)
    key_expr = "concat_ws('|', " + ", ".join(keys) + f", '{salt}')"
    u = f"({h60_of(key_expr)} / {TWO60!r})"
    noise = noise_expr_sql("u", cums)
    key_cols = ", ".join(keys)
    clamped = (f"least(greatest(CAST({value_col} AS BIGINT), 0), {clamp})")
    return f"""
WITH agg AS (
  SELECT {key_cols},
         CAST(sum({clamped}) AS BIGINT) AS sum_clamped,
         CAST(count(*) AS BIGINT) AS n_rows,
         {u} AS u
  FROM {table_sql} GROUP BY {key_cols}
)
SELECT {key_cols}, n_rows, sum_clamped, {noise} AS k_noise,
       greatest(CAST(0 AS BIGINT), sum_clamped + {clamp} * {noise}) AS sum_dp
FROM agg
"""


def _fold_zero_steps(scale: int, decay_num: int, decay_den: int) -> int:
    """Exact number of ``acc -> acc * decay_num div decay_den`` folds
    after which the integer weight reaches 0 from ``scale`` (263 at the
    default 1e12 @ 9/10).  Folding past this point keeps acc at 0, so
    capping the fold length at it is behavior-identical — and it bounds
    the per-row work at O(cap) instead of O(group size) (an
    uncapped ``sequence(1, d)`` materializes an O(n) array per row,
    O(n^2) work per group, and d >= 2^31 would wrap the INT cast)."""
    acc, steps = scale, 0
    while acc > 0:
        acc = (acc * decay_num) // decay_den
        steps += 1
    return steps


def dp_quantile_exponential(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    q_num: int = 1,
    q_den: int = 2,
    decay_num: int = 9,
    decay_den: int = 10,
    scale: int = 10**12,
    salt: str = "dpq1",
) -> DataFrame:
    """DP quantile per group via the **exponential mechanism** with a
    fully integer, engine-exact weight trajectory:

        utility(v)  = -|q_den * cum_le(v) - q_num * n|      (integer d)
        weight(v)   = fold of  w -> w * decay_num div decay_den,
                      d times, from ``scale``                 (integer)
        selection   = first candidate (by value order) whose running
                      weight sum exceeds floor(u * total_weight)

    The decay fold replaces exp(-eps*d/2): decay = exp(-eps/2), so
    eps = 2*ln(decay_den/decay_num) per unit of rank distance
    (~0.211 at the default 9/10 — concentrated within a few ranks of
    the true quantile at n in the hundreds; use 99/100 for a tighter
    eps ~0.0201 when the group sizes support it).  Every quantity is a 64-bit integer except u
    (the keyed-PRF uniform) and the single floor(u*total) product —
    IEEE multiply+floor, deterministic.  Candidates are the group's
    distinct values: one keyed count shuffle + two windows over the
    same group partition (cum + running weight sum); the per-row fold
    is O(rank distance), bounded by group cardinality.

    Output value column is named ``dp_q``: the DP-selected quantile.
    """
    from pyspark.sql import Window

    from sequin_spark.datapipe.sketch import h60

    w_grp = Window.partitionBy(*keys).orderBy(F.col("v").asc())
    counts = (
        df.select(*keys, F.col(value_col).cast("long").alias("v"))
        .groupBy(*keys, "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    scored = (
        counts.withColumn("cum", F.sum("c").over(
            w_grp.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("n", F.sum("c").over(Window.partitionBy(*keys)))
        .withColumn("d", F.abs(F.lit(q_den) * F.col("cum")
                               - F.lit(q_num) * F.col("n")))
        # d = 0 guarded explicitly: Spark's sequence(1, 0) is the
        # DESCENDING [1, 0], not empty — it would fold twice.  The
        # fold length is capped at the exact step where the integer
        # weight floors to 0 (see _fold_zero_steps) — identical output,
        # O(cap) per row instead of O(group size), no INT wrap.
        .withColumn(
            "wgt",
            F.when(F.col("d") == 0, F.lit(scale).cast("long")).otherwise(
                F.expr(
                    f"aggregate(sequence(1, CAST(least(d, "
                    f"{_fold_zero_steps(scale, decay_num, decay_den)}) "
                    f"AS INT)), "
                    f"CAST({scale} AS BIGINT), "
                    f"(acc, x) -> (acc * {decay_num}) div {decay_den})")),
        )
    )
    cell_key = F.concat_ws("|", *[F.col(c) for c in keys], F.lit(salt))
    sel = (
        scored.withColumn("cum_w", F.sum("wgt").over(
            w_grp.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("tot_w", F.sum("wgt").over(Window.partitionBy(*keys)))
        .withColumn("_u", h60(cell_key) / F.lit(TWO60))
        .withColumn("target", F.floor(F.col("_u") * F.col("tot_w")).cast("long"))
        .filter(F.col("cum_w") > F.col("target"))
    )
    w_pick = Window.partitionBy(*keys).orderBy(F.col("v").asc())
    return (
        sel.withColumn("_rk", F.row_number().over(w_pick))
        .filter(F.col("_rk") == 1)
        .select(*keys, F.col("v").alias("dp_q"), "n")
    )


def sql_dp_quantile_exponential(
    table_sql: str,
    keys: list[str],
    value_col: str,
    h60_of,
    q_num: int = 1,
    q_den: int = 2,
    decay_num: int = 9,
    decay_den: int = 10,
    scale: int = 10**12,
    salt: str = "dpq1",
) -> str:
    """DuckDB oracle: identical integer trajectory (list_reduce fold,
    identical zero-floor fold cap), identical keyed-PRF draw,
    identical selection rule."""
    cap = _fold_zero_steps(scale, decay_num, decay_den)
    key_cols = ", ".join(keys)
    key_expr = "concat_ws('|', " + ", ".join(keys) + f", '{salt}')"
    u = f"({h60_of(key_expr)} / {TWO60!r})"
    return f"""
WITH counts AS (
  SELECT {key_cols}, CAST({value_col} AS BIGINT) AS v,
         CAST(count(*) AS BIGINT) AS c
  FROM {table_sql} GROUP BY {key_cols}, CAST({value_col} AS BIGINT)
),
scored AS (
  SELECT {key_cols}, v, c,
         CAST(sum(c) OVER (PARTITION BY {key_cols} ORDER BY v ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(sum(c) OVER (PARTITION BY {key_cols}) AS BIGINT) AS n
  FROM counts
),
weighted AS (
  SELECT *, abs({q_den} * cum - {q_num} * n) AS d,
         CASE WHEN abs({q_den} * cum - {q_num} * n) = 0
              THEN CAST({scale} AS BIGINT)
              ELSE CAST(list_reduce(
                     list_prepend(CAST({scale} AS BIGINT),
                       list_transform(generate_series(1,
                         CAST(least(abs({q_den} * cum - {q_num} * n),
                                    {cap}) AS INTEGER)),
                         x -> CAST(0 AS BIGINT))),
                     (acc, x) -> (acc * {decay_num}) // {decay_den})
                   AS BIGINT) END AS wgt
  FROM scored
),
sel AS (
  SELECT *,
         CAST(sum(wgt) OVER (PARTITION BY {key_cols} ORDER BY v ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_w,
         CAST(sum(wgt) OVER (PARTITION BY {key_cols}) AS BIGINT) AS tot_w,
         {u} AS u
  FROM weighted
),
hit AS (
  SELECT *, row_number() OVER (PARTITION BY {key_cols} ORDER BY v ASC) AS rk
  FROM sel WHERE cum_w > CAST(floor(u * tot_w) AS BIGINT)
)
SELECT {key_cols}, v AS dp_q, n FROM hit WHERE rk = 1
"""


def sql_dp_count_histogram(
    table_sql: str,
    keys: list[str],
    h60_of,
    salt: str = "dp1",
    alpha: float = 0.9,
    trunc_k: int = 40,
) -> str:
    """DuckDB oracle: identical hash → identical u → identical bucket.
    ``h60_of`` is the caller's h60-as-SQL macro (queries_datapipe's)."""
    cums = geometric_cdf_thresholds(alpha, trunc_k)
    key_expr = "concat_ws('|', " + ", ".join(keys) + f", '{salt}')"
    u = f"({h60_of(key_expr)} / {TWO60!r})"
    noise = noise_expr_sql("u", cums)
    key_cols = ", ".join(keys)
    return f"""
WITH counts AS (
  SELECT {key_cols}, CAST(count(*) AS BIGINT) AS n_true,
         {u} AS u
  FROM {table_sql} GROUP BY {key_cols}
)
SELECT {key_cols}, n_true, {noise} AS k_noise,
       greatest(CAST(0 AS BIGINT), n_true + {noise}) AS n_dp
FROM counts
"""


def ldp_frequency(
    df: DataFrame,
    cat_col: str,
    id_col: str = "doc_id",
    p_num: int = 3,
    p_den: int = 4,
    salt: str = "ldp1",
) -> DataFrame:
    """LOCAL-DP frequency estimation via k-ary randomized response —
    the other DP model: each ROW perturbs its own category before
    anything is aggregated (no trusted curator; the
    RAPPOR/Apple-style client-side mechanism), and the collector
    UNBIASES the observed counts:

        report = true category with prob p, else uniform over all k
        P(obs=c) = p·1[true=c] + (1−p)/k
        n_hat_c  = (obs_c − n·(1−p)/k) / p      (unbiased)
        eps      = ln((p + (1−p)/k) / ((1−p)/k))

    Same replayable-pseudo-DP contract as the central mechanisms above:
    the per-row draw is the keyed PRF u = h60(id‖salt)/2^60 (branch:
    keep if u < p, else category index floor(((u−p)/(1−p))·k) —
    u is uniform, so the rescaled remainder is uniform over [0,1)),
    reconstructible under the checked-in default salt; a real
    deployment draws client-side randomness.  The category index map
    is the SORTED distinct category list (dense row_number), identical
    in both engines.

    Scale shape: one distinct scan for the k-row category table
    (broadcast), a narrow per-row expression, one grouped count —
    the cost IS the count, like every release here."""
    from pyspark.sql import Window

    from sequin_spark.datapipe.sketch import h60

    p = p_num / p_den
    cats = (df.select(F.col(cat_col).alias("cat")).distinct()
            .withColumn("idx", F.row_number().over(
                Window.orderBy("cat")) - 1))
    k = F.sum(F.lit(1)).over(Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing))
    # k rows; read by the perturbation join AND the final unbiasing join
    # — checkpoint so the distinct scan runs once
    cats = _plan_ckpt(cats.withColumn("k", k.cast("long")))
    rows = (
        df.select(F.col(id_col).alias("_id"), F.col(cat_col).alias("cat"))
        .join(F.broadcast(cats), "cat")
        .withColumn("_u", h60(F.concat_ws("|", F.col("_id").cast("string"),
                                          F.lit(salt))) / F.lit(TWO60))
        .withColumn(
            "rep_idx",
            F.when(F.col("_u") < F.lit(p), F.col("idx")).otherwise(
                F.least(
                    F.col("k") - 1,
                    F.floor(((F.col("_u") - F.lit(p)) / F.lit(1.0 - p))
                            * F.col("k")).cast("long"))),
        )
    )
    # ONE corpus pass: the (true idx, reported idx) contingency table is
    # ≤ k² rows; observed and true histograms are its two marginals —
    # the previous shape aggregated `rows` twice (two full scans + two
    # perturbation-join evaluations).  Integer sums, exact either way.
    pair = (rows.groupBy("idx", "rep_idx")
            .agg(F.count(F.lit(1)).cast("long").alias("_c")))
    pair = _plan_ckpt(pair)
    obs = pair.groupBy("rep_idx").agg(
        F.sum("_c").cast("long").alias("n_obs"))
    true = pair.groupBy("idx").agg(
        F.sum("_c").cast("long").alias("n_true"))
    n_tot = F.sum("n_obs").over(Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing))
    return (
        # explicit broadcast: both marginals are ≤ k rows (category
        # cardinality) at any scale, but behind the checkpoint the
        # planner has no size estimate and would fall back to SMJ
        cats.join(F.broadcast(obs), cats.idx == obs.rep_idx, "left")
        .join(F.broadcast(true), "idx", "left")
        .withColumn("n_obs", F.coalesce("n_obs", F.lit(0).cast("long")))
        .withColumn("n_true", F.coalesce("n_true", F.lit(0).cast("long")))
        .withColumn("_n", n_tot)
        .select(
            F.col("cat"), F.col("idx").cast("int").alias("idx"),
            "n_true", "n_obs",
            F.round((F.col("n_obs")
                     - F.col("_n") * F.lit((1.0 - p)) / F.col("k"))
                    / F.lit(p), 2).alias("n_hat"),
        )
    )


def sql_ldp_frequency(
    table_sql: str,
    cat_col: str,
    h60_of,
    id_col: str = "doc_id",
    p_num: int = 3,
    p_den: int = 4,
    salt: str = "ldp1",
) -> str:
    """DuckDB twin: identical sorted-category index map, identical
    keyed-PRF branch and remainder rescale, identical unbiasing."""
    p = p_num / p_den
    key_expr = f"concat_ws('|', CAST({id_col} AS VARCHAR), '{salt}')"
    u = f"({h60_of(key_expr)} / {TWO60!r})"
    return f"""
WITH cats AS (
  SELECT cat, CAST(row_number() OVER (ORDER BY cat) - 1 AS BIGINT) AS idx
  FROM (SELECT DISTINCT {cat_col} AS cat FROM {table_sql})
),
kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM cats),
rows_ AS (
  SELECT c.idx,
         CASE WHEN {u} < {p!r}
              THEN c.idx
              ELSE least((SELECT k FROM kk) - 1,
                         CAST(floor((({u} - {p!r}) / {1.0 - p!r})
                                    * (SELECT k FROM kk)) AS BIGINT))
         END AS rep_idx
  FROM {table_sql} t JOIN cats c ON c.cat = t.{cat_col}
),
obs AS (SELECT rep_idx, CAST(count(*) AS BIGINT) AS n_obs
        FROM rows_ GROUP BY rep_idx),
tru AS (SELECT idx, CAST(count(*) AS BIGINT) AS n_true
        FROM rows_ GROUP BY idx),
tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM obs)
SELECT c.cat, CAST(c.idx AS INTEGER) AS idx,
       CAST(coalesce(t.n_true, 0) AS BIGINT) AS n_true,
       CAST(coalesce(o.n_obs, 0) AS BIGINT) AS n_obs,
       round((coalesce(o.n_obs, 0)
              - (SELECT n FROM tot) * {1.0 - p!r} / (SELECT k FROM kk))
             / {p!r}, 2) AS n_hat
FROM cats c
LEFT JOIN obs o ON o.rep_idx = c.idx
LEFT JOIN tru t ON t.idx = c.idx
"""
