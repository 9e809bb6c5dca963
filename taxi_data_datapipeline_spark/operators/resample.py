"""Resampling-based uncertainty estimation at corpus scale.

The reference package is named ``pivot_and_boostrap`` but contains no
resampling code (grep-verified; see SURVEY.md) — the bootstrap was the
intended next step of its pipeline. This module supplies that step in the
form that actually scales: **hash-bucketed delete-one-group jackknife**.

Why not the classic bootstrap? Naive bootstrap resamples the dataset B
times — B full passes (or a Poisson-weight trick that needs an RNG, which
breaks cross-engine reproducibility). The delete-one-bucket jackknife
needs ONE aggregation pass:

1. every row is hash-assigned to one of B buckets (deterministic and
   engine-independent: md5-prefix % B, the same portable-hash convention
   as the train/val/test splitter);
2. per-group-per-bucket partial counts: one shuffle;
3. replicate r = the estimate computed without bucket r — derivable from
   the partials; the jackknife variance comes out of integer moment sums
   (sum of c_r and c_r^2), so the final doubles are bit-identical on any
   engine evaluating the same formula.

This is the delete-d jackknife over random groups (Efron & Tibshirani,
"An Introduction to the Bootstrap", ch. 11; the bucketed form is how
BLB-style estimators shard work in distributed settings).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

Z95 = 1.959964  # two-sided 95% normal quantile, fixed for parity


def _portable_bucket(id_col: str, n_buckets: int) -> Column:
    """Deterministic bucket id reproducible in any engine with md5:
    first 8 hex chars of md5(id) as an int, mod B."""
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
    return F.pmod(h.cast("bigint"), F.lit(n_buckets))


def jackknife_count_ci(
    df: DataFrame,
    group_cols: Sequence[str],
    id_col: str,
    n_buckets: int = 20,
) -> DataFrame:
    """Per-group count with a jackknife standard error and 95% CI.

    Output columns: ``*group_cols``, ``n`` (exact count), ``se`` (delete-
    one-bucket jackknife standard error), ``ci_lo``/``ci_hi``. The floats
    are emitted UNROUNDED: every input moment is exact, so the IEEE double
    pipeline is bit-deterministic on any engine — whereas ROUND-on-double
    implementations differ by 1 ulp at exact rounding boundaries (observed
    Spark BigDecimal HALF_UP vs DuckDB float rounding on this very
    formula).

    The variance formula, from integer moments only (c_r = bucket counts,
    n = total, B = n_buckets):

        var_jack = (B-1)/B * sum_r (n_{-r} - mean(n_{-r}))^2
                 = (B-1)/B * sum_r (c_r - n/B)^2          [n_{-r} = n - c_r]
                 = (B-1)/B * (sum_c2 - n^2/B)

    evaluated in double with fixed association order.
    """
    gcols = [F.col(c) for c in group_cols]
    bucket = _portable_bucket(id_col, n_buckets)
    per_bucket = (
        df.select(*gcols, bucket.alias("_b"))
        .groupBy(*group_cols, "_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    b = float(n_buckets)
    agg = per_bucket.groupBy(*group_cols).agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.col("c")).alias("sum_c2"),
    )
    var_jack = ((b - 1) / b) * (
        F.col("sum_c2").cast("double") - F.col("n").cast("double") * F.col("n") / b
    )
    se = F.sqrt(var_jack)
    return agg.select(
        *group_cols,
        F.col("n"),
        se.alias("se"),
        (F.col("n") - Z95 * se).alias("ci_lo"),
        (F.col("n") + Z95 * se).alias("ci_hi"),
    )


def jackknife_sum_ci(
    df: DataFrame,
    group_cols: Sequence[str],
    id_col: str,
    value: Column,
    n_buckets: int = 20,
    scale: int = 2,
) -> DataFrame:
    """Per-group SUM with jackknife SE/CI — same construction with exact
    decimal partial sums so the moment sums are order-independent across
    engines.

    Precision bookkeeping (the part that actually bites). Two cross-engine
    float hazards were observed building this:

    * raw-moment cancellation: var = sum_s2 - total^2/B subtracts two huge
      near-equal numbers, amplifying any decimal->double conversion ulp by
      orders of magnitude;
    * decimal->double conversion itself: for scale > 0 DuckDB divides an
      int128 by 10^scale (two roundings) while the JVM converts the exact
      decimal in one correctly-rounded step — 1-2 ulp apart on >53-bit
      values, which hash differently.

    So the computation never converts a scaled decimal: per-bucket sums
    become integer cents (exact, fits int64 to ~9*10^16 cents), the
    variance uses centered deviations dev_r = B*s_r - total (small — no
    cancellation), and their squares are summed in scale-0 decimals (one
    operand widened to DECIMAL(19,0) so DuckDB multiplies in int128). The
    only decimal->double conversion is of a scale-0 value — one correctly
    rounded step in both engines. var = (B-1)/B^3 * E with E =
    sum(dev^2), algebraically equal to the usual (B-1)/B * sum((s_r -
    total/B)^2).
    """
    gcols = [F.col(c) for c in group_cols]
    bucket = _portable_bucket(id_col, n_buckets)
    cents = 10 ** scale
    per_bucket = (
        df.select(*gcols, bucket.alias("_b"), value.cast(f"decimal(18,{scale})").alias("_v"))
        .groupBy(*group_cols, "_b")
        .agg((F.sum("_v") * cents).cast("bigint").alias("sc"))
    )
    w = Window.partitionBy(*group_cols)
    d = per_bucket.withColumn("total_cents", F.sum("sc").over(w)).withColumn(
        "dev", F.lit(n_buckets) * F.col("sc") - F.col("total_cents")
    )
    agg = d.groupBy(*group_cols).agg(
        F.max("total_cents").alias("total_cents"),
        F.sum(
            F.col("dev").cast("decimal(15,0)") * F.col("dev").cast("decimal(19,0)")
        ).alias("e2"),
    )
    coef = (n_buckets - 1) / n_buckets**3
    total = agg["total_cents"].cast("double") / float(cents)
    se = F.sqrt(F.lit(coef) * F.col("e2").cast("double") / float(cents * cents))
    return agg.select(
        *group_cols,
        total.alias("total"),
        se.alias("se"),
        (total - Z95 * se).alias("ci_lo"),
        (total + Z95 * se).alias("ci_hi"),
    )
