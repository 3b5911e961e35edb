"""Distributed ordinary least squares via sufficient statistics — the
canonical "ML at 100 TB without an ML framework" shape: a single
map-side-combined aggregate reduces the corpus to the 10 sufficient
sums (n, Sx1, Sx2, Sy, Sx1x1, Sx1x2, Sx2x2, Sx1y, Sx2y, Syy) of the
normal equations, and the 3x3 solve is O(1) driver arithmetic via
explicit Cramer cofactors (NOT a LAPACK call — the driver oracle
mirrors the exact same algebraic formula, so the only cross-engine
noise is summation order, absorbed by output quantization).

Two predictors + intercept:  y ~ b0 + b1*x1 + b2*x2
  A = [[n,   Sx1,  Sx2 ],        c = [Sy, Sx1y, Sx2y]
       [Sx1, Sx11, Sx12],
       [Sx2, Sx12, Sx22]]
  b_i = det(A with column i replaced by c) / det(A)     (Cramer)
  R^2 = 1 - SSE / SST,  SSE = Syy - (b0*Sy + b1*Sx1y + b2*Sx2y),
        SST = Syy - Sy^2 / n

Singular / degenerate inputs (det == 0, n == 0, SST == 0) yield NULL
coefficients rather than a crash. The whole job is one shuffle-free
partial+final aggregate — the plan a 1000-executor cluster wants."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _cramer3(n, sx1, sx2, sy, sx11, sx12, sx22, sx1y, sx2y, syy):
    """Explicit 3x3 Cramer solve; returns (b0, b1, b2, r2) or Nones."""
    a11, a12, a13 = float(n), sx1, sx2
    a22, a23, a33 = sx11, sx12, sx22
    det = (
        a11 * (a22 * a33 - a23 * a23)
        - a12 * (a12 * a33 - a23 * a13)
        + a13 * (a12 * a23 - a22 * a13)
    )
    if n == 0 or det == 0.0:
        return None, None, None, None
    det0 = (
        sy * (a22 * a33 - a23 * a23)
        - a12 * (sx1y * a33 - a23 * sx2y)
        + a13 * (sx1y * a23 - a22 * sx2y)
    )
    det1 = (
        a11 * (sx1y * a33 - a23 * sx2y)
        - sy * (a12 * a33 - a23 * a13)
        + a13 * (a12 * sx2y - sx1y * a13)
    )
    det2 = (
        a11 * (a22 * sx2y - sx1y * a23)
        - a12 * (a12 * sx2y - sx1y * a13)
        + sy * (a12 * a23 - a22 * a13)
    )
    b0, b1, b2 = det0 / det, det1 / det, det2 / det
    sst = syy - sy * sy / n
    if sst == 0.0:
        return b0, b1, b2, None
    sse = syy - (b0 * sy + b1 * sx1y + b2 * sx2y)
    return b0, b1, b2, 1.0 - sse / sst


def ols_2feature(
    df: DataFrame, y_col: str, x1_col: str, x2_col: str
) -> DataFrame:
    """1-row (n, b0, b1, b2, r2) OLS fit of y ~ 1 + x1 + x2."""
    y, x1, x2 = (F.col(c).cast("double") for c in (y_col, x1_col, x2_col))
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(x1), F.lit(0.0)).alias("sx1"),
        F.coalesce(F.sum(x2), F.lit(0.0)).alias("sx2"),
        F.coalesce(F.sum(y), F.lit(0.0)).alias("sy"),
        F.coalesce(F.sum(x1 * x1), F.lit(0.0)).alias("sx11"),
        F.coalesce(F.sum(x1 * x2), F.lit(0.0)).alias("sx12"),
        F.coalesce(F.sum(x2 * x2), F.lit(0.0)).alias("sx22"),
        F.coalesce(F.sum(x1 * y), F.lit(0.0)).alias("sx1y"),
        F.coalesce(F.sum(x2 * y), F.lit(0.0)).alias("sx2y"),
        F.coalesce(F.sum(y * y), F.lit(0.0)).alias("syy"),
    ).collect()[0]
    b0, b1, b2, r2 = _cramer3(
        row["n"], row["sx1"], row["sx2"], row["sy"], row["sx11"],
        row["sx12"], row["sx22"], row["sx1y"], row["sx2y"], row["syy"],
    )
    spark = df.sparkSession
    return spark.createDataFrame(
        [(int(row["n"]), b0, b1, b2, r2)],
        "n long, b0 double, b1 double, b2 double, r2 double",
    )


def grouped_ols_slope(
    df: DataFrame, group_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Per-group simple linear regression y ~ a + b*x in CLOSED FORM —
    unlike :func:`ols_2feature` there is no driver step at all: the five
    sufficient sums and the slope/intercept/r2 algebra all live inside
    one map-side-combined groupBy, so fitting one line per group scales
    to millions of groups on a cluster (no window, no second shuffle).

        b  = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)
        a  = (Sy - b*Sx) / n
        r2 = (n*Sxy - Sx*Sy)^2 / ((n*Sxx - Sx^2) * (n*Syy - Sy^2))

    Groups with no x-variance (or n < 2) yield NULL slope; zero
    y-variance yields NULL r2."""
    x, y = F.col(x_col).cast("double"), F.col(y_col).cast("double")
    agg = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
        F.sum(y * y).alias("syy"),
    )
    dx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    slope = F.when(dx != 0, cov / dx)
    return agg.select(
        "grp",
        "n",
        slope.alias("slope"),
        F.when(dx != 0, (F.col("sy") - (cov / dx) * F.col("sx")) / F.col("n")).alias(
            "intercept"
        ),
        F.when((dx != 0) & (dy != 0), (cov * cov) / (dx * dy)).alias("r2"),
    )
