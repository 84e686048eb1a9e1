"""Vectorized pandas-UDF surfaces (SURVEY.md §2.9).

Two of the four declared UDF surfaces of the engine live here — the two the
grouped-map/mapInPandas operators don't exercise:

- **scalar pandas_udf** (Series -> Series): the geodesic deg-per-km helper —
  the transcript analog of the reference's geopy destination-point scale
  math (/root/reference/tasks/geo_referencing/scale_analyzer.py:147-167 and
  geo_fencing.py:236-252: km offsets converted to degree offsets at the
  map's latitude).  Arrow-batched, no per-row Python.  This is also the
  engine's shape for the query-point datum shift
  (georeference.py:164-174: a deterministic scalar CRS transform applied
  after the join — same vectorized-transform-on-joined-rows surface).

- **grouped-agg pandas_udf**: exact per-group median / MAD over the
  centi-quantized signal (≈ the MAD residual statistic of OutlierFilter,
  outlier_filter.py:246-261, as a reusable aggregate).  numpy's
  interpolated median over int64 input is bit-identical to DuckDB's
  ``median``/``mad`` (verified: both average the two middle values in
  exact binary fractions).

Determinism discipline: the latitude→km table is CONSTANT-FOLDED in Python
(rounded to 6 decimals) and shared verbatim with the DuckDB oracle as a SQL
literal array, so both engines read the exact same doubles; the grouped
aggregates take integer input, so no accumulation-order sensitivity exists.

The UDF objects are constructed LAZILY (inside the operator functions):
``pandas_udf`` resolves its return type against the active SparkSession, so
module import must stay session-free (the oracle generator imports this
module for the shared table constant before any session exists).

Skew note: grouped-agg pandas UDFs pull one group per invocation — the
median/MAD aggregates therefore run over a pre-reduced per-conversation
(value, count) histogram (map-side-combined groupBy), so the buffer one
group ships through Arrow is bounded by the signal's centi-unit value
range, not by conversation length; a 10^12-turn corpus's hottest
conversation costs the same as a normal one.  (The cap/salt policy in
salt.py remains the lever for per-ROW grouped kernels like ransac_slope.)
"""

from __future__ import annotations

import math

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf

EARTH_KM_PER_DEG = 111.32  # equatorial km per degree, the reference's scale

# km per degree of LONGITUDE at integer latitude 0..89, rounded to 6 so the
# literal embedded in the oracle SQL parses to the identical double
KM_PER_DEG_LON = [
    round(EARTH_KM_PER_DEG * math.cos(math.radians(d)), 6) for d in range(90)
]


def _scalar_udfs():
    """Construct the scalar pandas UDF (needs an active session)."""

    @pandas_udf("double")
    def km_per_deg_lon_udf(lat_q: pd.Series) -> pd.Series:
        import numpy as np

        table = np.asarray(KM_PER_DEG_LON)
        idx = np.clip(lat_q.to_numpy(dtype="int64"), 0, 89)
        return pd.Series(table[idx])

    return km_per_deg_lon_udf


def _grouped_agg_udfs():
    """Construct the grouped-agg pandas UDF.

    The UDF consumes a per-group (value, count) HISTOGRAM, not the raw turn
    stream: the caller pre-reduces with a map-side-combined groupBy, so the
    Arrow buffer a group ships is bounded by the signal's centi-unit value
    RANGE, never by conversation length (a 10^8-turn hot conversation ships
    the same few-thousand-row histogram as a normal one).  The weighted
    median reproduces ``np.median`` over the expanded multiset exactly:
    mean of the elements at 0-based ranks (n-1)//2 and n//2 — halves of
    int64 values, bit-exact in double in both engines.

    ONE UDF returns all three statistics as array<double> [n, med, mad]
    instead of the former count/median/mad trio: grouped-agg evaluation
    invokes each UDF once per GROUP, so with 10^4+ groups the per-call
    Python dispatch (not the data volume) dominated — fusing cuts the call
    count 3x and stops recomputing the median inside the MAD.  The count
    crosses as a double but is exact (int64 counts << 2^53) and is cast
    back to long in the caller; med/mad are the same doubles the separate
    UDFs produced (identical _wmedian code path)."""
    import numpy as np

    def _wmedian(vals: "np.ndarray", cnts: "np.ndarray") -> float:
        order = np.argsort(vals, kind="stable")
        v = vals[order]
        cum = np.cumsum(cnts[order])
        n = int(cum[-1])
        lo = int(np.searchsorted(cum, (n - 1) // 2 + 1))
        hi = int(np.searchsorted(cum, n // 2 + 1))
        return (float(v[lo]) + float(v[hi])) / 2.0

    @pandas_udf("array<double>")
    def median_mad_udf(v: pd.Series, c: pd.Series) -> list:
        a = v.to_numpy(dtype="int64")
        w = c.to_numpy(dtype="int64")
        med = _wmedian(a, w)
        # deviations are multiples of 0.5 — exact; reuse the weighted
        # median over the (deviation, count) histogram
        return [float(int(w.sum())), med, _wmedian(np.abs(a - med), w)]

    return median_mad_udf


def geodesic_scale(df: DataFrame) -> DataFrame:
    """Per-turn geodesic scale features via the scalar pandas UDF: treat the
    turn's signal as a latitude, clamp to [0, 89], and emit the km-per-deg
    of longitude there plus the degree span of a 10 km east offset — the
    deg-per-km conversion of scale_analyzer.py:147-167.  ``hemi_sign`` adds
    the hemisphere sign logic (≈ calc_lonlat_slope_signs / sign,
    util.py:37-41,99-120): signum of the signal's offset from the fixture
    midline, as the N/S-hemisphere classifier."""
    km_per_deg_lon_udf = _scalar_udfs()
    lat_q = F.least(
        F.greatest(F.floor(F.col("signal")).cast("long"), F.lit(0)), F.lit(89)
    )
    hemi = F.signum(F.col("signal") - F.lit(50.0)).cast("int")
    out = df.select(
        "conv_id",
        "turn_idx",
        lat_q.alias("lat_q"),
        hemi.alias("hemi_sign"),
    ).withColumn("km_per_deg", km_per_deg_lon_udf(F.col("lat_q")))
    return out.select(
        "conv_id",
        "turn_idx",
        "lat_q",
        "hemi_sign",
        F.when(F.col("hemi_sign") >= 0, F.lit("N")).otherwise(F.lit("S")).alias(
            "hemisphere"
        ),
        "km_per_deg",
        F.round(F.lit(10.0) / F.col("km_per_deg"), 6).alias("deg_for_10km"),
    )


def datum_shift(df: DataFrame) -> DataFrame:
    """Query-point datum shift (georeference.py:164-174: a deterministic
    scalar CRS transform applied to query points AFTER the join with their
    matched map points): each tool turn joins its nearest user turn
    (operators/joins.nearest_join) and the tool's signal is shifted by a
    correction looked up — via the scalar pandas UDF — from the
    constant-folded table at the anchor's latitude.  Tool turns with no
    user anchor pass through unshifted (the reference keeps unshiftable
    points on the source datum).

    r6: the anchor's signal rides INSIDE the nearest-neighbour window
    structs (one tagged ffill/bfill pass — the nearest_join machinery with
    ``signal`` carried in the tagged struct) instead of re-joining the
    transcript twice on (conv, idx): same selected rows — turn_idx is
    unique per conversation, so looking the anchor up by index and reading
    its struct field are the same value — with the source subtree
    evaluated once instead of three times and both joins gone.  The
    scalar pandas UDF surface is unchanged."""
    from pyspark.sql import Window

    from uncharted_ta1_pipeline_spark.operators.windows import turn_order

    km_udf = _scalar_udfs()
    us = F.unix_micros(F.col("ts"))
    tagged = F.when(
        F.col("role") == "user",
        F.struct(F.col("turn_idx"), us.alias("us"), F.col("signal").alias("sig")),
    )
    w = turn_order()
    prev_u = F.last(tagged, ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    next_u = F.first(tagged, ignorenulls=True).over(
        w.rowsBetween(1, Window.unboundedFollowing)
    )
    d_prev = us - F.col("_prev.us")
    d_next = F.col("_next.us") - us
    pick = (
        F.when(F.col("_prev").isNull(), F.col("_next"))
        .when(F.col("_next").isNull(), F.col("_prev"))
        .when(d_next < d_prev, F.col("_next"))
        .otherwise(F.col("_prev"))  # tie -> earlier turn (nearest_join rule)
    )
    j = (
        df.withColumn("_prev", prev_u)
        .withColumn("_next", next_u)
        .filter(F.col("role") == "tool")
        .select(
            "conv_id",
            F.col("turn_idx").alias("tool_idx"),
            pick["turn_idx"].alias("nearest_user_idx"),
            F.col("signal").alias("_sig_t"),
            pick["sig"].alias("_sig_u"),
        )
    )
    lat_q = F.least(
        F.greatest(F.floor(F.col("_sig_u")).cast("long"), F.lit(0)), F.lit(89)
    )
    km = km_udf(F.coalesce(lat_q, F.lit(0)))
    shifted = F.round(
        F.when(
            F.col("_sig_u").isNull(), F.col("_sig_t")
        ).otherwise(F.col("_sig_t") + km / F.lit(111.32) - F.lit(1.0)),
        6,
    )
    return j.select(
        "conv_id", "tool_idx", "nearest_user_idx", shifted.alias("shifted_signal")
    )


def grouped_median_mad(df: DataFrame) -> DataFrame:
    """Per-conversation exact median/MAD of the centi-quantized signal via
    grouped-agg pandas UDFs over a pre-reduced (value, count) histogram —
    identical output to aggregating the raw stream, but the per-group
    Arrow buffer is bounded by the signal's value range, not conversation
    length (see _grouped_agg_udfs)."""
    median_mad_udf = _grouped_agg_udfs()
    yc = F.floor(F.col("signal") * 100 + F.lit(0.5)).cast("long")
    hist = (
        df.select("conv_id", yc.alias("_yc"))
        .groupBy("conv_id", "_yc")
        .agg(F.count(F.lit(1)).cast("long").alias("_cnt"))
    )
    g = hist.groupBy("conv_id").agg(
        median_mad_udf(F.col("_yc"), F.col("_cnt")).alias("_s")
    )
    return g.select(
        "conv_id",
        F.col("_s")[0].cast("long").alias("n"),
        F.round(F.col("_s")[1] / 100.0, 6).alias("median_signal"),
        F.round(F.col("_s")[2] / 100.0, 6).alias("mad_signal"),
    )
