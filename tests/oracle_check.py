"""Mini-driver: compare a Spark query result against its DuckDB oracle the
way the real driver does — row count, column names, and an order-insensitive
EXACT value comparison.

Floats are compared with ``==`` (NaN==NaN allowed), not allclose: the real
driver hashes exact values, and every rounded output column in this repo is
*designed* to be bit-identical across engines (the determinism contract).
The r4 `gap_quantiles` ULP bug passed a 1e-9-rtol allclose locally and died
at the driver — for gap values ~1e4 s, rtol alone tolerated ~1e-5.  Columns
that are documented as approximate must be registered in ``APPROX_COLS``
(query name -> set of column names); only those get allclose."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    sort_cols = [c for c in df.columns if not pd.api.types.is_float_dtype(df[c])]
    return df.sort_values(by=sort_cols or list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


# query name -> column names allowed an allclose comparison instead of ==.
# Empty on purpose: every current output column is covered by the exact
# determinism contract.  Register here ONLY with a docstring-documented
# reason at the operator site.
APPROX_COLS: dict[str, set] = {}


def compare(
    spark_df, oracle_pdf: pd.DataFrame, name: str = "query"
) -> None:
    approx = APPROX_COLS.get(name, set())
    got = _normalize(spark_df.toPandas())
    want = _normalize(oracle_pdf)
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns differ: {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            ga = g.astype("float64").to_numpy()
            wa = w.astype("float64").to_numpy()
            nan_mask = np.isnan(ga) | np.isnan(wa)
            both_nan = np.isnan(ga) & np.isnan(wa)
            if c in approx:
                ok = both_nan | np.isclose(
                    ga, wa, rtol=1e-9, atol=1e-9, equal_nan=True
                )
            else:
                # the driver's bar: bit-identical values (NaN==NaN ok)
                ok = np.where(nan_mask, both_nan, ga == wa)
            assert ok.all(), (
                f"{name}.{c}: {int((~ok).sum())} value mismatches "
                f"({'allclose' if c in approx else 'exact'}), first at "
                f"{np.argmin(ok)}: {ga[np.argmin(ok)]!r} vs {wa[np.argmin(ok)]!r}"
            )
        else:
            gn = g.where(pd.notna(g), None)
            wn = w.where(pd.notna(w), None)
            neq = [
                i
                for i, (a, b) in enumerate(zip(gn, wn))
                if not (a == b or (a is None and b is None))
            ]
            assert not neq, (
                f"{name}.{c}: {len(neq)} mismatches, first at row {neq[0]}: "
                f"{gn.iloc[neq[0]]!r} vs {wn.iloc[neq[0]]!r}"
            )


def check(spark, name: str, sf_dir: str) -> None:
    import __spark_entry__ as e

    q = e.queries()[name]
    sql = e.oracle_sql()[name]
    compare(q(spark, sf_dir), run_oracle(sql, sf_dir), name)


def _isnan(x) -> bool:
    return isinstance(x, float) and math.isnan(x)
