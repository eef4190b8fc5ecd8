"""Shared oracle-parity comparison, mimicking the driver's DuckDB check:
row count + schema (column names) + order-insensitive exact value match."""

from __future__ import annotations

import math

import pandas as pd


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        return repr(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return repr(v)


def normalize(pdf: pd.DataFrame) -> list[tuple]:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    out = []
    for row in pdf.itertuples(index=False):
        out.append(tuple(_norm_cell(v) for v in row))
    out.sort()
    return out


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = parity)."""
    errs: list[str] = []
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        errs.append(f"{name}: column mismatch spark={s_cols} duck={d_cols}")
        return errs
    if len(spark_pdf) != len(duck_pdf):
        errs.append(f"{name}: row count spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s_rows, d_rows = normalize(spark_pdf), normalize(duck_pdf)
    if s_rows != d_rows:
        diff_s = [r for r in s_rows if r not in set(d_rows)][:3]
        diff_d = [r for r in d_rows if r not in set(s_rows)][:3]
        errs.append(
            f"{name}: value mismatch; spark-only(3)={diff_s} duck-only(3)={diff_d}"
        )
    return errs
