"""Deterministic sampling for training-data mixture construction.

A pre-training pipeline rarely trains on the whole crawl: it samples a
MIXTURE — per-source / per-language rates tuned to a token budget. Spark's
``df.sample`` is seed-deterministic only per partitioning, which breaks the
reproducibility contract every other operator here keeps (same input ->
byte-identical output at any parallelism). These samplers decide membership
from a per-ROW hash instead:

    keep(row)  <=>  h32(key || ':' || salt) % 1000 < rate_permille

so the sample is a pure function of the row key — partition-invariant,
resumable, and exactly reproducible in the DuckDB oracle through the same
md5-prefix hash contract (textquality.h32). Changing ``salt`` redraws the
sample; overlapping rates nest (rate 100 ⊂ rate 200 at the same salt — handy
for decimation ladders).

Scale shape: membership is a map-side predicate on hash bits — no shuffle,
no count pass, no driver-side rates fixup; stratified rates join in via one
tiny broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textquality import h32


def _bucket(key_col: str, salt: str) -> Column:
    return F.pmod(h32(F.concat(F.col(key_col).cast("string"), F.lit(":" + salt))), F.lit(1000))


def deterministic_sample(
    df: DataFrame,
    rate_permille: int,
    key_col: str = "doc_id",
    salt: str = "s0",
) -> DataFrame:
    """Keep ~rate_permille/1000 of rows, chosen by row-key hash."""
    return df.filter(_bucket(key_col, salt) < rate_permille)


def stratified_sample(
    df: DataFrame,
    rates_permille: dict[str, int],
    strata_col: str = "lang",
    default_permille: int = 0,
    key_col: str = "doc_id",
    salt: str = "s0",
) -> DataFrame:
    """Per-stratum hash sampling: stratum s keeps rates_permille[s]/1000 of
    its rows (``default_permille`` for unlisted strata). The rates table is
    a broadcast literal CASE — no join, no shuffle."""
    rate = F.lit(default_permille)
    for stratum, r in sorted(rates_permille.items()):
        rate = F.when(F.col(strata_col) == stratum, F.lit(int(r))).otherwise(rate)
    return df.filter(_bucket(key_col, salt) < rate)
