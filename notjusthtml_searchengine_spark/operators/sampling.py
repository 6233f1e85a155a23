"""Deterministic sampling / splitting for training-data pipelines.

A training corpus needs reproducible train/val/test splits and
per-source balancing ("no domain may exceed N documents") that give
the SAME answer on every run, cluster size, and engine — so both
operators key on a portable content hash, not RNG:

  * ``split_by_hash`` — assign each row to a named split by a hash
    bucket of its key: stable under reruns, appends (old rows never
    change split — critical once a model has trained on them), and
    engine (the DuckDB oracle re-derives the same assignment).
  * ``stratified_cap`` — at most ``cap`` rows per stratum, chosen by
    hash order (not "first seen", which is nondeterministic under
    parallel scan). The per-stratum window is the same shape as the
    crawler's politeness cap (W2); skewed strata are bounded by
    definition of the operator.

Both are pure Catalyst expressions — no Python, no RNG state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .textops import portable_hash64

#: hash-space resolution for split fractions (1 bp = 0.01%)
_BUCKETS = 10_000


def split_bucket(key: Column) -> Column:
    """Stable bucket in [0, _BUCKETS) from the portable hash of the
    key's string form (portable: same value in DuckDB via md5)."""
    return F.pmod(portable_hash64(key.cast("string")), F.lit(_BUCKETS))


def split_by_hash(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    split_col: str = "split",
) -> DataFrame:
    """Adds ``split_col`` ∈ fractions.keys() by hash bucket ranges.

    Fractions must sum to ≤ 1.0 (any remainder is NULL — rows held
    out of every split). Assignment is by consecutive bucket ranges
    in the given dict order, so the mapping is part of the contract:
    pass an ordered dict."""
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    b = split_bucket(F.col(key_col))
    expr = F.lit(None).cast("string")
    lo = 0
    cases = []
    for name, frac in fractions.items():
        hi = lo + int(round(frac * _BUCKETS))
        cases.append((name, lo, hi))
        lo = hi
    for name, lo_, hi_ in reversed(cases):
        expr = F.when((b >= lo_) & (b < hi_), F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def stratified_cap(
    df: DataFrame,
    strata_col: str,
    cap: int,
    key_col: str,
    n_salts: int = 64,
) -> DataFrame:
    """At most ``cap`` rows per stratum, selected deterministically by
    (hash(key), key) order within the stratum.

    TWO-PHASE for skew safety: a single window partitioned by the
    stratum alone funnels EVERY row of a hot stratum through one task
    (a 10^9-document domain at 100 TB = one straggler reducer kept
    alive just to keep ``cap`` rows). Phase 1 takes the per-(stratum,
    salt) top-``cap`` — the salt is a deterministic hash of the key,
    so the hot stratum fans out over ``n_salts`` reducers and the
    phase-1 winners are a guaranteed superset of the global top-cap
    (any row in the stratum's global top-cap is in the top-cap of its
    own salt bucket). Phase 2 runs the original stratum window over
    the ≤ cap × n_salts survivors — bounded input per stratum by
    construction. Same (hash(key), key) order in both phases ⇒ the
    result is bit-identical to the single-window form (and to the
    DuckDB oracle)."""
    if cap < 1:
        raise ValueError("cap must be >= 1")
    order = (split_bucket(F.col(key_col)), F.col(key_col))
    salt = F.pmod(portable_hash64(F.col(key_col).cast("string")), F.lit(n_salts))
    w1 = Window.partitionBy(F.col(strata_col), F.col("_salt")).orderBy(*order)
    w2 = Window.partitionBy(strata_col).orderBy(*order)
    return (
        df.withColumn("_salt", salt)
        .withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= cap)
        .withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= cap)
        .drop("_rn", "_salt")
    )


def lang_temperature_sample(
    df: DataFrame,
    lang_col: str,
    key_col: str,
    alpha: float = 0.5,
    keep_col: str = "keep",
) -> DataFrame:
    """Multilingual temperature rebalancing (the mBERT / XLM-R /
    mT5 exponent-smoothing recipe): languages are sampled with
    probability ∝ p_l^alpha instead of their natural share p_l, which
    up-weights low-resource languages without flattening the mix.

    Per-language keep rate, anchored so the rarest language keeps
    everything::

        rate_l = (c_min / c_l) ** (1 - alpha)      (rate ∈ (0, 1])

    (alpha=1 reproduces the natural distribution; alpha=0 caps every
    language at the rarest one's count in expectation.) The keep
    decision is the same deterministic hash-bucket draw as
    ``split_by_hash`` — stable under reruns, appends, and cluster
    size, and re-derived exactly by the DuckDB oracle. alpha=0.5 (the
    default, and the common published setting) evaluates via sqrt —
    correctly-rounded IEEE in both engines, so even the float compare
    is bit-portable.

    Shape at scale: one groupBy to the per-language count dim
    (|langs| rows), a broadcast join back, and a pure projection —
    the corpus is scanned once and never shuffled.
    """
    from pyspark.sql.window import Window

    counts = df.groupBy(lang_col).agg(F.count(F.lit(1)).alias("_c"))
    c_min = F.min("_c").over(Window.partitionBy())
    exp = 1.0 - alpha
    ratio = c_min.cast("double") / F.col("_c").cast("double")
    if abs(exp - 0.5) < 1e-12:
        rate = F.sqrt(ratio)
    else:
        rate = F.pow(ratio, F.lit(exp))
    rates = counts.select(lang_col, rate.alias("_rate"))
    b = split_bucket(F.col(key_col))
    return (
        df.join(F.broadcast(rates), lang_col)
        .withColumn(keep_col, (b.cast("double") < F.col("_rate") * _BUCKETS).cast("int"))
        .drop("_rate")
    )
