"""DSIR-style data selection with importance resampling weights
(Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling"): score every raw-corpus document by how target-like it
is under the log-ratio of two hashed-feature unigram models — one
estimated on a (small) target corpus, one on the raw background — and
keep the top of the distribution.

Features are HASHED token buckets (the paper's hashed n-gram trick):
the model is a fixed ``n_buckets``-row count table regardless of
vocabulary size, so both "training" passes are bounded groupBys and
the scorer is one broadcast join.

  w(doc) = Σ_tok [ ln p_t(bucket(tok)) − ln p_b(bucket(tok)) ]

with add-one smoothing over the bucket space:
``p(b) = (c(b) + 1) / (total + n_buckets)``.

In-corpus-background simplification (deliberate, r5-pinned): the
background bucket counts are estimated over the FULL input —
including the target rows — where Xie et al. hold the raw background
separate. With a target slice that is a small fraction of the corpus
this damps every weight by the same near-constant factor and leaves
the ranking (what selection consumes) essentially unchanged; the
oracle pins this exact formulation, so it is documented rather than
changed. The portable md5 bucket
hash and a final ``round(w, round_to)`` make the whole train→score
path re-derivable in DuckDB exactly (same 1-2-ulp ln/round trick as
lm.perplexity and bm25_scores).

Scale shape (100 TB raw corpus): the background model is one
explode + groupBy(bucket) with map-side combine into ≤ n_buckets
rows; the target model is the same over the (much smaller) target
subset; scoring joins the exploded corpus onto the broadcast
count table and aggregates per doc — one shuffle on doc id. No
Python anywhere; the models never leave the cluster as one lazy plan
(the count tables enter as broadcast aggregates, not collected
driver state).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textops import portable_hash64, tokens


def _bucket(tok: Column, n_buckets: int) -> Column:
    return F.pmod(portable_hash64(tok), F.lit(n_buckets))


def dsir_weights(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    is_target_col: str = "is_target",
    n_buckets: int = 4096,
    round_to: int = 4,
) -> DataFrame:
    """(id, n_tokens, weight) — importance log-weight per document.

    ``is_target_col`` marks the rows that define the target
    distribution (e.g. a curated high-quality slice); every row is
    scored, including the target rows themselves.
    """
    toks = docs.select(
        F.col(id_col),
        F.col(is_target_col).cast("int").alias("_tgt"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("_tok"),
    ).withColumn("_b", _bucket(F.col("_tok"), n_buckets))

    counts = toks.groupBy("_b").agg(
        F.count(F.lit(1)).alias("_cb"),
        F.sum("_tgt").alias("_ct"),
    )
    totals = counts.agg(
        F.sum("_cb").alias("_nb"), F.sum("_ct").alias("_nt")
    )
    model = counts.crossJoin(F.broadcast(totals)).select(
        "_b",
        (
            F.log((F.col("_ct") + 1).cast("double"))
            - F.log((F.col("_nt") + n_buckets).cast("double"))
            - F.log((F.col("_cb") + 1).cast("double"))
            + F.log((F.col("_nb") + n_buckets).cast("double"))
        ).alias("_lw"),
    )
    return (
        toks.join(F.broadcast(model), "_b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("_lw"), round_to).alias("weight"),
        )
    )
