"""Sequence packing for LM training: lay the tokenized corpus out as
one deterministic token stream and chunk it into fixed-length training
sequences (the GPT-style concat-then-chunk layout). Each document gets
its half-open token span [start, start+n) in the stream and the
sequence ids that span covers — the manifest a training data loader
needs to build input tensors without ever re-tokenizing.

Document order is (hash_bucket(key), key): content-defined, so the
layout is identical across reruns, engines, and cluster sizes —
NOT scan order, which is nondeterministic under parallelism.

Scale shape: the naive layout is a running sum over a single global
window — one task holding the whole corpus. This implementation is
the standard TWO-PHASE distributed prefix sum instead:

  phase 1  per-bucket token totals (one groupBy over ``_BUCKETS``
           hash buckets, map-side combined),
  phase 2  prefix-sum the bucket totals (a ``_BUCKETS``-row window —
           bounded state, broadcast back),
  phase 3  within-bucket running sum (window partitioned BY BUCKET —
           per-task state bounded by one bucket's rows) + the bucket's
           broadcast prefix.

Same result as the global window (the DuckDB oracle runs the naive
form), no single-reducer stage anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .sampling import split_bucket
from .textops import token_count


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per doc: (id, n_tokens, start_pos, first_seq,
    last_seq, offset_in_first). Zero-token docs occupy an empty span:
    first_seq = last_seq = the sequence their start position falls in
    (degenerate but total — the loader can skip them by n_tokens=0)."""
    if seq_len < 1:
        raise ValueError("seq_len must be >= 1")
    base = docs.select(
        F.col(id_col),
        split_bucket(F.col(id_col)).alias("_b"),
        token_count(F.col(text_col)).cast("bigint").alias("n_tokens"),
    )
    btot = base.groupBy("_b").agg(F.sum("n_tokens").alias("_bt"))
    wpre = (
        Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = btot.select(
        "_b", F.coalesce(F.sum("_bt").over(wpre), F.lit(0)).alias("_pre")
    )
    win = (
        Window.partitionBy("_b")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        base.join(F.broadcast(prefix), "_b")
        .withColumn(
            "start_pos",
            F.col("_pre") + F.coalesce(F.sum("n_tokens").over(win), F.lit(0)),
        )
        .select(
            F.col(id_col),
            "n_tokens",
            "start_pos",
            F.floor(F.col("start_pos") / seq_len).alias("first_seq"),
            F.floor(
                (F.col("start_pos") + F.greatest(F.col("n_tokens") - 1, F.lit(0)))
                / seq_len
            ).alias("last_seq"),
            (F.col("start_pos") % seq_len).alias("offset_in_first"),
        )
    )
    return out
