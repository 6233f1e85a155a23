"""Corpus-trained bigram language model + per-document perplexity.

The CCNet-style quality signal (Wenzek et al. 2020 train a KenLM and
keep the low-perplexity tail; Gopher/FineWeb use the same shape):
score every document by how predictable its text is under a language
model trained on the corpus itself — boilerplate and gibberish both
land in the high-perplexity head. A bigram model with add-k smoothing
is deliberately chosen over a neural scorer: it trains in two
aggregations, scores with two joins, and is EXACTLY reproducible in
DuckDB, so the whole train→score path is oracle-checkable end-to-end
(ln/exp agree with the JVM within 1-2 ulp; rounding to 4 places makes
the cross-engine hash stable — the same trick as bm25_scores).

Model: vocabulary = tokens with corpus frequency >= ``min_count``,
everything else mapped to '<unk>'; each doc is prefixed with '<s>' so
the first word is conditioned too.

  P(w2 | w1) = (c(w1 w2) + alpha) / (c(w1 ·) + alpha * V)

with c(w1 ·) the count of w1 AS BIGRAM CONTEXT and V = |vocab| + 2
('<unk>', '<s>'). Per doc: nll = -mean ln P over its bigrams,
ppl = exp(nll).

Scale shape (100 TB corpus):
  * training = one map-side explode + two groupBy(token[, token])
    aggregations with map-side partial combine — the count tables are
    the model; they are bounded by the realized bigram vocabulary
    (min_count prunes the unigram tail, which also collapses the
    bigram tail through '<unk>');
  * scoring = per-doc bigram explode, two hash joins keyed on the
    bigram/context token (broadcast when the model is small, shuffle
    hash join otherwise — Spark picks from sizes), one groupBy(doc);
  * V enters the plan as a broadcast one-row aggregate crossJoin, so
    the whole train+score pipeline is ONE lazy plan with no driver
    action and no collected model.

Everything is built-in expressions — no Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textops import tokens

UNK = "<unk>"
BOS = "<s>"


def _doc_tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, _tk): lowercased whitespace tokens with the BOS prefix."""
    return docs.select(
        F.col(id_col),
        F.concat(
            F.array(F.lit(BOS)), tokens(F.lower(F.col(text_col)))
        ).alias("_tk"),
    )


def _mapped_tokens(
    toks: DataFrame, vocab: DataFrame, id_col: str
) -> DataFrame:
    """(id, _tk) with out-of-vocabulary tokens replaced by '<unk>':
    posexplode → broadcast vocab left-semi mapping → re-assemble in
    position order (one groupBy keyed on the doc id; per-group size =
    doc length, the same bound every per-doc operator here has)."""
    pos = toks.select(
        id_col, F.posexplode("_tk").alias("_pos", "_w")
    )
    mapped = pos.join(
        F.broadcast(vocab.withColumnRenamed("token", "_w")), "_w", "left"
    ).select(
        id_col,
        "_pos",
        F.when(
            F.col("_in_vocab").isNotNull() | (F.col("_w") == BOS), F.col("_w")
        )
        .otherwise(F.lit(UNK))
        .alias("_w"),
    )
    return mapped.groupBy(id_col).agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("_pos", "_w"))),
            lambda s: s["_w"],
        ).alias("_tk")
    )


def _bigrams(toks: DataFrame, id_col: str) -> DataFrame:
    """(id, w1, w2) — one row per in-doc bigram occurrence."""
    pairs = F.zip_with(
        F.slice(F.col("_tk"), 1, F.greatest(F.size("_tk") - 1, F.lit(0))),
        F.slice(
            F.col("_tk"), 2, F.greatest(F.size("_tk") - 1, F.lit(0))
        ),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return toks.select(id_col, F.explode(pairs).alias("_bg")).select(
        id_col, F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2")
    )


def train_vocab(
    docs: DataFrame, id_col: str, text_col: str, min_count: int
) -> DataFrame:
    """(token, _in_vocab): tokens with corpus frequency >= min_count."""
    return (
        docs.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .filter(F.col("_cnt") >= min_count)
        .select("token", F.lit(True).alias("_in_vocab"))
    )


def perplexity(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
    alpha: float = 0.1,
) -> DataFrame:
    """Train the bigram model on ``docs`` and score every doc.

    Output: (id, n_bigrams, nll, ppl) with nll rounded to 4 places and
    ppl to 2 (cross-engine float parity). Empty docs score nll=0,
    ppl=1 (their only bigram is none at all: the BOS-only token list
    yields zero bigrams).
    """
    vocab = train_vocab(docs, id_col, text_col, min_count)
    toks = _mapped_tokens(_doc_tokens(docs, id_col, text_col), vocab, id_col)
    bg = _bigrams(toks, id_col)

    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("_c12"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("_c1"))
    # V = |vocab| + <unk> + <s>, as a broadcast one-row aggregate so
    # the plan stays lazy (no driver action, no collected model)
    vsize = F.broadcast(vocab.agg((F.count(F.lit(1)) + 2).alias("_V")))

    scored = (
        bg.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(vsize)
        .select(
            id_col,
            (
                F.log(
                    (F.col("_c12") + F.lit(alpha))
                    / (F.col("_c1") + F.lit(alpha) * F.col("_V"))
                )
            ).alias("_lp"),
        )
    )
    stats = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (-F.avg("_lp")).alias("_nll"),
    )
    return (
        docs.select(id_col)
        .join(stats, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
            F.round(F.coalesce("_nll", F.lit(0.0)), 4).alias("nll"),
            F.round(F.exp(F.coalesce("_nll", F.lit(0.0))), 2).alias("ppl"),
        )
    )
