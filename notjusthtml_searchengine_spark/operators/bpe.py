"""Byte-pair-encoding tokenizer: corpus-scale TRAINING as an
iterative Spark aggregation, plus an Arrow-batched encoder.

A training-data pipeline tokenizes its corpus with a tokenizer
trained ON that corpus; textops.py's regex token counts approximate
the result, this module computes the real thing (Sennrich et al.,
"Neural Machine Translation of Rare Words with Subword Units",
ACL'16 — the classic word-frequency formulation).

Training shape (the part that must scale):
  * the corpus collapses ONCE into a (word, freq) table — the only
    pass over the raw text; everything after is proportional to the
    VOCABULARY, not the corpus (the classic trick that makes BPE
    training tractable at 100 TB: 10^11 tokens → 10^7 distinct
    words).
  * PRODUCTION path (``bpe_train_sampled``): the (word, freq) table —
    optionally hash-sampled and/or frequency-truncated to a driver-
    safe size — is collected ONCE and the merges are learned locally
    with incrementally-maintained pair counts: ONE Spark job total
    for any vocabulary size, zero driver round-trips per merge. This
    is how real tokenizer trainers work at corpus scale (the trainer
    state is O(vocabulary), never O(corpus)); at fraction=1.0 /
    max_words=None the result is bit-identical to the exact trainer.
  * EXACT distributed path (``bpe_train``): each merge round is one
    explode+groupBy over the vocabulary (adjacent symbol pairs
    weighted by word freq) and one driver-side argmax. n_merges
    scalar actions total — fine for modest merge counts, but a real
    32k-merge vocab = 32k Spark jobs; use the sampled trainer there.
  * in the exact path the merge is applied to the symbol arrays with
    a JVM ``aggregate`` fold (left-to-right, non-overlapping — the
    reference greedy application), no Python in the loop; the
    vocabulary frame is localCheckpoint'ed per round so the plan
    never grows.

Encoding is a pandas UDF (the per-word merge loop is irregular —
exactly the U1-kernel shape), vectorized over Arrow batches with a
per-batch word cache: encode cost is per DISTINCT word.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus pass → (word, freq). Whitespace tokenization to
    match textops.token_count_ws."""
    return (
        docs.select(
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word")
        )
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _apply_merge(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right non-overlapping replacement of the
    adjacent pair (a,b) by their concatenation, as a JVM aggregate
    fold over the symbol array (whole-stage codegen, no Python)."""
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("prev"),
    )

    def step(acc, x):
        take = (acc["prev"] == F.lit(a)) & (x == F.lit(b))
        return F.struct(
            F.when(take, F.concat(acc["out"], F.array(F.lit(a + b))))
            .when(acc["prev"].isNull(), acc["out"])
            .otherwise(F.concat(acc["out"], F.array(acc["prev"])))
            .alias("out"),
            F.when(take, F.lit(None).cast("string")).otherwise(x).alias("prev"),
        )

    def finish(acc):
        return F.when(
            acc["prev"].isNull(), acc["out"]
        ).otherwise(F.concat(acc["out"], F.array(acc["prev"])))

    return F.aggregate(syms, init, step, finish)


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_freq: int = 2,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` merges from the corpus; returns them
    in rank order. Deterministic: argmax ties break lexicographically
    on (left, right). Stops early when no pair reaches
    ``min_pair_freq``."""
    vocab = word_freqs(docs, text_col).select(
        "freq", F.split("word", "").alias("syms")
    )
    vocab = vocab.localCheckpoint()
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        n = F.size("syms")
        pairs = (
            vocab.select(
                "freq",
                F.explode(
                    F.arrays_zip(
                        F.slice("syms", 1, n - 1).alias("a"),
                        F.slice("syms", 2, n - 1).alias("b"),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("f"))
            .orderBy(F.desc("f"), F.asc("a"), F.asc("b"))
        )
        top = pairs.first()  # the per-round trainer action
        if top is None or top["f"] < min_pair_freq:
            break
        a, b = top["a"], top["b"]
        merges.append((a, b))
        vocab = vocab.select(
            "freq", _apply_merge(F.col("syms"), a, b).alias("syms")
        ).localCheckpoint()  # barrier + lineage cut per round
    return merges


def bpe_train_local(
    word_freq: list[tuple[str, int]],
    n_merges: int,
    min_pair_freq: int = 2,
) -> list[tuple[str, str]]:
    """Exact BPE training over an in-memory (word, freq) table with
    INCREMENTALLY maintained pair counts — the per-merge cost is
    proportional to the words containing the merged pair, not the
    vocabulary. Same argmax + (f desc, a, b) tie-break as
    ``bpe_train``; at the same input the merge lists are identical
    (pinned by test_bpe)."""
    words: list[list[str]] = [list(w) for w, _ in word_freq]
    freqs: list[int] = [f for _, f in word_freq]

    def pairs_of(syms: list[str]) -> dict[tuple[str, str], int]:
        out: dict[tuple[str, str], int] = {}
        for a, b in zip(syms, syms[1:]):
            out[(a, b)] = out.get((a, b), 0) + 1
        return out

    counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for i, syms in enumerate(words):
        for p, c in pairs_of(syms).items():
            counts[p] = counts.get(p, 0) + c * freqs[i]
            where.setdefault(p, set()).add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = None
        best_f = min_pair_freq - 1
        for p, f in counts.items():
            if f > best_f or (f == best_f and best is not None and p < best):
                best, best_f = p, f
        if best is None:
            break
        a, b = best
        merges.append(best)
        for i in sorted(where.get(best, ())):
            syms = words[i]
            old = pairs_of(syms)
            # greedy left-to-right non-overlapping replacement
            out: list[str] = []
            j = 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
            new = pairs_of(out)
            for p in old.keys() | new.keys():
                d = new.get(p, 0) - old.get(p, 0)
                if d:
                    c = counts.get(p, 0) + d * freqs[i]
                    if c > 0:
                        counts[p] = c
                    else:
                        counts.pop(p, None)
                if new.get(p, 0):
                    where.setdefault(p, set()).add(i)
                elif p in where:
                    where[p].discard(i)
    return merges


def bpe_train_sampled(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_freq: int = 2,
    fraction: float = 1.0,
    max_words: int | None = None,
) -> list[tuple[str, str]]:
    """Corpus-scale trainer: ONE Spark job for any merge count.

    The (word, freq) table is reduced to a driver-safe size —
    ``fraction`` keeps a deterministic hash-sample of DISTINCT words
    (per-word frequencies stay exact, so expected pair counts scale
    uniformly and the argmax sequence is preserved in expectation),
    and/or ``max_words`` keeps the top words by (freq desc, word)
    (what production tokenizer trainers do) — then collected once and
    trained locally with incremental pair counts. At fraction=1.0 and
    max_words=None this is EXACTLY ``bpe_train`` (one job instead of
    one per merge). Sizing rule at 100 TB: 10^11 tokens ≈ 10^7-10^8
    distinct words; fraction/max_words should bound the collect at
    ~10^6-10^7 rows (a few hundred MB of driver heap)."""
    from .sampling import _BUCKETS, split_bucket

    wf = word_freqs(docs, text_col)
    if fraction < 1.0:
        wf = wf.filter(split_bucket(F.col("word")) < int(fraction * _BUCKETS))
    if max_words is not None:
        wf = wf.orderBy(F.desc("freq"), F.asc("word")).limit(max_words)
    rows = wf.collect()  # THE one job
    pairs = sorted(((r["word"], int(r["freq"])) for r in rows))
    return bpe_train_local(pairs, n_merges, min_pair_freq)


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Reference BPE application: repeatedly merge the LOWEST-rank
    pair present (Sennrich's algorithm)."""
    syms = list(word)
    while len(syms) > 1:
        best = None
        best_rank = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        # merge ALL non-overlapping occurrences of that pair
        a, b = syms[best], syms[best + 1]
        out = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode(
    df: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """Adds ``tokens`` (array<string>) and ``n_tokens`` columns — one
    Arrow-batched Python stage with a per-batch distinct-word cache."""
    import pandas as pd

    ranks = {pair: i for i, pair in enumerate(merges)}

    def gen(batches):
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            toks = []
            for text in pdf["_text"]:
                out: list[str] = []
                for w in (text or "").split():
                    got = cache.get(w)
                    if got is None:
                        got = cache[w] = _encode_word(w, ranks)
                    out.extend(got)
                toks.append(out)
            pdf = pdf.drop(columns=["_text"])
            pdf["tokens"] = toks
            pdf["n_tokens"] = [len(t) for t in toks]
            yield pdf

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    out_schema = f"{schema}, tokens array<string>, n_tokens int"
    return df.withColumn("_text", F.col(text_col)).mapInPandas(gen, out_schema)
