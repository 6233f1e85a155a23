"""BPE tokenizer: Spark-iterative training vs a pure-Python reference
implementation (the engine-vs-simulator pattern), encoder properties,
and partition invariance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from notjusthtml_searchengine_spark.operators.bpe import (
    bpe_encode,
    bpe_train,
    word_freqs,
)

CORPUS = [
    "low low low lower lower",
    "newest newest newest newest",
    "widest widest newest low",
]


def _py_reference_train(texts: list[str], n_merges: int, min_pair_freq: int = 2):
    """Straight Sennrich word-frequency BPE, independent of Spark."""
    freqs: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            freqs[w] = freqs.get(w, 0) + 1
    vocab = {tuple(w): f for w, f in freqs.items()}
    merges = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = pairs.get((syms[i], syms[i + 1]), 0) + f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if best[1] < min_pair_freq:
            break
        (a, b) = best[0]
        merges.append((a, b))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )


def test_train_matches_python_reference(spark, docs):
    got = bpe_train(docs, n_merges=8)
    want = _py_reference_train(CORPUS, n_merges=8)
    assert got == want, (got, want)
    # the classic first merges on this corpus: 'e','s' (freq in
    # newest×5 + widest×2 = 7) then 'es','t'
    assert got[0] == ("e", "s")
    assert got[1] == ("es", "t")


def test_train_early_stop(spark):
    """All-distinct single-char words → no pair reaches min freq."""
    d = spark.createDataFrame([(0, "a b c d")], "doc_id long, text string")
    assert bpe_train(d, n_merges=5) == []


def test_word_freqs_one_pass(spark, docs):
    wf = {r["word"]: r["freq"] for r in word_freqs(docs).collect()}
    assert wf["low"] == 4 and wf["newest"] == 5 and wf["lower"] == 2


def test_encode_properties(spark, docs):
    merges = bpe_train(docs, n_merges=6)
    enc = bpe_encode(docs, merges).collect()
    for r in enc:
        # tokens re-concatenate to the original words
        assert "".join(r["tokens"]) == r["text"].replace(" ", "")
        assert r["n_tokens"] == len(r["tokens"])
    # zero merges = character tokenization
    enc0 = bpe_encode(docs, []).collect()
    for r in enc0:
        assert r["n_tokens"] == len(r["text"].replace(" ", ""))
    # more merges never increases the token count
    n6 = {r["doc_id"]: r["n_tokens"] for r in enc}
    n2 = {
        r["doc_id"]: r["n_tokens"] for r in bpe_encode(docs, merges[:2]).collect()
    }
    assert all(n6[d] <= n2[d] for d in n6)


def test_train_partition_invariant(spark, docs):
    assert bpe_train(docs.repartition(7), n_merges=6) == bpe_train(
        docs, n_merges=6
    )


def test_train_on_sf_documents(spark):
    """Trains on the real documents table and agrees with the Python
    reference over the same rows (the query-path configuration)."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("doc_id") < 50)
        .select("doc_id", "text")
    )
    texts = [r["text"] for r in docs.collect()]
    got = bpe_train(docs, n_merges=10)
    want = _py_reference_train(texts, n_merges=10)
    assert got == want
    assert len(got) == 10


def test_local_trainer_matches_reference():
    """bpe_train_local (incremental pair counts) == the O(V)-per-merge
    straight reference on the same (word, freq) table."""
    from notjusthtml_searchengine_spark.operators.bpe import bpe_train_local

    freqs: dict[str, int] = {}
    for t in CORPUS:
        for w in t.split():
            freqs[w] = freqs.get(w, 0) + 1
    got = bpe_train_local(sorted(freqs.items()), n_merges=12)
    want = _py_reference_train(CORPUS, n_merges=12)
    assert got == want, (got, want)


def test_sampled_trainer_one_job_identical(spark, docs):
    """r4 verdict #6: the production trainer collects the (word,freq)
    table ONCE and learns every merge locally — at fraction=1.0 the
    merge list is identical to both the Spark-iterative trainer and
    the pure-Python reference, with ONE Spark job for any merge
    count (vs one per merge)."""
    from notjusthtml_searchengine_spark.operators.bpe import bpe_train_sampled

    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    got = bpe_train_sampled(docs, n_merges=12)
    after = len(tracker.getJobIdsForGroup(None) or [])
    want = _py_reference_train(CORPUS, n_merges=12)
    assert got == want, (got, want)
    assert after - before <= 2, "sampled trainer must not scale jobs with merges"


def test_sampled_trainer_256_merges_on_sf_corpus(spark):
    """256 merges on the sf0.01 documents corpus in ONE collect job —
    identical to the pure-Python reference over the same rows (the
    'bounded jobs, ≪1 job/merge' bar from the r4 verdict)."""
    from notjusthtml_searchengine_spark.operators.bpe import bpe_train_sampled

    docs = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .filter(F.col("doc_id") < 400)
        .select("doc_id", "text")
    )
    texts = [r["text"] for r in docs.collect()]
    got = bpe_train_sampled(docs, n_merges=256)
    want = _py_reference_train(texts, n_merges=256)
    assert got == want
    assert len(got) > 64  # the corpus genuinely supports deep merges


def test_sampled_trainer_truncation_and_fraction(spark, docs):
    """max_words keeps the top-frequency words; fraction hash-samples
    distinct words — both produce deterministic merge lists."""
    from notjusthtml_searchengine_spark.operators.bpe import bpe_train_sampled

    a = bpe_train_sampled(docs, n_merges=6, max_words=3)
    b = bpe_train_sampled(docs, n_merges=6, max_words=3)
    assert a == b and len(a) > 0
    c = bpe_train_sampled(docs, n_merges=6, fraction=0.5)
    d = bpe_train_sampled(docs, n_merges=6, fraction=0.5)
    assert c == d
