from __future__ import annotations

import os

import pytest

from notjusthtml_searchengine_spark.session import get_spark
from notjusthtml_searchengine_spark.sources.corpus import build_corpus, write_corpus


@pytest.fixture(scope="session")
def spark():
    # default bounded by the machine so small CI hosts aren't
    # oversubscribed (ADVICE r5); SPARK_GRAFT_TEST_CPUS still overrides
    cpus = os.environ.get(
        "SPARK_GRAFT_TEST_CPUS", str(min(os.cpu_count() or 4, 12))
    )
    s = get_spark(
        app_name="tests", master=f"local[{cpus}]", shuffle_partitions=8
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus():
    return build_corpus(n_pages=40, seed=42)


@pytest.fixture(scope="session")
def corpus_dir(corpus, tmp_path_factory):
    out = tmp_path_factory.mktemp("corpus")
    write_corpus(corpus, str(out))
    return str(out)
