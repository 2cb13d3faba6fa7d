from __future__ import annotations

import shutil
import tempfile

import pytest

from nixiesearch_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("nixiesearch-tests", cores=4, shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture()
def tmp_index():
    d = tempfile.mkdtemp(prefix="nsidx_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


# The reference's smallest fixture (MatchQueryTest.scala: docs 1/2/3,
# query "pajama" must return exactly ["3"])
TINY_DOCS = [
    ("1", "red dress"),
    ("2", "white dress"),
    ("3", "red pajama"),
]


@pytest.fixture(scope="session")
def tiny_corpus_pd():
    from nixiesearch_spark.corpus import make_corpus

    return make_corpus(300, seed=42)
