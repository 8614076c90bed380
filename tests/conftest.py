import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucene_solr_1_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tiny_corpus_pdf():
    from lucene_solr_1_spark.corpus import make_corpus_pandas

    return make_corpus_pandas(64)


@pytest.fixture(scope="session")
def small_corpus_pdf():
    from lucene_solr_1_spark.corpus import make_corpus_pandas

    return make_corpus_pandas(600)
