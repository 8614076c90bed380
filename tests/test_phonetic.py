"""PhoneticFilter(Soundex, inject=true) — commons-codec Soundex test
vectors, stream equivalence, query-side SynonymQuery conversion and
sounds-like recall end-to-end."""

import numpy as np
import pandas as pd
import pytest

from lucene_solr_1_spark.kernels.analyzer import (
    PHONETIC,
    AnalyzerConfig,
    analyze_series,
    flatten_tokens,
    tokenize_one,
)
from lucene_solr_1_spark.kernels.phonetic import phonetic_code, soundex


def test_soundex_vectors():
    # commons-codec SoundexTest vectors (upper-cased there; we lowercase)
    vectors = {
        "Robert": "r163", "Rupert": "r163", "Ashcraft": "a261",
        "Ashcroft": "a261", "Tymczak": "t522", "Pfister": "p236",
        "Williams": "w452", "Smith": "s530", "Smyth": "s530",
        "testing": "t235", "The": "t000", "quick": "q200",
        "brown": "b650", "fox": "f200", "jumped": "j513",
        "over": "o160", "lazy": "l200", "dogs": "d200",
    }
    for word, code in vectors.items():
        assert soundex(word) == code, (word, soundex(word), code)
    # H/W collapse rule (getMappingCode index-2 lookback)
    assert soundex("BOOTHDAVIS") == "b312"
    assert soundex("Sgler") == "s460"
    assert soundex("SWHGLER") == "s460"
    # no letters -> empty
    assert soundex("12345") == ""
    assert phonetic_code("12345") == ""
    # identical code suppressed (inject only when it adds a term)
    assert phonetic_code("t000") == ""


def test_inject_stream_and_positions():
    t, p = tokenize_one("smith works", PHONETIC)
    assert t == ["smith", "s530", "works", "w620"]
    assert p == [0, 0, 1, 1]  # codes stack at the token position
    # digits-only tokens emit no code
    t, p = tokenize_one("item 42", PHONETIC)
    assert t == ["item", "i350", "42"]
    assert p == [0, 0, 1]


def test_scalar_matches_vectorized():
    import random

    rng = random.Random(11)
    frag = ["smith", "smyth", "works", "42", "id_0042", "query", "merge",
            "the", "a", "x"]
    docs = [" ".join(rng.choice(frag) for _ in range(rng.randint(0, 8)))
            for _ in range(150)]
    s = pd.Series(docs)
    for cfg in (PHONETIC,
                AnalyzerConfig(phonetic="soundex", stem=True),
                AnalyzerConfig(phonetic="soundex",
                               stop_words=frozenset({"the", "a"}))):
        terms, rows, pos, dl = flatten_tokens(s, cfg)
        st, sr, sp = [], [], []
        sdl = np.zeros(len(s), dtype=np.int64)
        for i, text in enumerate(docs):
            tt, pp = tokenize_one(text, cfg)
            st.extend(tt)
            sr.extend([i] * len(tt))
            sp.extend(pp)
            sdl[i] = len(tt)
        assert list(terms) == st
        assert list(rows) == sr
        assert list(pos) == sp
        assert list(dl) == list(sdl)
        assert [x for lst in analyze_series(s, cfg) for x in lst] == st


def test_config_exclusivity():
    from lucene_solr_1_spark.kernels.worddelim import WD_DEFAULT

    with pytest.raises(ValueError):
        AnalyzerConfig(phonetic="soundex", word_delimiter=WD_DEFAULT)


def test_query_side_synonym_and_recall(spark, tmp_path_factory):
    """smyth finds smith: the searcher re-analyzes Term leaves into
    SynonymQuery(term, code) against a phonetic index."""
    from lucene_solr_1_spark.index.builder import build_index
    from lucene_solr_1_spark.search.query import Synonym, Term
    from lucene_solr_1_spark.search.searcher import LuceneSparkSearcher

    rows = [
        ("r", "p0", "c", "en", "mr smith wrote this"),
        ("r", "p1", "c", "en", "completely unrelated words"),
        ("r", "p2", "c", "en", "smyth also wrote things"),
    ]
    pdf = pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])
    d = str(tmp_path_factory.mktemp("idx_ph"))
    m = build_index(spark, spark.createDataFrame(pdf), d, num_segments=1,
                    cfg=PHONETIC)
    assert m["analyzer"] == "phonetic"
    s = LuceneSparkSearcher(spark, d)
    analyzed = s._analyze_query(Term("smyth"))
    assert analyzed == Synonym(("smyth", "s530"), field="content")
    hits = s.search(Term("smyth"), k=10, with_stored=False)
    assert len(hits) == 2  # both smith and smyth docs match by sound
    # exhaustive == WAND on the synonym plan over the injected index
    hw = s.search(Term("smyth"), k=10, use_wand=True, with_stored=False)
    he = s.search(Term("smyth"), k=10, use_wand=False, with_stored=False)
    assert hw["score"].tolist() == he["score"].tolist()
    assert hw["global_doc_id"].tolist() == he["global_doc_id"].tolist()
