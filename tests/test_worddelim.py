"""WordDelimiterGraphFilter — goldens ported from the reference's
analysis/common test suite (TestWordDelimiterGraphFilter.java), the
scalar==vectorized stream equivalence fuzz, and index-level recall."""

import numpy as np
import pandas as pd
import pytest

from lucene_solr_1_spark.kernels.analyzer import (
    CODE,
    AnalyzerConfig,
    analyze_series,
    flatten_tokens,
    tokenize_one,
)
from lucene_solr_1_spark.kernels.worddelim import (
    CATENATE_ALL,
    CATENATE_NUMBERS,
    CATENATE_WORDS,
    GENERATE_NUMBER_PARTS,
    GENERATE_WORD_PARTS,
    PRESERVE_ORIGINAL,
    SPLIT_ON_CASE_CHANGE,
    SPLIT_ON_NUMERICS,
    STEM_ENGLISH_POSSESSIVE,
    WD_DEFAULT,
    wd_split,
)


def texts(tok, flags=WD_DEFAULT):
    return [p[0] for p in wd_split(tok, flags)[0]]


def test_splits_goldens():
    # TestWordDelimiterGraphFilter.testSplits / doSplit
    assert texts("basic-split") == ["basic", "split"]
    assert texts("camelCase") == ["camel", "Case"]
    assert texts("test's'") == ["test"]
    assert texts("Роберт") == ["Роберт"]
    assert texts("РобЕрт") == ["Роб", "Ерт"]
    assert texts("aǅungla") == ["aǅungla"]      # titlecase char: no split
    assert texts("हिन्दी") == ["हिन्दी"]          # combining marks: no split
    assert texts("١٢٣٤") == ["١٢٣٤"]            # non-ascii digits: no split
    # javadoc examples (WordDelimiterGraphFilter.java:40-64)
    assert texts("PowerShot") == ["Power", "Shot"]
    assert texts("SD500") == ["SD", "500"]
    assert texts("j2se") == ["j", "2", "se"]
    assert texts("O'Neil's") == ["O", "Neil"]
    # UPPER->letter never splits (isBreak:205-207)
    assert texts("USAToday") == ["USAToday"]
    assert texts("snake_case_id") == ["snake", "case", "id"]


def test_possessives_and_flags():
    # testPossessives
    assert texts("O'Neil's") == ["O", "Neil"]
    no_poss = WD_DEFAULT & ~STEM_ENGLISH_POSSESSIVE
    assert texts("O'Neil's", no_poss) == ["O", "Neil", "s"]
    # splitOnCaseChange off: camelCase stays whole
    assert texts("camelCase", WD_DEFAULT & ~SPLIT_ON_CASE_CHANGE) == ["camelCase"]
    # splitOnNumerics off: j2se stays whole
    assert texts("j2se", WD_DEFAULT & ~SPLIT_ON_NUMERICS) == ["j2se"]
    # testOnlyNumbers: GENERATE_WORD_PARTS only -> nothing produced
    only_words = GENERATE_WORD_PARTS | SPLIT_ON_CASE_CHANGE | SPLIT_ON_NUMERICS
    parts, width = wd_split("7-586", only_words)
    assert parts == () and width == 1
    # all-delimiter token: swallowed, creating a positional hole
    parts, width = wd_split("----", WD_DEFAULT)
    assert parts == () and width == 1


def test_lots_of_concatenating_golden():
    """testLotsOfConcatenating: exact emission order + position spans."""
    flags = (GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS | CATENATE_WORDS
             | CATENATE_NUMBERS | CATENATE_ALL | SPLIT_ON_CASE_CHANGE
             | SPLIT_ON_NUMERICS | STEM_ENGLISH_POSSESSIVE)
    parts, width = wd_split("abc-def-123-456", flags)
    assert [(p[0], p[1]) for p in parts] == [
        ("abcdef123456", 0), ("abcdef", 0), ("abc", 0), ("def", 1),
        ("123456", 2), ("123", 2), ("456", 3),
    ]
    assert width == 4
    # testLotsOfConcatenating2 adds PRESERVE_ORIGINAL right after the
    # full catenation (same span, insertion order preserved by the sort)
    parts2, _ = wd_split("abc-def-123-456", flags | PRESERVE_ORIGINAL)
    assert [p[0] for p in parts2] == [
        "abcdef123456", "abc-def-123-456", "abcdef", "abc", "def",
        "123456", "123", "456",
    ]
    # derived position increments match the reference golden
    starts = [p[1] for p in parts2]
    incs = [starts[0] + 1] + [b - a for a, b in zip(starts, starts[1:])]
    assert incs == [1, 0, 0, 0, 1, 1, 0, 1]


def test_chain_positions_and_stream():
    """Positions renumber over the split stream; stop filter keeps
    increments; the tokenized stream drives phrase semantics."""
    t, p = tokenize_one("getFooBar plain SD500", CODE)
    assert t == ["get", "foo", "bar", "plain", "sd", "500"]
    assert p == [0, 1, 2, 3, 4, 5]
    # hole from an all-delimiter token (underscores are \w for the
    # tokenizer but SUBWORD_DELIM for the word-delimiter iterator)
    t, p = tokenize_one("alpha ____ beta", CODE)
    assert t == ["alpha", "beta"]
    assert p == [0, 2]
    cfg = AnalyzerConfig(word_delimiter=WD_DEFAULT, stop_words=frozenset({"foo"}))
    t, p = tokenize_one("getFooBar", cfg)
    assert t == ["get", "bar"] and p == [0, 2]


def test_scalar_matches_vectorized_fuzz():
    import random

    rng = random.Random(7)
    frag = ["getFooBar", "snake_case", "SD500", "j2se", "plain", "O'Neil's",
            "USAToday", "x9y", "123", "7-586?", "camelCase", "test's'",
            "----", "MixedUP_case99", "a-b-c-9-d"]
    docs = [" ".join(rng.choice(frag) for _ in range(rng.randint(0, 10)))
            for _ in range(200)]
    s = pd.Series(docs)
    for cfg in (
        CODE,
        AnalyzerConfig(word_delimiter=WD_DEFAULT | CATENATE_ALL),
        AnalyzerConfig(word_delimiter=WD_DEFAULT | CATENATE_WORDS
                       | CATENATE_NUMBERS | PRESERVE_ORIGINAL),
        AnalyzerConfig(word_delimiter=WD_DEFAULT,
                       stop_words=frozenset({"case", "x9y"})),
        AnalyzerConfig(word_delimiter=WD_DEFAULT, stem=True),
    ):
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


def test_code_index_recall_and_phrases(spark, tmp_path_factory):
    """End-to-end on a CODE-analyzer index: part queries match compound
    identifiers, the manifest persists the analyzer, and post-split
    positions drive phrase matching."""
    from lucene_solr_1_spark.index.builder import build_index
    from lucene_solr_1_spark.search.parser import parse
    from lucene_solr_1_spark.search.query import Phrase, Term
    from lucene_solr_1_spark.search.searcher import LuceneSparkSearcher

    rows = [
        ("r", f"p{i}", "c", "python", text)
        for i, text in enumerate([
            "def getRowScan(self): return scanner",
            "row_scan = RowScan()",
            "plain words only here",
            "SD500 camera firmware",
        ])
    ]
    pdf = pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])
    d = str(tmp_path_factory.mktemp("idx_wd"))
    m = build_index(spark, spark.createDataFrame(pdf), d, num_segments=2,
                    cfg=CODE)
    assert m["analyzer"] == "code"
    s = LuceneSparkSearcher(spark, d)
    hit_docs = lambda h: set(h["global_doc_id"].tolist())
    # "scan" matches getRowScan, row_scan and RowScan docs
    assert len(hit_docs(s.search(Term("scan"), k=10, with_stored=False))) == 2
    # the parser constructed WITH the index analyzer splits camelCase
    # (case is gone after a default-analyzer parse — like Lucene, the
    # QueryParser must be built with the index analyzer)
    got = s.search(parse("RowScan", cfg=CODE), k=10, with_stored=False)
    assert len(got) >= 2
    # searcher-side re-analysis handles case-free compounds even when
    # the query was parsed with the default analyzer
    got2 = s.search(parse("row_scan"), k=10, with_stored=False)
    assert len(got2) >= 2
    # split parts are adjacent: phrase ("row","scan") matches compounds
    ph = s.search(Phrase(("row", "scan")), k=10, with_stored=False)
    assert len(ph) == 2
    # digits split: term "500" finds SD500
    assert len(s.search(Term("500"), k=10, with_stored=False)) == 1
    # offsets/payloads are incompatible with the graph renumbering
    with pytest.raises(Exception):
        build_index(spark, spark.createDataFrame(pdf),
                    str(tmp_path_factory.mktemp("idx_wd2")),
                    num_segments=1, cfg=CODE, store_offsets=True)
