"""OSA (restricted Damerau-Levenshtein) distance: scalar contract,
independent-reference fuzz, DuckDB-twin corpus compatibility, and
engine-level transposition recall (FuzzyQuery transpositions=true)."""

import os
import random

import duckdb
import pytest

from lucene_solr_1_spark.kernels.osa import osa

from .oracle import levenshtein, osa_distance

SF_DIRS = [
    d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    if os.path.isdir(d)
]


def test_osa_goldens():
    # transposition = ONE edit; restricted: transposed pair not re-edited
    assert osa("teh", "the") == 1
    assert osa("abc", "acb") == 1
    assert osa("reutrn", "return") == 1
    assert levenshtein("reutrn", "return") == 2  # what the old filter saw
    assert osa("ca", "abc") == 3  # unrestricted DL would say 2
    assert osa("", "") == 0
    assert osa("a", "") == 1
    assert osa("", "abc") == 3
    assert osa("kitten", "sitting") == 3
    assert osa("quary", "query") == 1


def test_osa_fuzz_vs_independent_reference():
    """kernels/osa.py vs the independently-written DP in tests/oracle.py,
    plus the osa <= levenshtein and length-gap lower-bound properties."""
    rng = random.Random(420)
    alphabet = "abcd"
    for _ in range(800):
        a = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 7)))
        b = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 7)))
        d = osa(a, b)
        assert d == osa_distance(a, b), (a, b)
        assert d <= levenshtein(a, b)
        assert d >= abs(len(a) - len(b))
        assert osa(b, a) == d


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_osa_matches_duckdb_dl_on_corpus(sf_dir):
    """Twin-compatibility guard (CLAUDE.md 'twins generated from the same
    spec'): the oracle SQL uses DuckDB damerau_levenshtein (unrestricted)
    while the engine computes OSA; they differ only on compound patterns
    like ca->abc (and OSA >= DL always). What the hashes need is
    agreement AT THE DECISION BOUNDARY: for every dictionary term inside
    the length window of every gate query text, the two distances make
    the same <= max_edits cut, and agree exactly for survivors (the
    boost/rank inputs). Far-away terms may disagree (e.g. stream->quary
    is OSA 6 / DL 5) without any hash consequence."""
    from lucene_solr_1_spark.kernels.analyzer import SQL_TOKEN_PATTERN

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    # (text, max_edits) pairs used by the driver-gate entries
    for text, me in [("quary", 1), ("quary", 2)]:
        lo, hi = len(text) - me, len(text) + me
        rows = con.execute(
            f"""
            WITH tok AS (
              SELECT DISTINCT unnest(
                regexp_extract_all(lower(text), '{SQL_TOKEN_PATTERN}')
              ) AS term FROM documents
            )
            SELECT term, damerau_levenshtein(term, '{text}') AS dl
            FROM tok WHERE length(term) BETWEEN {lo} AND {hi}
            """
        ).fetchall()
        assert rows
        for term, dl in rows:
            d = osa(term, text)
            assert (d <= me) == (dl <= me), (term, text, d, dl)
            if dl <= me or d <= me:
                assert d == dl, (term, text, d, dl)
    con.close()


@pytest.mark.parametrize("sf_dir", SF_DIRS[:1])
def test_spell_suggests_transposed_term(spark, sf_dir):
    """DirectSpellChecker with LuceneLevenshteinDistance: a transposition
    typo (OSA 1, levenshtein 2) of a real dictionary word gets that word
    suggested at max_edits=1 — impossible under the old plain-Levenshtein
    distance."""
    from lucene_solr_1_spark.kernels.analyzer import SQL_TOKEN_PATTERN
    from lucene_solr_1_spark.sql.relational import suggest_spell_spark

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    ranked = [
        t for (t,) in con.execute(
            f"""
            WITH tok AS (
              SELECT doc_id, unnest(
                regexp_extract_all(lower(text), '{SQL_TOKEN_PATTERN}')
              ) AS term FROM documents
            )
            SELECT term FROM tok GROUP BY 1
            ORDER BY count(DISTINCT doc_id) DESC, term
            """
        ).fetchall()
    ]
    con.close()
    dictionary = set(ranked)

    def transpositions(w):
        # keep the first char (the spell path's minPrefix=1 filter)
        for j in range(1, len(w) - 1):
            if w[j] != w[j + 1]:
                yield w[:j] + w[j + 1] + w[j] + w[j + 2:]

    word, typo = next(
        (w, t)
        for w in ranked
        if len(w) >= 5
        for t in transpositions(w)
        if t not in dictionary
    )
    assert osa(typo, word) == 1 and levenshtein(typo, word) == 2
    out = suggest_spell_spark(spark, sf_dir, typo, max_edits=1, num_sug=5).toPandas()
    assert word in out["term"].tolist(), (typo, word, out)
