"""Pluggable spell distances — reference test vectors
(TestJaroWinklerDistance.java / TestNGramDistance.java) and the
DirectSpellChecker-with-distance suggestion shape."""

import pytest

from lucene_solr_1_spark.kernels.strdist import jaro_winkler, ngram_distance


def test_jaro_winkler_reference_vectors():
    assert jaro_winkler("al", "al") == 1.0
    assert 0.961 < jaro_winkler("martha", "marhta") < 0.962
    assert 0.832 < jaro_winkler("jones", "johnson") < 0.833
    assert 0.958 < jaro_winkler("abcvwxyz", "cabvwxyz") < 0.959
    assert 0.84 < jaro_winkler("dwayne", "duane") < 0.841
    assert 0.813 < jaro_winkler("dixon", "dicksonx") < 0.814
    assert jaro_winkler("fvie", "ten") == 0.0
    assert jaro_winkler("zac ephron", "zac efron") > jaro_winkler(
        "zac ephron", "kai ephron")
    assert jaro_winkler("brittney spears", "britney spears") > jaro_winkler(
        "brittney spears", "brittney startzman")


def test_ngram_reference_vectors():
    # TestNGramDistance.testGetDistance1 (n=1)
    for a, b, want in [("al", "al", 1.0), ("a", "a", 1.0), ("b", "a", 0.0),
                       ("martha", "marhta", 0.6666), ("jones", "johnson", 0.4285),
                       ("natural", "contrary", 0.25), ("abcvwxyz", "cabvwxyz", 0.75),
                       ("dwayne", "duane", 0.666), ("dixon", "dicksonx", 0.5),
                       ("six", "ten", 0.0)]:
        assert abs(ngram_distance(a, b, 1) - want) < 0.001, (a, b, 1)
    # testGetDistance2 (n=2, the default)
    for a, b, want in [("al", "al", 1.0), ("a", "aa", 0.5),
                       ("martha", "marhta", 0.6666), ("jones", "johnson", 0.4285),
                       ("natural", "contrary", 0.25), ("abcvwxyz", "cabvwxyz", 0.625),
                       ("dwayne", "duane", 0.5833), ("dixon", "dicksonx", 0.5),
                       ("six", "ten", 0.0)]:
        assert abs(ngram_distance(a, b, 2) - want) < 0.001, (a, b, 2)
    assert ngram_distance("zac ephron", "zac efron", 2) > ngram_distance(
        "zac ephron", "kai ephron", 2)
    # null-prefix discount equalities from the reference suite
    d1 = ngram_distance("0012345678", "0012890678", 2)
    d2 = ngram_distance("0012345678", "0072385698", 2)
    assert abs(d1 - d2) < 0.001


def test_distance_properties():
    import random
    import string

    rng = random.Random(3)
    for _ in range(200):
        a = "".join(rng.choice(string.ascii_lowercase) for _ in range(rng.randint(1, 10)))
        b = "".join(rng.choice(string.ascii_lowercase) for _ in range(rng.randint(1, 10)))
        for fn in (jaro_winkler, lambda x, y: ngram_distance(x, y, 2)):
            d = fn(a, b)
            assert 0.0 <= d <= 1.0
            assert fn(a, a) == 1.0
            # symmetry holds for these similarity definitions
            assert abs(fn(a, b) - fn(b, a)) < 1e-9


def test_suggest_with_distance_ranks_and_gates(spark):
    from lucene_solr_1_spark.sql.relational import suggest_spell_distance_spark

    sf = "/root/testdata/sf0.001"
    got = suggest_spell_distance_spark(
        spark, sf, "sorte", distance="jaro_winkler", accuracy=0.6
    ).toPandas()
    assert got["term"].iloc[0] == "sort"  # the closest candidate wins
    assert got["score"].is_monotonic_decreasing
    # suggest-when-not-in-index: an indexed term yields nothing
    got2 = suggest_spell_distance_spark(
        spark, sf, "sort", distance="ngram", accuracy=0.1
    ).toPandas()
    assert len(got2) == 0
    with pytest.raises(KeyError):
        suggest_spell_distance_spark(spark, sf, "sorte", distance="nope")


def test_blended_infix_position_decay(spark):
    """BlendedInfixSuggester POSITION_LINEAR: score = trunc(weight *
    (1 - 0.10*first_pos)), coefficient 1 when the text starts with the
    query; RECIPROCAL = weight/(pos+1) (pandas reference)."""
    import pandas as pd

    from lucene_solr_1_spark.kernels.analyzer import tokenize_one
    from lucene_solr_1_spark.sql.relational import suggest_blended_infix_spark

    sf = "/root/testdata/sf0.001"
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    for blender in ("linear", "reciprocal"):
        got = suggest_blended_infix_spark(spark, sf, "merge", n=15,
                                          blender=blender).toPandas()
        rows = []
        for r in docs.itertuples(index=False):
            toks = tokenize_one(r.text)[0]
            if "merge" not in toks:
                continue
            p = toks.index("merge")
            if r.text.lower().startswith("merge"):
                coef = 1.0
            elif blender == "linear":
                coef = 1.0 - 0.10 * p
            else:
                coef = 1.0 / (p + 1)
            rows.append((r.doc_id, p, int(r.n_chars * coef)))
        ref = pd.DataFrame(rows, columns=["doc_id", "first_pos", "score"])
        ref = ref.sort_values(["score", "doc_id"], ascending=[False, True],
                              ignore_index=True).head(15)
        assert got.values.tolist() == ref.values.tolist(), blender
