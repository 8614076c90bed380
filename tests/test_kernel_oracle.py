"""Pin the float32 bit-exactness of the kernel DuckDB oracle
(sql/kernel_oracle.py): the engine's quantized kernel scores and the
DuckDB twin must agree EXACTLY (doc ids, ranks, and float64-widened
float32 scores) — no tolerance. This is what lets the driver's
value-hash gate cover the inverted-index/WAND path."""

import duckdb
import numpy as np
import pytest

import __spark_entry__ as E
from lucene_solr_1_spark.sql import kernel_oracle as KO

SF = "/root/testdata/sf0.001"

KERNEL_ENTRIES = [
    "fts_kernel_term_wand",
    "fts_kernel_bool",
    "fts_kernel_phrase",
    "fts_multi_phrase",
    "fts_blended_term",
    "fts_payload_score",
    "fts_kernel_parsed_query",
    "fts_edismax",
    "fts_edismax_pf",
    "fts_covering",
    "fts_complex_phrase",
    "fts_boost_function",
    "fts_field_term",
    "fts_bm25_metadata_filter",
    "fts_bm25_numeric_filter",
    "fts_stemmed_term",
    # pluggable similarities over the same index (kernels/similarity.py)
    "fts_classic_tfidf",
    "fts_boolean_sim",
    "fts_lm_dirichlet",
    "fts_lm_jelinek_mercer",
    "fts_dfr_inl2",
    "fts_ib_ll",
    "fts_dfi_standardized",
    "fts_axiomatic_f2exp",
    "fts_multi_similarity",
    "fts_xml_query",
    # FeatureField scoring functions / distance feature
    "fts_feature_saturation",
    "fts_distance_feature",
]


def test_sql_pattern_matches_engine_tokens():
    """ADVICE r2: the SQL oracle tokenizes with SQL_TOKEN_PATTERN
    ([a-z0-9_]+), an ASCII approximation of the engine's _TOKEN_RE
    (\\w+ with interior '/.). The twins are exact only while the corpus
    has no token where the two differ — assert that compatibility over
    EVERY shipped documents table so a future corpus change fails loudly
    here instead of silently desyncing dl/df."""
    import duckdb as _dd

    from lucene_solr_1_spark.kernels.analyzer import _SQL_TOKEN_RE, _TOKEN_RE

    con = _dd.connect()
    for sf in ("0.001", "0.01", "0.1"):
        texts = con.execute(
            f"SELECT text FROM read_parquet('/root/testdata/sf{sf}/documents.parquet')"
        ).fetchall()
        for (t,) in texts:
            low = t.lower()
            assert _TOKEN_RE.findall(low) == _SQL_TOKEN_RE.findall(low)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return con


@pytest.mark.parametrize("name", KERNEL_ENTRIES)
def test_kernel_entry_bitexact(spark, duck, name):
    spdf = (
        E.queries()[name](spark, SF)
        .toPandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    opdf = duck.execute(E.oracle_sql()[name]).df().sort_values("rank").reset_index(drop=True)
    assert spdf["doc_id"].tolist() == opdf["doc_id"].tolist()
    assert spdf["rank"].tolist() == opdf["rank"].tolist()
    # float32 bit-exact: widened doubles must be IDENTICAL
    np.testing.assert_array_equal(
        spdf["score"].to_numpy(np.float64), opdf["score"].to_numpy(np.float64)
    )


def test_length_table_roundtrip():
    """The SQL length table implements decode(encode(x)) = max
    representable <= x (SmallFloat truncation)."""
    from lucene_solr_1_spark.kernels.smallfloat import (
        LENGTH_TABLE, byte4_to_int, int_to_byte4,
    )

    lens = np.sort(LENGTH_TABLE.astype(np.int64))
    for dl in [0, 1, 5, 23, 24, 25, 99, 100, 255, 1000, 123456]:
        via_bytes = int(byte4_to_int(int_to_byte4(np.asarray([dl])))[0])
        via_table = int(lens[lens <= dl].max())
        assert via_bytes == via_table
