"""Gopher-style repetition stats + PII scrub: hand-computed references
on a crafted corpus (the shipped tables have no duplicated 5-grams, so
the dup5 branch needs planted repetition), plus Spark==DuckDB twin
agreement on the same parquet.
"""

import hashlib
import re

import duckdb
import pandas as pd
import pytest

from lucene_solr_1_spark.pipeline import repetition as REP


@pytest.fixture(scope="module")
def crafted_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("repcorpus")
    rows = [
        # doc 0: "a b" appears 3x (chars ab=2 each occurrence -> 6),
        # tok_chars = 6; no 5-token doc-gram repeats (only 6 tokens)
        (0, "a b a b a b", "en", "src0", 11),
        # doc 1: 10 distinct tokens, no repeats at all
        (1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9", "en", "src0", 29),
        # doc 2: the 5-gram "x1 x2 x3 x4 x5" occurs twice (disjoint)
        (2, "x1 x2 x3 x4 x5 q x1 x2 x3 x4 x5", "en", "src1", 31),
        # doc 3: shorter than 5 tokens -> dup5 must be 0, top2 defined
        (3, "m n m n", "en", "src1", 7),
        # doc 4: shorter than 2 tokens -> both fractions 0.0
        (4, "solo", "en", "src2", 4),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )
    return str(d)


def test_repetition_stats_hand_reference(spark, crafted_dir):
    got = (
        REP.repetition_stats_spark(spark, crafted_dir)
        .toPandas()
        .set_index("doc_id")
    )
    # doc 0: tok_chars=6; top 2-gram "a b" count=3, gramchars=2 -> 6/6=1.0
    #        5-grams: "a b a b a" x1, "b a b a b" x1 -> dup5=0
    assert got.loc[0, "top2_frac"] == 1.0
    assert got.loc[0, "dup5_frac"] == 0.0
    # doc 1: tok_chars=20; every 2-gram unique, gramchars=4 -> 4/20=0.2
    assert got.loc[1, "top2_frac"] == 0.2
    assert got.loc[1, "dup5_frac"] == 0.0
    # doc 2: tok_chars=21; top 2-gram e.g. "x1 x2" count=2 gramchars=4
    #        -> 8/21; dup5: "x1 x2 x3 x4 x5" count=2, gramchars=10 ->
    #        (2-1)*10/21
    assert got.loc[2, "top2_frac"] == round(8 / 21, 4)
    assert got.loc[2, "dup5_frac"] == round(10 / 21, 4)
    # doc 3: tok_chars=4; "m n" count=2 gramchars=2 -> 4/4=1.0; <5 toks
    assert got.loc[3, "top2_frac"] == 1.0
    assert got.loc[3, "dup5_frac"] == 0.0
    # doc 4: no 2-grams at all
    assert got.loc[4, "top2_frac"] == 0.0
    assert got.loc[4, "dup5_frac"] == 0.0


def test_repetition_stats_duck_twin(spark, crafted_dir):
    got = REP.repetition_stats_spark(spark, crafted_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{crafted_dir}/documents.parquet/*.parquet')"
    )
    ref = con.execute(REP.repetition_stats_duck()).df()
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id").reset_index(drop=True),
        ref.sort_values("doc_id").reset_index(drop=True),
        check_dtype=False,
    )


def test_pii_scrub_reference(spark):
    SF = "/root/testdata/sf0.001"
    got = REP.pii_scrub_spark(spark, SF).toPandas().set_index("doc_id")
    from lucene_solr_1_spark.sql.relational import load_documents

    docs = load_documents(spark, SF).toPandas()
    for _, r in docs.head(40).iterrows():
        did = int(r["doc_id"])
        text = r["text"]
        if did % 3 == 0:
            text += f" user{did}@example.com"
        if did % 4 == 0:
            text += f" call +1-555-{did % 10000:04d}"
        if did % 5 == 0:
            text += f" host 10.0.{did % 256}.1"
        assert got.loc[did, "n_emails"] == (1 if did % 3 == 0 else 0)
        assert got.loc[did, "n_phones"] == (1 if did % 4 == 0 else 0)
        assert got.loc[did, "n_ips"] == (1 if did % 5 == 0 else 0)
        scrubbed = re.sub(REP.EMAIL_RE, "<EMAIL>", text)
        scrubbed = re.sub(REP.PHONE_RE, "<PHONE>", scrubbed)
        scrubbed = re.sub(REP.IP_RE, "<IP>", scrubbed)
        assert got.loc[did, "scrubbed_md5"] == hashlib.md5(
            scrubbed.encode()
        ).hexdigest()
