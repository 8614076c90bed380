"""Fixed derived schemas for the index tables (SURVEY.md §1.4).

The posting table is both the term dictionary and the postings file:
one row per (segment_id, term), with FOR-compressed doc/freq/position
streams and per-block skip + impact metadata as plain columns — Spark
predicate pushdown on `term` replaces Lucene's FST/.tip seek
(Lucene50PostingsFormat.java:42-106, BlockTreeTermsWriter.java).
"""

POSTINGS_DDL = (
    "field string, "
    "term string, "
    "doc_freq bigint, "
    "ttf bigint, "
    "docs_enc binary, "
    "docs_offsets array<bigint>, "
    "freqs_enc binary, "
    "freqs_offsets array<bigint>, "
    "pos_enc binary, "
    "pos_offsets array<bigint>, "
    "norms_enc binary, "
    "block_last_doc array<bigint>, "
    "block_max_freq array<bigint>, "
    "block_min_norm array<bigint>, "
    "pay_enc binary"
)
# pay_enc: the .pay payload stream (Lucene50PostingsFormat.java:80-96) —
# one little-endian float32 per POSITION, aligned one-to-one with the
# decoded position stream (runs indexed by the same freqs/starts).
# Empty bytes when the index stores no payloads; pruned from the scan
# (like pos_enc) unless the plan contains a payload node.
# norms_enc: one norm byte per posting doc (parallel to the doc stream).
# Denormalizing the norm into the posting row is what makes a query touch
# ONLY the (predicate-pruned) posting rows of its terms — scoring never
# joins or shuffles the per-doc norms table. Lucene reads norms per doc
# from .nvd at score time (LeafSimScorer.java:47-61); at Spark scale that
# per-doc side lookup would be a full-table cogroup per query, so we trade
# 1 byte/posting of storage for a shuffle-free search stage.

# Norms table doubles as the docmap / stored-fields pointer: per-segment
# dense docIDs plus the row keys for retrieval (Lucene .nvd + .fdt analog).
NORMS_DDL = (
    "doc_id bigint, norm bigint, dl bigint, n_chars bigint, "
    "repo string, path string, commit string, lang string, content_sha string, "
    "content string"
)
# dl / n_chars are numeric doc-values (NumericDocValuesField analog) usable
# as kernel-path range filters; `content` is the stored document
# (Lucene50StoredFieldsFormat .fdt analog) so kernel-path hits can return /
# highlight text without a side join against the external corpus table.

MANIFEST_ROW_DDL = (
    "segment_id string, partition_id int, input_fingerprint string, "
    "doc_count bigint, sum_ttf bigint, distinct_terms bigint, "
    "total_postings bigint, build_wall_s double, "
    "min_key string, max_key string, reused boolean, field_stats string"
)
# field_stats: JSON {field: {"sum_ttf": int, "doc_count": int}} — per-field
# statistics (FieldInfos / CollectionStatistics analog) so each field gets
# its own avgdl + norm cache. `sum_ttf` (bare) remains the content field's.
