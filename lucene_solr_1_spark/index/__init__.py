"""Index construction: partition-parallel segment builds, manifest commits,
tiered merging. Spark analog of Lucene's IndexWriter/DWPT/SegmentMerger
(SURVEY.md §2.3-2.4)."""
