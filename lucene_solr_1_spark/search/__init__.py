"""Query engine: query tree, parser, per-segment DAAT scoring kernels
(exhaustive + block-max WAND), distributed searcher with TopDocs merge
(SURVEY.md §2.5-2.7, §3.2)."""
