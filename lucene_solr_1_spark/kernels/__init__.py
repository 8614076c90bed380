"""Pure NumPy/pandas kernels — no Spark imports here.

All correctness-critical arithmetic (SmallFloat norms, BM25 float32
scoring, FOR block codec, analysis chain) lives in this package so it is
testable without a cluster (SURVEY.md §7 Phase 0).
"""
