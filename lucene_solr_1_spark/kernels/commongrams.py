"""CommonGramsFilter + CommonGramsQueryFilter — stopword-bigram indexing
(analysis/common/src/java/org/apache/lucene/analysis/commongrams/
CommonGramsFilter.java:52-180, CommonGramsQueryFilter.java:46-140),
implemented from the documented stream contract (NOT a port):

Index side: every unigram is emitted at its position; whenever a token
or its predecessor is a common word, a gram "prev_cur" (separator '_',
GRAM_TYPE) is also emitted, stacked at the PREVIOUS token's position
(posIncr 0, posLength 2). Stream order: uni(p), gram(p), uni(p+1)...

Query side: grams are emitted whenever possible and unigrams only when
not displaced by a gram — the stateful hold-one-token algorithm whose
full s/n 2- and 3-token golden matrix (CommonGramsFilterTest.java
testCommonGramsQueryFilter) is pinned in tests/test_commongrams.py.
Every emitted query token takes posIncr 1 (the filter forces gram
posIncr back to 1), so a phrase of the query stream lines up exactly
with the indexed gram positions.

Why it exists at scale: a phrase containing a stopword ("the fox")
becomes a single gram TERM lookup instead of a huge-posting positional
intersection — the classic phrase-performance feature.
"""

from __future__ import annotations

SEPARATOR = "_"


def common_grams_stream(tokens, common, positions=None) -> tuple[list, list]:
    """Index-time stream: (terms, positions) with unigrams at their
    original positions and grams stacked at the left member's position,
    in the filter's emission order (uni p, gram p, uni p+1 ...). Grams
    pair CONSECUTIVE EMITTED tokens regardless of position gaps — the
    reference filter buffers the previous term without reading its
    posIncrement."""
    if positions is None:
        positions = list(range(len(tokens)))
    terms: list = []
    pos: list = []
    for i, t in enumerate(tokens):
        terms.append(t)
        pos.append(positions[i])
        if i + 1 < len(tokens) and (t in common or tokens[i + 1] in common):
            terms.append(t + SEPARATOR + tokens[i + 1])
            pos.append(positions[i])
    return terms, pos


def common_grams_query(tokens, common) -> list:
    """Query-time stream (CommonGramsQueryFilter.incrementToken): run the
    index filter, then keep grams whenever possible and unigrams only
    when not displaced. Returns the emitted token list; positions are
    consecutive 0..k-1 (the filter forces every posIncr to 1)."""
    stream: list = []  # (term, is_gram) in index emission order
    for i, t in enumerate(tokens):
        stream.append((t, False))
        if i + 1 < len(tokens) and (t in common or tokens[i + 1] in common):
            stream.append((t + SEPARATOR + tokens[i + 1], True))
    out: list = []
    previous = None  # (term, is_gram) held token
    last_emitted_gram = False
    for cur in stream:
        if previous is not None and not cur[1]:
            out.append(previous[0])
            last_emitted_gram = previous[1]
        previous = cur
    if previous is not None and not last_emitted_gram:
        out.append(previous[0])
    return out
