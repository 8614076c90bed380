"""WordDelimiterGraphFilter — splitting intra-word delimiters, case and
letter/digit transitions into subwords, with optional catenations and
original preservation.

Reference:
- `analysis/common/src/java/org/apache/lucene/analysis/miscellaneous/
  WordDelimiterIterator.java` — char classes (:25-28, getType:288-330),
  subword advance (next():122-155), break rule (isBreak:196-216), bounds
  + final-possessive handling (setBounds:241-253,
  endsWithPossessive:261-268)
- `.../WordDelimiterGraphFilter.java` — flags (:106-164), part/concat
  buffering (bufferWordParts:259-335), the no-delimiter and
  all-delimiter fast paths (incrementToken:341-375),
  flushConcatenation:538-549, position sort (PositionSorter:441-470:
  start asc, then LONGER position span first)

The graph's position model: generated parts take consecutive local
positions; CATENATE_*/PRESERVE_ORIGINAL tokens span [startPos, wordPos)
and stack at their start position; the token's total width (how far the
next input token shifts) is the final wordPos. `wd_split` returns that
exact structure so the analyzer chain can renumber a whole document
stream.
"""

from __future__ import annotations

import unicodedata
from functools import lru_cache

# flag bits (WordDelimiterGraphFilter.java:106-164)
GENERATE_WORD_PARTS = 1
GENERATE_NUMBER_PARTS = 2
CATENATE_WORDS = 4
CATENATE_NUMBERS = 8
CATENATE_ALL = 16
PRESERVE_ORIGINAL = 32
SPLIT_ON_CASE_CHANGE = 64
SPLIT_ON_NUMERICS = 128
STEM_ENGLISH_POSSESSIVE = 256

# Solr WordDelimiterGraphFilterFactory defaults (generateWordParts=1,
# generateNumberParts=1, splitOnCaseChange=1, splitOnNumerics=1,
# stemEnglishPossessive=1)
WD_DEFAULT = (
    GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS
    | SPLIT_ON_CASE_CHANGE | SPLIT_ON_NUMERICS | STEM_ENGLISH_POSSESSIVE
)

# char classes (WordDelimiterIterator.java:25-28)
_LOWER, _UPPER, _DIGIT, _DELIM = 1, 2, 4, 8
_ALPHA = _LOWER | _UPPER


@lru_cache(maxsize=4096)
def _char_type(c: str) -> int:
    """getType (WordDelimiterIterator.java:288-330)."""
    cat = unicodedata.category(c)
    if cat == "Lu":
        return _UPPER
    if cat == "Ll":
        return _LOWER
    if cat in ("Lt", "Lm", "Lo", "Mn", "Me", "Mc"):
        return _ALPHA
    if cat in ("Nd", "Nl", "No"):
        return _DIGIT
    if cat == "Cs":  # unpaired surrogate guard — never split
        return _ALPHA | _DIGIT
    return _DELIM


def _is_break(last: int, cur: int, split_case: bool, split_num: bool) -> bool:
    """isBreak (WordDelimiterIterator.java:196-216)."""
    if cur & last:
        return False
    if not split_case and (last & _ALPHA) and (cur & _ALPHA):
        return False
    if (last & _UPPER) and (cur & _ALPHA):
        return False  # UPPER->letter never splits (USAToday stays whole)
    if not split_num and (
        ((last & _ALPHA) and (cur & _DIGIT)) or ((last & _DIGIT) and (cur & _ALPHA))
    ):
        return False
    return True


def _subwords(text: str, flags: int):
    """Iterate (start, end) subword slices — the WordDelimiterIterator
    next() loop including per-subword possessive skipping and bounds."""
    types = [_char_type(c) for c in text]
    n = len(text)
    split_case = bool(flags & SPLIT_ON_CASE_CHANGE)
    split_num = bool(flags & SPLIT_ON_NUMERICS)
    poss = bool(flags & STEM_ENGLISH_POSSESSIVE)

    start_bounds = 0
    while start_bounds < n and types[start_bounds] == _DELIM:
        start_bounds += 1
    end_bounds = n
    while end_bounds > start_bounds and types[end_bounds - 1] == _DELIM:
        end_bounds -= 1

    def ends_with_possessive(pos: int) -> bool:
        # endsWithPossessive (WordDelimiterIterator.java:261-268)
        return (
            poss
            and pos > 2
            and text[pos - 2] == "'"
            and text[pos - 1] in "sS"
            and (types[pos - 3] & _ALPHA)
            and (pos == end_bounds or types[pos] == _DELIM)
        )

    has_final_possessive = ends_with_possessive(end_bounds)

    out = []
    cur = start_bounds
    skip_possessive = False
    while True:
        if skip_possessive:
            cur += 2
            skip_possessive = False
        while cur < end_bounds and types[cur] == _DELIM:
            cur += 1
        if cur >= end_bounds:
            break
        end = cur + 1
        last = types[cur]
        while end < end_bounds:
            t = types[end]
            if _is_break(last, t, split_case, split_num):
                break
            last = t
            end += 1
        if end < end_bounds - 1 and ends_with_possessive(end + 2):
            skip_possessive = True
        out.append((cur, end))
        cur = end
    return out, start_bounds, end_bounds, has_final_possessive


def _sub_type(text: str, start: int) -> int:
    """type() — first char decides, lower/upper both report ALPHA
    (WordDelimiterIterator.java:160-178)."""
    t = _char_type(text[start])
    return _ALPHA if t & _ALPHA else t


@lru_cache(maxsize=1 << 16)
def wd_split(token: str, flags: int = WD_DEFAULT):
    """One token through the graph filter. Returns
    (parts, width): parts is a tuple of (text, start_pos, end_pos) in
    buffered-sort order (start asc, longer span first); width is how many
    positions the token occupies (the next token's shift). An
    all-delimiter token yields no parts but width 1 — the reference
    swallows it 'creating a hole' (incrementToken:367-374)."""
    n = len(token)
    if n == 0:
        # empty term: preserved only under PRESERVE_ORIGINAL (testEmptyString)
        if flags & PRESERVE_ORIGINAL:
            return ((token, 0, 1),), 1
        return (), 1
    subs, start_bounds, end_bounds, has_final_poss = _subwords(token, flags)

    if subs and subs[0] == (0, n):
        # word of no delimiters: pass through (incrementToken:361-366)
        return ((token, 0, 1),), 1
    if not subs:
        # word of simply delimiters (incrementToken:367-374)
        if flags & PRESERVE_ORIGINAL:
            return ((token, 0, 1),), 1
        return (), 1

    # isSingleWord (WordDelimiterIterator.java:222-230)
    first = subs[0]
    single = (
        len(subs) == 1
        and first[0] == start_bounds
        and first[1] == (end_bounds - 2 if has_final_poss else end_bounds)
    )

    buffered: list[tuple[str, int, int]] = []
    word_pos = 0
    if single:
        buffered.append((token[first[0]:first[1]], 0, 1))
        word_pos = 1
    else:
        concat: list = []      # [text, start_pos, type, subword_count]
        concat_all: list = []
        last_concat_count = 0

        def flush(c):
            nonlocal word_pos, last_concat_count
            # flushConcatenation (WordDelimiterGraphFilter.java:538-549)
            if word_pos == c[1]:
                word_pos += 1
            last_concat_count = c[3]
            if c[3] != 1 or not _gen_parts(c[2], flags):
                buffered.append((c[0], c[1], word_pos))
            c.clear()

        for s, e in subs:
            wtype = _sub_type(token, s)
            if concat and not (concat[2] & wtype):
                flush(concat)
            if (flags & CATENATE_WORDS and wtype & _ALPHA) or (
                flags & CATENATE_NUMBERS and wtype & _DIGIT
            ):
                _append(concat, token[s:e], word_pos, wtype)
            if flags & CATENATE_ALL:
                _append(concat_all, token[s:e], word_pos, wtype)
            if _gen_parts(wtype, flags):
                buffered.append((token[s:e], word_pos, word_pos + 1))
                word_pos += 1
        if concat:
            flush(concat)
        if concat_all:
            # only if not already emitted as the same combo (:311-320)
            if concat_all[3] > last_concat_count:
                if word_pos == concat_all[1]:
                    word_pos += 1
                buffered.append((concat_all[0], concat_all[1], word_pos))

    if flags & PRESERVE_ORIGINAL:
        if word_pos == 0:
            word_pos = 1
        buffered.append((token, 0, word_pos))

    # PositionSorter: start asc, then LONGER span first (:441-456)
    buffered.sort(key=lambda p: (p[1], -p[2]))
    return tuple(buffered), max(word_pos, 1)


def _gen_parts(wtype: int, flags: int) -> bool:
    return bool(
        (flags & GENERATE_WORD_PARTS and wtype & _ALPHA)
        or (flags & GENERATE_NUMBER_PARTS and wtype & _DIGIT)
    )


def _append(c: list, text: str, word_pos: int, wtype: int) -> None:
    # concatenate() — first member pins startPos and type
    if not c:
        c.extend(["", word_pos, wtype, 0])
    c[0] += text
    c[3] += 1
