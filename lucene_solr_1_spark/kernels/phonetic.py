"""Phonetic analysis — PhoneticFilter with a Soundex encoder.

Reference:
- `lucene/analysis/phonetic/src/java/org/apache/lucene/analysis/
  phonetic/PhoneticFilter.java` (:43-90): encodes each token with a
  pluggable commons-codec encoder; `inject=true` (the default factory
  setting) emits the phonetic code as an EXTRA token at the SAME
  position (posIncr 0) — query analysis then builds a SynonymQuery of
  (token, code), which is how `smyth` finds `smith`.
- commons-codec `Soundex` (the classic US algorithm the factory wires
  by default): 4-char code, first letter kept, consonant classes
  B F P V=1 / C G J K Q S X Z=2 / D T=3 / L=4 / M N=5 / R=6, vowels
  separate duplicates, consonants separated by H or W collapse
  (getMappingCode's index-2 lookback), '0'-padded.

Codes are lowercased on emission — the engine's whole term space is
lowercase (LowerCaseFilter precedes the phonetic filter in the chain).
Other commons-codec encoders (Metaphone, Caverphone, …) plug into the
same `encoder=` hook.
"""

from __future__ import annotations

from functools import lru_cache

# US_ENGLISH_MAPPING ("01230120022455012623010202" for A..Z)
_MAP = {c: d for c, d in zip("ABCDEFGHIJKLMNOPQRSTUVWXYZ",
                             "01230120022455012623010202")}


def _mapping_code(s: str, i: int):
    """commons-codec Soundex.getMappingCode: consonants of the same class
    separated by H or W are treated as one (returns None = skipped)."""
    m = _MAP[s[i]]
    if i > 1 and m != "0":
        hw = s[i - 1]
        if hw in "HW":
            pre = s[i - 2]
            if _MAP[pre] == m or pre in "HW":
                return None
    return m


@lru_cache(maxsize=1 << 16)
def soundex(text: str) -> str:
    """commons-codec Soundex.soundex (US English), lowercased output.
    Empty string for inputs with no ASCII letters."""
    s = "".join(c for c in text.upper() if "A" <= c <= "Z")
    if not s:
        return ""
    out = [s[0], "0", "0", "0"]
    count = 1
    last = _mapping_code(s, 0)
    i = 1
    while i < len(s) and count < 4:
        m = _mapping_code(s, i)
        if m is not None:
            if m != "0" and m != last:
                out[count] = m
                count += 1
            last = m
        i += 1
    return "".join(out).lower()


ENCODERS = {"soundex": soundex}


def phonetic_code(term: str, encoder: str = "soundex") -> str:
    """Code to inject for `term`, or "" when nothing should be emitted
    (no letters, or the code equals the term itself)."""
    code = ENCODERS[encoder](term)
    if not code or code == term:
        return ""
    return code
