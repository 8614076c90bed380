"""ArabicAnalyzer chain (ar/ArabicAnalyzer.java:134-145: tokenize →
lowercase → DecimalDigitFilter → stop → ArabicNormalizationFilter →
ArabicStemFilter).

Reference contracts:
- ar/ArabicNormalizer.java:32-96: alef variants (madda, hamza
  above/below) → bare alef; dotless yeh → yeh; teh marbuta → heh;
  tatweel and the eight harakat/shadda/sukun diacritics deleted.
- ar/ArabicStemmer.java:44-120 (Larkey/Ballesteros light-8 family):
  ONE prefix from the ordered list {ال وال بال كال فال لل و} (the
  single-char و needs length >= 4, the others length >= prefix+2),
  then EVERY suffix from the ordered list {ها ان ات ون ين يه ية ه ة ي}
  that still fits (each needs >= 2 chars to remain) — the suffix loop
  runs through the whole list once, so several can strip.
- core DecimalDigitFilter: any Unicode decimal digit folds to its
  ASCII value. Applied inside arabic_term (post-stop) — equivalent to
  the reference's pre-stop slot because no stop word contains digits.

Pinned by the reference's own golden pairs: tests/test_arabic.py PARSES
check("in","out") assertions out of TestArabicStemFilter.java /
TestArabicNormalizationFilter.java at test time (the porter/snowball
vocab posture — reference data read, never copied)."""

from __future__ import annotations

import unicodedata

_NORM_MAP = {
    "آ": "ا",  # alef madda -> alef
    "أ": "ا",  # alef hamza above -> alef
    "إ": "ا",  # alef hamza below -> alef
    "ى": "ي",  # dotless yeh -> yeh
    "ة": "ه",  # teh marbuta -> heh
}
_NORM_DELETE = frozenset(
    "ـ"            # tatweel
    "ًٌٍ"  # fathatan dammatan kasratan
    "َُِ"  # fatha damma kasra
    "ّْ"        # shadda sukun
)

_PREFIXES = ("ال", "وال", "بال",
             "كال", "فال", "لل",
             "و")
_SUFFIXES = ("ها", "ان", "ات",
             "ون", "ين", "يه",
             "ية", "ه", "ة", "ي")


def arabic_normalize(w: str) -> str:
    """ArabicNormalizer.normalize as a 1:1/delete char map."""
    out = []
    for ch in w:
        if ch in _NORM_DELETE:
            continue
        out.append(_NORM_MAP.get(ch, ch))
    return "".join(out)


def arabic_stem_token(w: str) -> str:
    """ArabicStemmer.stem: one prefix (first match in list order, with
    the length guards), then every suffix that still fits, in list
    order over the shrinking buffer."""
    n = len(w)
    for p in _PREFIXES:
        pl = len(p)
        if pl == 1:
            if n < 4:
                continue
        elif n < pl + 2:
            continue
        if w.startswith(p):
            w = w[pl:]
            n = len(w)
            break
    for s in _SUFFIXES:
        sl = len(s)
        if n >= sl + 2 and w.endswith(s):
            w = w[: n - sl]
            n = len(w)
    return w


def fold_decimal_digits(w: str) -> str:
    """core DecimalDigitFilter: Unicode decimal digits → ASCII."""
    if w.isascii():
        return w
    out = []
    for ch in w:
        d = unicodedata.decimal(ch, None)
        out.append(chr(ord("0") + d) if d is not None else ch)
    return "".join(out)


def arabic_term(w: str) -> str:
    """The post-stop 1:1 stage the `light_lang='ar'` registry runs:
    digit fold + normalization + light stem."""
    return arabic_stem_token(arabic_normalize(fold_decimal_digits(w)))


# The published stop list the reference ships verbatim
# (analysis/common/src/resources/.../ar/stopwords.txt, 119 words)
ARABIC_STOP_WORDS = frozenset([
    "أ", "ألا", "أما", "أن", "أنت", "أنه", "أنها", "أو", "أى", "أي",
    "أيضا", "إذا", "إلا", "إلى", "إلي", "إما", "إن", "إنه", "إنها",
    "ا", "اذا", "الآن", "الا", "الان", "التى", "التي", "الذى", "الذي",
    "الذين", "الى", "الي", "اما", "ان", "انت", "انه", "انها", "او",
    "اى", "اي", "ايضا", "ب", "بأن", "بان", "بعد", "بعض", "به", "بها",
    "بين", "بينما", "تكون", "تلك", "ثم", "جميع", "حتى", "حيث", "خلال",
    "ذلك", "ضمن", "على", "عليه", "عليها", "عن", "عند", "عندما", "غير",
    "ف", "فأن", "فان", "فما", "فهو", "فهى", "فهي", "في", "فيه",
    "فيها", "قبل", "قد", "كان", "كانت", "كل", "كما", "لا", "لدى",
    "لك", "لكن", "لم", "لن", "له", "لها", "ما", "مع", "من", "منذ",
    "منه", "منها", "نحو", "هذا", "هذه", "هناك", "هو", "هى", "هي", "و",
    "وأن", "وإن", "وان", "وفي", "وكان", "وكانت", "وكل", "ولا", "ولم",
    "ولن", "وما", "ومن", "وهو", "وهى", "وهي", "يكون"
])
