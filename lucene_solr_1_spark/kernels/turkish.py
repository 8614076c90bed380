"""Turkish snowball stemmer + TurkishLowerCaseFilter + ApostropheFilter
(tr/TurkishAnalyzer.java:103-112 chain: standard tokenize →
ApostropheFilter → TurkishLowerCaseFilter → stop → SnowballFilter
("Turkish")).

Reference contracts:
- org/tartarus/snowball/ext/TurkishStemmer.java (the generated form of
  the published turkish.sbl): vowel-harmony-gated suffix stripping —
  nominal verb suffixes then noun suffixes with the recursive
  ki-chain — followed by post-processing (final b/c/d/ğ devoicing and
  the append-U-after-d/g rule). Cursor saves are END-relative (they
  survive deletions), the ki-chain's entry `[` makes its deletes
  INTERIOR (tails beyond the entry survive — 'insanlarınkine' keeps
  its 'ne'), and a failed try restores the CURSOR only — deletions
  inside it persist — all mirrored exactly. Pinned bit-exact against the reference's full
  canonical vocabulary (TestSnowballVocabData.zip turkish/, read at
  test time) in tests/test_turkish.py.
- tr/TurkishLowerCaseFilter.java:49-90: I→ı unless followed by a
  combining dot above (İ decomposes to I + dot → i); everything else
  standard lowercase.
- tr/ApostropheFilter.java:50-57: strip the first '/’ and everything
  after it (proper-name suffix separation).
"""

from __future__ import annotations

_VOWELS = frozenset("aeıioöuü")
_U = frozenset("ıiuü")
_HARMONY = {
    "a": frozenset("aıou"),   # g_vowel1
    "e": frozenset("eiöü"),   # g_vowel2
    "ı": frozenset("aı"),     # g_vowel3
    "i": frozenset("ei"),     # g_vowel4
    "o": frozenset("ou"),     # g_vowel5
    "u": frozenset("ou"),     # g_vowel5
    "ö": frozenset("öü"),     # g_vowel6
    "ü": frozenset("öü"),     # g_vowel6
}

_A_POSS = ("miz", "niz", "muz", "nuz", "müz", "nüz", "mız", "nız", "m", "n")
_A_LARI = ("leri", "ları")
_A_NU = ("ni", "nu", "nü", "nı")
_A_NUN = ("in", "un", "ün", "ın")
_A_YA = ("a", "e")
_A_NA = ("na", "ne")
_A_DA = ("da", "ta", "de", "te")
_A_NDA = ("nda", "nde")
_A_DAN = ("dan", "tan", "den", "ten")
_A_NDAN = ("ndan", "nden")
_A_YLA = ("la", "le")
_A_NCA = ("ca", "ce")
_A_YUM = ("im", "um", "üm", "ım")
_A_SUN = ("sin", "sun", "sün", "sın")
_A_YUZ = ("iz", "uz", "üz", "ız")
_A_SUNUZ = ("siniz", "sunuz", "sünüz", "sınız")
_A_LAR = ("lar", "ler")
_A_NUZ = ("niz", "nuz", "nüz", "nız")
_A_DUR = ("dir", "tir", "dur", "tur", "dür", "tür", "dır", "tır")
_A_CASINA = ("casına", "cesine")
_A_YDU = tuple(
    d + v + t for d in "dt" for t in ("k", "m", "n", "") for v in "iuüı"
)
_A_YSA = ("sak", "sek", "sam", "sem", "san", "sen", "sa", "se")
_A_YMUS = ("miş", "muş", "müş", "mış")


class _Ctx:
    """Backward-mode snowball state: `w` the live string, `c` the
    cursor as an index from the left. Saves are END-relative so they
    survive truncations, exactly like the reference's limit−cursor."""

    __slots__ = ("w", "c", "flag_continue")

    def __init__(self, w: str):
        self.w = w
        self.c = len(w)
        self.flag_continue = True

    def save(self) -> int:
        return len(self.w) - self.c

    def restore(self, v: int) -> None:
        self.c = len(self.w) - v

    def trunc(self) -> None:
        self.w = self.w[: self.c]

    def del_to(self, ket_rel: int) -> None:
        """slice_del with an END-relative ket: remove [cursor, ket),
        preserving any tail beyond ket (the chain_before_ki entry `[`
        makes interior deletes — 'insanlarınkine' keeps its 'ne')."""
        ket_abs = len(self.w) - ket_rel
        self.w = self.w[: self.c] + self.w[ket_abs:]


def _among(ctx: _Ctx, cands: tuple) -> bool:
    """find_among_b: longest suffix of w[:c] among cands; move cursor."""
    tail = ctx.w[: ctx.c]
    best = None
    for cand in cands:
        if tail.endswith(cand) and (best is None or len(cand) > len(best)):
            best = cand
    if best is None:
        return False
    ctx.c -= len(best)
    return True


def _harmony(ctx: _Ctx) -> bool:
    """check_vowel_harmony: the last vowel of w[:c] (the suffix vowel)
    must have SOME earlier vowel of its harmony class (the sbl's second
    `goto` skips chars — including other vowels — until one in the
    class matches, turkish.sbl lines 114-124)."""
    w, i = ctx.w, ctx.c
    p = i - 1
    while p >= 0 and w[p] not in _VOWELS:
        p -= 1
    if p < 0:
        return False
    group = _HARMONY[w[p]]
    return any(w[q] in group for q in range(p - 1, -1, -1))


def _opt_mark(ctx: _Ctx, ch: str, check_in_vowel: bool) -> bool:
    """mark_suffix_with_optional_{n,s,y}_consonant / _U_vowel: consume
    one optional `ch`-class char; the char two back must be a vowel
    (consonant markers) / a non-vowel (the U marker)."""
    w, i = ctx.w, ctx.c

    def ok(j: int) -> bool:
        if j < 2:
            return False
        return (w[j - 2] in _VOWELS) == check_in_vowel

    if i >= 1 and w[i - 1] in ch:
        if ok(i):
            ctx.c = i - 1
            return True
        return False
    if ok(i):
        return True
    return False


def _opt_n(ctx):
    return _opt_mark(ctx, "n", True)


def _opt_s(ctx):
    return _opt_mark(ctx, "s", True)


def _opt_y(ctx):
    return _opt_mark(ctx, "y", True)


def _opt_U(ctx):
    return _opt_mark(ctx, "ıiuü", False)


# --- mark routines (each: move cursor past the suffix or fail clean) ----

def _with_restore(fn):
    def inner(ctx: _Ctx) -> bool:
        v = ctx.save()
        if fn(ctx):
            return True
        ctx.restore(v)
        return False
    return inner


@_with_restore
def _mark_possessives(ctx):
    return _among(ctx, _A_POSS) and _opt_U(ctx)


@_with_restore
def _mark_sU(ctx):
    if not _harmony(ctx):
        return False
    if not (ctx.c >= 1 and ctx.w[ctx.c - 1] in _U):
        return False
    ctx.c -= 1
    return _opt_s(ctx)


@_with_restore
def _mark_lArI(ctx):
    return _among(ctx, _A_LARI)


@_with_restore
def _mark_yU(ctx):
    if not _harmony(ctx):
        return False
    if not (ctx.c >= 1 and ctx.w[ctx.c - 1] in _U):
        return False
    ctx.c -= 1
    return _opt_y(ctx)


@_with_restore
def _mark_nU(ctx):
    return _harmony(ctx) and _among(ctx, _A_NU)


@_with_restore
def _mark_nUn(ctx):
    return _harmony(ctx) and _among(ctx, _A_NUN) and _opt_n(ctx)


@_with_restore
def _mark_yA(ctx):
    return _harmony(ctx) and _among(ctx, _A_YA) and _opt_y(ctx)


@_with_restore
def _mark_nA(ctx):
    return _harmony(ctx) and _among(ctx, _A_NA)


@_with_restore
def _mark_DA(ctx):
    return _harmony(ctx) and _among(ctx, _A_DA)


@_with_restore
def _mark_ndA(ctx):
    return _harmony(ctx) and _among(ctx, _A_NDA)


@_with_restore
def _mark_DAn(ctx):
    return _harmony(ctx) and _among(ctx, _A_DAN)


@_with_restore
def _mark_ndAn(ctx):
    return _harmony(ctx) and _among(ctx, _A_NDAN)


@_with_restore
def _mark_ylA(ctx):
    return _harmony(ctx) and _among(ctx, _A_YLA) and _opt_y(ctx)


@_with_restore
def _mark_ki(ctx):
    if ctx.w[: ctx.c].endswith("ki"):
        ctx.c -= 2
        return True
    return False


@_with_restore
def _mark_ncA(ctx):
    return _harmony(ctx) and _among(ctx, _A_NCA) and _opt_n(ctx)


@_with_restore
def _mark_yUm(ctx):
    return _harmony(ctx) and _among(ctx, _A_YUM) and _opt_y(ctx)


@_with_restore
def _mark_sUn(ctx):
    return _harmony(ctx) and _among(ctx, _A_SUN)


@_with_restore
def _mark_yUz(ctx):
    return _harmony(ctx) and _among(ctx, _A_YUZ) and _opt_y(ctx)


@_with_restore
def _mark_sUnUz(ctx):
    return _among(ctx, _A_SUNUZ)


@_with_restore
def _mark_lAr(ctx):
    return _harmony(ctx) and _among(ctx, _A_LAR)


@_with_restore
def _mark_nUz(ctx):
    return _harmony(ctx) and _among(ctx, _A_NUZ)


@_with_restore
def _mark_DUr(ctx):
    return _harmony(ctx) and _among(ctx, _A_DUR)


@_with_restore
def _mark_cAsInA(ctx):
    return _among(ctx, _A_CASINA)


@_with_restore
def _mark_yDU(ctx):
    return _harmony(ctx) and _among(ctx, _A_YDU) and _opt_y(ctx)


@_with_restore
def _mark_ysA(ctx):
    return _among(ctx, _A_YSA) and _opt_y(ctx)


@_with_restore
def _mark_ymUs_(ctx):
    return _harmony(ctx) and _among(ctx, _A_YMUS) and _opt_y(ctx)


@_with_restore
def _mark_yken(ctx):
    if not ctx.w[: ctx.c].endswith("ken"):
        return False
    ctx.c -= 3
    return _opt_y(ctx)


def _first(ctx: _Ctx, *marks) -> bool:
    """or-chain: try each mark at the same cursor, first hit wins."""
    v = ctx.save()
    for m in marks:
        if m(ctx):
            return True
        ctx.restore(v)
    return False


# --- the two suffix chains + the recursive ki chain ---------------------

def _stem_nominal_verb_suffixes(ctx: _Ctx) -> bool:
    """turkish.sbl stem_nominal_verb_suffixes (lines 311-328); returns
    the routine's success; sets ctx.flag-equivalent via return tuple —
    the continue_stemming flag is handled by the caller (it is unset
    exactly when the lAr branch fires)."""
    v1 = ctx.save()
    # branch 1: ymUs_/yDU/ysA/yken
    if _first(ctx, _mark_ymUs_, _mark_yDU, _mark_ysA, _mark_yken):
        ctx.trunc()
        return True
    ctx.restore(v1)
    # branch 2: cAsInA (5-way optional) ymUs_
    if _mark_cAsInA(ctx):
        _first(ctx, _mark_sUnUz, _mark_lAr, _mark_yUm, _mark_sUn, _mark_yUz)
        if _mark_ymUs_(ctx):
            ctx.trunc()
            return True
    ctx.restore(v1)
    # branch 3: lAr ] delete try([ (DUr|yDU|ysA|ymUs_) ); UNSETS the flag
    if _mark_lAr(ctx):
        ctx.trunc()
        v4 = ctx.save()
        if not _first(ctx, _mark_DUr, _mark_yDU, _mark_ysA, _mark_ymUs_):
            ctx.restore(v4)
        ctx.trunc()
        ctx.flag_continue = False  # unset continue_stemming (sbl line 320)
        return True
    ctx.restore(v1)
    # branch 4: nUz (yDU|ysA)
    if _mark_nUz(ctx) and _first(ctx, _mark_yDU, _mark_ysA):
        ctx.trunc()
        return True
    ctx.restore(v1)
    # branch 5: (sUnUz|yUz|sUn|yUm) ] delete try([ ymUs_)
    if _first(ctx, _mark_sUnUz, _mark_yUz, _mark_sUn, _mark_yUm):
        ctx.trunc()
        v8 = ctx.save()
        if not _mark_ymUs_(ctx):
            ctx.restore(v8)
        ctx.trunc()
        return True
    ctx.restore(v1)
    # branch 6: DUr ] delete try([ (5-way optional) ymUs_)
    if not _mark_DUr(ctx):
        return False
    ctx.trunc()
    v9 = ctx.save()
    _first(ctx, _mark_sUnUz, _mark_lAr, _mark_yUm, _mark_sUn, _mark_yUz)
    if not _mark_ymUs_(ctx):
        ctx.restore(v9)
    ctx.trunc()
    return True


def _chain_before_ki(ctx: _Ctx) -> bool:
    """turkish.sbl stem_suffix_chain_before_ki (lines 333-357). The `[`
    precedes mark_ki, so every delete inside removes [cursor, entry)
    and PRESERVES any tail beyond the entry point (reached when the
    noun ndA/nA branch calls the chain with its own suffix unmarked)."""
    ket = ctx.save()  # [ at entry
    if not _mark_ki(ctx):
        return False
    v1 = ctx.save()
    # branch DA
    if _mark_DA(ctx):
        ctx.del_to(ket)
        v2 = ctx.save()  # doubles as the try's [ ket
        if _mark_lAr(ctx):
            ctx.del_to(v2)
            v4 = ctx.save()
            if not _chain_before_ki(ctx):
                ctx.restore(v4)
            return True
        ctx.restore(v2)
        if _mark_possessives(ctx):
            ctx.del_to(v2)
            v5 = ctx.save()
            if _mark_lAr(ctx):
                ctx.del_to(v5)
                if not _chain_before_ki(ctx):
                    ctx.restore(v5)
            else:
                ctx.restore(v5)
            return True
        ctx.restore(v2)
        return True
    ctx.restore(v1)
    # branch nUn
    if _mark_nUn(ctx):
        ctx.del_to(ket)
        v6 = ctx.save()  # the try's [ ket
        if _mark_lArI(ctx):
            ctx.del_to(v6)
            return True
        ctx.restore(v6)
        if _first(ctx, _mark_possessives, _mark_sU):
            ctx.del_to(v6)
            v9 = ctx.save()
            if _mark_lAr(ctx):
                ctx.del_to(v9)
                if not _chain_before_ki(ctx):
                    ctx.restore(v9)
            else:
                ctx.restore(v9)
            return True
        ctx.restore(v6)
        if not _chain_before_ki(ctx):
            ctx.restore(v6)
        return True
    ctx.restore(v1)
    # branch ndA (required) — NO delete of its own: the sub-deletes run
    # against the chain-entry ket, and the chain alternative preserves
    # the whole ndA/ki text when it fires deeper
    if not _mark_ndA(ctx):
        return False
    v10 = ctx.save()
    if _mark_lArI(ctx):
        ctx.del_to(ket)
        return True
    ctx.restore(v10)
    if _mark_sU(ctx):
        ctx.del_to(ket)
        v11 = ctx.save()
        if _mark_lAr(ctx):
            ctx.del_to(v11)
            if not _chain_before_ki(ctx):
                ctx.restore(v11)
        else:
            ctx.restore(v11)
        return True
    ctx.restore(v10)
    return _chain_before_ki(ctx)


def _stem_noun_suffixes(ctx: _Ctx) -> bool:
    """turkish.sbl stem_noun_suffixes (lines 361-412)."""
    v1 = ctx.save()
    # 1: lAr ] delete try(chain)
    if _mark_lAr(ctx):
        ctx.trunc()
        v2 = ctx.save()
        if not _chain_before_ki(ctx):
            ctx.restore(v2)
        return True
    ctx.restore(v1)
    # 2: ncA ] delete try(...)
    if _mark_ncA(ctx):
        ctx.trunc()
        v3 = ctx.save()
        while True:  # try block (single shot; break = done)
            v4 = ctx.save()
            if _mark_lArI(ctx):
                ctx.trunc()
                break
            ctx.restore(v4)
            if _first(ctx, _mark_possessives, _mark_sU):
                ctx.trunc()
                v6 = ctx.save()
                if _mark_lAr(ctx):
                    ctx.trunc()
                    if not _chain_before_ki(ctx):
                        ctx.restore(v6)
                else:
                    ctx.restore(v6)
                break
            ctx.restore(v4)
            if _mark_lAr(ctx):
                ctx.trunc()
                if not _chain_before_ki(ctx):
                    ctx.restore(v3)  # try fails; deletions persist
            else:
                ctx.restore(v3)
            break
        return True
    ctx.restore(v1)
    # 3: (ndA|nA) (...)
    if _first(ctx, _mark_ndA, _mark_nA):
        v8 = ctx.save()
        if _mark_lArI(ctx):
            ctx.trunc()
            return True
        ctx.restore(v8)
        if _mark_sU(ctx):
            ctx.trunc()
            v9 = ctx.save()
            if _mark_lAr(ctx):
                ctx.trunc()
                if not _chain_before_ki(ctx):
                    ctx.restore(v9)
            else:
                ctx.restore(v9)
            return True
        ctx.restore(v8)
        if _chain_before_ki(ctx):
            return True
    ctx.restore(v1)
    # 4: (ndAn|nU) ((sU ...) or (lArI))
    if _first(ctx, _mark_ndAn, _mark_nU):
        v11 = ctx.save()
        if _mark_sU(ctx):
            ctx.trunc()
            v12 = ctx.save()
            if _mark_lAr(ctx):
                ctx.trunc()
                if not _chain_before_ki(ctx):
                    ctx.restore(v12)
            else:
                ctx.restore(v12)
            return True
        ctx.restore(v11)
        if _mark_lArI(ctx):
            ctx.trunc()
            return True
    ctx.restore(v1)
    # 5: DAn ] delete try([ ... )
    if _mark_DAn(ctx):
        ctx.trunc()
        v13 = ctx.save()
        while True:
            v14 = ctx.save()
            if _mark_possessives(ctx):
                ctx.trunc()
                v15 = ctx.save()
                if _mark_lAr(ctx):
                    ctx.trunc()
                    if not _chain_before_ki(ctx):
                        ctx.restore(v15)
                else:
                    ctx.restore(v15)
                break
            ctx.restore(v14)
            if _mark_lAr(ctx):
                ctx.trunc()
                v16 = ctx.save()
                if not _chain_before_ki(ctx):
                    ctx.restore(v16)
                break
            ctx.restore(v14)
            if not _chain_before_ki(ctx):
                ctx.restore(v13)
            break
        return True
    ctx.restore(v1)
    # 6: (nUn|ylA) ] delete try(...)
    if _first(ctx, _mark_nUn, _mark_ylA):
        ctx.trunc()
        v18 = ctx.save()
        while True:
            v19 = ctx.save()
            if _mark_lAr(ctx):
                ctx.trunc()
                if _chain_before_ki(ctx):
                    break
                ctx.restore(v19)  # falls THROUGH to the next alternative
            else:
                ctx.restore(v19)
            if _first(ctx, _mark_possessives, _mark_sU):
                ctx.trunc()
                v21 = ctx.save()
                if _mark_lAr(ctx):
                    ctx.trunc()
                    if not _chain_before_ki(ctx):
                        ctx.restore(v21)
                else:
                    ctx.restore(v21)
                break
            ctx.restore(v19)
            if not _chain_before_ki(ctx):
                ctx.restore(v18)
            break
        return True
    ctx.restore(v1)
    # 7: lArI ] delete
    if _mark_lArI(ctx):
        ctx.trunc()
        return True
    ctx.restore(v1)
    # 8: the ki chain alone
    if _chain_before_ki(ctx):
        return True
    ctx.restore(v1)
    # 9: (DA|yU|yA) ] delete try(...)
    if _first(ctx, _mark_DA, _mark_yU, _mark_yA):
        ctx.trunc()
        v23 = ctx.save()
        while True:
            matched = False
            v24 = ctx.save()
            if _mark_possessives(ctx):
                ctx.trunc()
                v25 = ctx.save()
                if not _mark_lAr(ctx):
                    ctx.restore(v25)
                matched = True
            else:
                ctx.restore(v24)
                if _mark_lAr(ctx):
                    matched = True
            if not matched:
                ctx.restore(v23)
                break
            ctx.trunc()
            v_chain = ctx.save()
            if not _chain_before_ki(ctx):
                ctx.restore(v_chain)
            break
        return True
    ctx.restore(v1)
    # 10: (possessives|sU) required
    if not _first(ctx, _mark_possessives, _mark_sU):
        return False
    ctx.trunc()
    v27 = ctx.save()
    if _mark_lAr(ctx):
        ctx.trunc()
        if not _chain_before_ki(ctx):
            ctx.restore(v27)
    else:
        ctx.restore(v27)
    return True


def _post_process_last_consonants(ctx: _Ctx) -> bool:
    m = {"b": "p", "c": "ç", "d": "t", "ğ": "k"}
    if ctx.w and ctx.w[-1] in m:
        ctx.w = ctx.w[:-1] + m[ctx.w[-1]]
        ctx.c = min(ctx.c, len(ctx.w))
        return True
    return False


def _append_U(ctx: _Ctx) -> bool:
    w = ctx.w
    if not w or w[-1] not in "dg":
        return False
    p = len(w) - 2
    while p >= 0 and w[p] not in _VOWELS:
        p -= 1
    if p < 0:
        return False
    v = w[p]
    if v in "aı":
        ctx.w = w + "ı"
    elif v in "ei":
        ctx.w = w + "i"
    elif v in "ou":
        ctx.w = w + "u"
    else:  # öü
        ctx.w = w + "ü"
    return True


def turkish_stem(word: str) -> str:
    """The full snowball Turkish program (TurkishStemmer.stem):
    requires >= 2 vowels; nominal verb suffixes (the lAr branch stops
    further stemming — continue_stemming flag); noun suffixes with the
    recursive ki chain; postlude skipped for the reserved words
    ad/soyad; append-U after d/g; final consonant devoicing."""
    w = word
    if sum(c in _VOWELS for c in w) < 2:
        return w
    ctx = _Ctx(w)
    # do stem_nominal_verb_suffixes; the flag unsets only in its lAr branch
    _stem_nominal_verb_suffixes(ctx)
    ctx.c = len(ctx.w)
    if not ctx.flag_continue:
        return ctx.w  # stem() returns early: no noun pass, no postlude
    _stem_noun_suffixes(ctx)
    # postlude
    if ctx.w in ("ad", "soyad"):
        return ctx.w
    ctx.c = len(ctx.w)
    _append_U(ctx)
    _post_process_last_consonants(ctx)
    return ctx.w


def turkish_lower(text: str) -> str:
    """TurkishLowerCaseFilter over a raw string: I→ı (or i when a
    combining dot above follows, which is consumed), İ→i, then
    standard lowercase for the rest."""
    out = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch == "I":
            if i + 1 < n and text[i + 1] == "̇":
                out.append("i")
                i += 2
                continue
            out.append("ı")
            i += 1
            continue
        if ch == "İ":
            out.append("i")
            i += 1
            continue
        out.append(ch.lower())
        i += 1
    return "".join(out)


def strip_apostrophe(token: str) -> str:
    """ApostropheFilter: drop the first '/’ and everything after it."""
    for i, ch in enumerate(token):
        if ch in "'’":
            return token[:i]
    return token


# The published snowball Turkish stop list the reference ships verbatim
# (analysis/common/src/resources/org/apache/lucene/analysis/tr/
# stopwords.txt, 209 words)
TURKISH_STOP_WORDS = frozenset([
    "acaba", "altmış", "altı", "ama", "ancak", "arada", "aslında",
    "ayrıca", "bana", "bazı", "belki", "ben", "benden", "beni",
    "benim", "beri", "beş", "bile", "bin", "bir", "biri", "birkaç",
    "birkez", "birçok", "birşey", "birşeyi", "biz", "bizden", "bize",
    "bizi", "bizim", "bu", "buna", "bunda", "bundan", "bunlar",
    "bunları", "bunların", "bunu", "bunun", "burada", "böyle",
    "böylece", "da", "daha", "dahi", "de", "defa", "değil", "diye",
    "diğer", "doksan", "dokuz", "dolayı", "dolayısıyla", "dört",
    "edecek", "eden", "ederek", "edilecek", "ediliyor", "edilmesi",
    "ediyor", "elli", "en", "etmesi", "etti", "ettiği", "ettiğini",
    "eğer", "gibi", "göre", "halen", "hangi", "hatta", "hem", "henüz",
    "hep", "hepsi", "her", "herhangi", "herkesin", "hiç", "hiçbir",
    "iki", "ile", "ilgili", "ise", "itibaren", "itibariyle", "için",
    "işte", "kadar", "karşın", "katrilyon", "kendi", "kendilerine",
    "kendini", "kendisi", "kendisine", "kendisini", "kez", "ki",
    "kim", "kimden", "kime", "kimi", "kimse", "kırk", "milyar",
    "milyon", "mu", "mü", "mı", "nasıl", "ne", "neden", "nedenle",
    "nerde", "nerede", "nereye", "niye", "niçin", "o", "olan",
    "olarak", "oldu", "olduklarını", "olduğu", "olduğunu", "olmadı",
    "olmadığı", "olmak", "olması", "olmayan", "olmaz", "olsa",
    "olsun", "olup", "olur", "olursa", "oluyor", "on", "ona", "ondan",
    "onlar", "onlardan", "onları", "onların", "onu", "onun", "otuz",
    "oysa", "pek", "rağmen", "sadece", "sanki", "sekiz", "seksen",
    "sen", "senden", "seni", "senin", "siz", "sizden", "sizi",
    "sizin", "tarafından", "trilyon", "tüm", "var", "vardı", "ve",
    "veya", "ya", "yani", "yapacak", "yapmak", "yaptı", "yaptıkları",
    "yaptığı", "yaptığını", "yapılan", "yapılması", "yapıyor", "yedi",
    "yerine", "yetmiş", "yine", "yirmi", "yoksa", "yüz", "zaten",
    "çok", "çünkü", "öyle", "üzere", "üç", "şey", "şeyden", "şeyi",
    "şeyler", "şu", "şuna", "şunda", "şundan", "şunları", "şunu",
    "şöyle"
])
