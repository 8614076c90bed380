"""Analysis chain — StandardTokenizer-like tokenize + lowercase + stop,
vectorized over pandas Series (used inside Arrow pandas UDFs; never
row-at-a-time Python at the Spark level).

Reference semantics:
  - StandardTokenizer: UAX#29 word-break; tokens longer than
    maxTokenLength (255) are DROPPED but still consume a position
    (analysis/standard/StandardTokenizer.java:39-190, :154-164).
    Our regex approximates UAX#29 on code-like text: runs of word chars
    (unicode letters/digits/underscore) optionally joined by interior
    '.' or ''' between word chars (WB6/WB7 MidNumLetQ) — golden-token
    tests in tests/test_analyzer.py define the contract.
  - LowerCaseFilter (analysis/LowerCaseFilter.java:40-46).
  - StopFilter: removed tokens still consume position increments
    (analysis/StopFilter.java, FilteringTokenFilter). NOTE the reference
    StandardAnalyzer defaults to an EMPTY stop set
    (analysis/standard/StandardAnalyzer.java:51-53, LUCENE-7444); the
    33-word English set lives in EnglishAnalyzer.java:43-55.
  - Field length for norms = number of tokens actually emitted
    (FieldInvertState.getLength(); stopped/overlong tokens don't count),
    numOverlap = 0 for our single-valued field.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from .cjk import CJK_ALL, CJK_STOP_WORDS, cjk_expand, cjk_width_fold
from .commongrams import common_grams_stream
from .compound import decompose as compound_decompose
from .hyphenation import (HyphenationSpec, hyphen_decompose,
                          parse_pattern_values)
from .arabic import ARABIC_STOP_WORDS
from .turkish import TURKISH_STOP_WORDS, strip_apostrophe, turkish_lower
from .french import (FRENCH_ARTICLES, FRENCH_STOP_WORDS, elide,
                     french_array, french_term)
from .german import (GERMAN_STOP_WORDS, german_array, german_normalize,
                     german_term)
from .romance import (FINNISH_STOP_WORDS, HUNGARIAN_STOP_WORDS,
                      ITALIAN_ARTICLES, ITALIAN_STOP_WORDS,
                      NORWEGIAN_STOP_WORDS, PORTUGUESE_STOP_WORDS,
                      RUSSIAN_STOP_WORDS, SPANISH_STOP_WORDS,
                      SWEDISH_STOP_WORDS, light_stem, light_stem_array)
from .snowball import (DANISH_STOP_WORDS, DUTCH_STOP_WORDS,
                       ROMANIAN_STOP_WORDS)
from .htmlstrip import html_strip, html_strip_series
from .phonetic import phonetic_code
from .porter import porter_stem, stem_array, strip_possessive
from .synonyms import SYN_RULES, apply_synonym_graph, rules_map
from .worddelim import WD_DEFAULT, wd_split

# EnglishAnalyzer.ENGLISH_STOP_WORDS_SET (EnglishAnalyzer.java:43-55)
ENGLISH_STOP_WORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or
    such that the their then there these they this to was will with""".split()
)

MAX_TOKEN_LENGTH = 255  # StandardTokenizer.java DEFAULT_MAX_TOKEN_LENGTH

# Word-char runs joined by interior '.' / ''' (UAX#29 WB6/WB7 approximation).
_TOKEN_RE = re.compile(r"\w+(?:['.]\w+)*", re.UNICODE)

# ASCIIFoldingFilter (analysis/miscellaneous/ASCIIFoldingFilter.java:57-187):
# Latin-1 Supplement + Latin Extended-A folded to their ASCII equivalents
# (the filter's giant switch covers more blocks; this is the subset that
# occurs in practice for European text — tests pin the contract). Values
# may be multi-char (ß→ss, Æ→AE) exactly like the reference.
_FOLD_PAIRS = {
    "À": "A", "Á": "A", "Â": "A", "Ã": "A", "Ä": "A", "Å": "A", "Ā": "A",
    "Ă": "A", "Ą": "A", "Æ": "AE", "Ç": "C", "Ć": "C", "Ĉ": "C", "Ċ": "C",
    "Č": "C", "Ð": "D", "Ď": "D", "Đ": "D", "È": "E", "É": "E", "Ê": "E",
    "Ë": "E", "Ē": "E", "Ĕ": "E", "Ė": "E", "Ę": "E", "Ě": "E", "Ĝ": "G",
    "Ğ": "G", "Ġ": "G", "Ģ": "G", "Ĥ": "H", "Ħ": "H", "Ì": "I", "Í": "I",
    "Î": "I", "Ï": "I", "Ĩ": "I", "Ī": "I", "Ĭ": "I", "Į": "I", "İ": "I",
    "Ĳ": "IJ", "Ĵ": "J", "Ķ": "K", "Ĺ": "L", "Ļ": "L", "Ľ": "L", "Ŀ": "L",
    "Ł": "L", "Ñ": "N", "Ń": "N", "Ņ": "N", "Ň": "N", "Ŋ": "N", "Ò": "O",
    "Ó": "O", "Ô": "O", "Õ": "O", "Ö": "O", "Ø": "O", "Ō": "O", "Ŏ": "O",
    "Ő": "O", "Œ": "OE", "Ŕ": "R", "Ŗ": "R", "Ř": "R", "Ś": "S", "Ŝ": "S",
    "Ş": "S", "Š": "S", "Ţ": "T", "Ť": "T", "Ŧ": "T", "Þ": "TH", "Ù": "U",
    "Ú": "U", "Û": "U", "Ü": "U", "Ũ": "U", "Ū": "U", "Ŭ": "U", "Ů": "U",
    "Ű": "U", "Ų": "U", "Ŵ": "W", "Ý": "Y", "Ŷ": "Y", "Ÿ": "Y", "Ź": "Z",
    "Ż": "Z", "Ž": "Z",
    "à": "a", "á": "a", "â": "a", "ã": "a", "ä": "a", "å": "a", "ā": "a",
    "ă": "a", "ą": "a", "æ": "ae", "ç": "c", "ć": "c", "ĉ": "c", "ċ": "c",
    "č": "c", "ð": "d", "ď": "d", "đ": "d", "è": "e", "é": "e", "ê": "e",
    "ë": "e", "ē": "e", "ĕ": "e", "ė": "e", "ę": "e", "ě": "e", "ĝ": "g",
    "ğ": "g", "ġ": "g", "ģ": "g", "ĥ": "h", "ħ": "h", "ì": "i", "í": "i",
    "î": "i", "ï": "i", "ĩ": "i", "ī": "i", "ĭ": "i", "į": "i", "ı": "i",
    "ĳ": "ij", "ĵ": "j", "ķ": "k", "ĸ": "q", "ĺ": "l", "ļ": "l", "ľ": "l",
    "ŀ": "l", "ł": "l", "ñ": "n", "ń": "n", "ņ": "n", "ň": "n", "ŉ": "n",
    "ŋ": "n", "ò": "o", "ó": "o", "ô": "o", "õ": "o", "ö": "o", "ø": "o",
    "ō": "o", "ŏ": "o", "ő": "o", "œ": "oe", "ŕ": "r", "ŗ": "r", "ř": "r",
    "ś": "s", "ŝ": "s", "ş": "s", "š": "s", "ß": "ss", "ţ": "t", "ť": "t",
    "ŧ": "t", "þ": "th", "ù": "u", "ú": "u", "û": "u", "ü": "u", "ũ": "u",
    "ū": "u", "ŭ": "u", "ů": "u", "ű": "u", "ų": "u", "ŵ": "w", "ý": "y",
    "ŷ": "y", "ÿ": "y", "ź": "z", "ż": "z", "ž": "z", "ſ": "s",
}
_FOLD_TABLE = {ord(k): v for k, v in _FOLD_PAIRS.items()}


def ascii_fold(text: str) -> str:
    """Fold accented Latin characters to ASCII (ASCIIFoldingFilter
    subset). Identity on pure-ASCII input."""
    return text.translate(_FOLD_TABLE)

# ASCII-only pattern used by the SQL oracle path — must stay in sync with
# sql/relational.py's regexp_extract_all pattern.
SQL_TOKEN_PATTERN = "[a-z0-9_]+"
_SQL_TOKEN_RE = re.compile(SQL_TOKEN_PATTERN)


@dataclass(frozen=True)
class AnalyzerConfig:
    """StandardAnalyzer-equivalent pipeline configuration.

    With possessive/stem enabled the chain order mirrors
    EnglishAnalyzer.java:107-117: tokenize -> EnglishPossessiveFilter ->
    lowercase -> StopFilter -> PorterStemFilter (we lowercase the source
    before tokenizing, which commutes with the possessive strip since
    both apostrophe+s cases are handled)."""

    stop_words: frozenset = frozenset()  # reference default: EMPTY set
    max_token_length: int = MAX_TOKEN_LENGTH
    lowercase: bool = True
    possessive: bool = False  # EnglishPossessiveFilter.java
    stem: bool = False  # PorterStemFilter.java
    ascii_fold: bool = False  # ASCIIFoldingFilter.java (Latin subset)
    # HTMLStripCharFilter (analysis/charfilter/HTMLStripCharFilter.java):
    # a CHAR filter — markup removed from the source BEFORE tokenization
    # (kernels/htmlstrip.py pins the behavioral contract).
    html_strip: bool = False
    # PatternReplaceCharFilter chain (analysis/pattern/
    # PatternReplaceCharFilter.java:49-80; the Solr charFilter idiom):
    # tuple of (regex, replacement) applied IN ORDER to the source
    # before tokenization (after html_strip when both are set, matching
    # Solr's declaration-order charFilter stack). () = absent.
    char_filters: tuple = ()
    # PatternTokenizer in match mode, group 0 (analysis/pattern/
    # PatternTokenizer.java:54-130; the Solr pattern-tokenizer idiom):
    # when set, this regex REPLACES the standard UAX#29 approximation —
    # every match is one token. "" = standard tokenizer.
    token_pattern: str = ""
    # WordDelimiterGraphFilter flag bitmask; 0 = filter absent. Chain
    # order mirrors the Solr code-field idiom: tokenize (CASE-PRESERVING
    # — splits need it) -> WDGF -> lowercase -> stop -> stem; positions
    # renumber over the post-split stream (graph semantics: parts take
    # consecutive positions, catenations/original stack at their start).
    word_delimiter: int = 0
    # PhoneticFilter with inject=true (analysis/phonetic/
    # PhoneticFilter.java:43-90): each emitted token is followed by its
    # phonetic code AT THE SAME POSITION (posIncr 0); query-side Term
    # leaves become SynonymQuery(term, code). Value = encoder name
    # (kernels/phonetic.ENCODERS), "" = filter absent.
    phonetic: str = ""
    # KeywordRepeatFilter + PorterStemFilter + RemoveDuplicatesTokenFilter
    # (analysis/miscellaneous/KeywordRepeatFilter.java + RemoveDuplicates
    # TokenFilter.java — the Solr keep-original stemming idiom): each
    # token emits ORIGINAL then STEM at ONE position when they differ;
    # query Terms become SynonymQuery(original, stem). Requires stem.
    stem_keep_original: bool = False
    # GermanNormalizationFilter + GermanLightStemFilter
    # (de/GermanAnalyzer.java:132-142 chain; kernels/german.py pins both
    # stages — the light stemmer against the full 35k canonical
    # vocabulary). 1:1 token mapping applied AFTER the stop filter;
    # composes with the standard chain only (the reference's German
    # stack has no Porter/phonetic/wd variants).
    german: bool = False
    # ElisionFilter(DEFAULT_ARTICLES) + FrenchLightStemFilter
    # (fr/FrenchAnalyzer.java:136-146 chain; kernels/french.py pins the
    # stemmer against the full 20k canonical vocabulary). Elision strips
    # "l'avion" -> "avion" pre-stop; the stemmer is a 1:1 post-stop
    # stage. Composes with the standard chain only.
    french: bool = False
    # Spanish / Portuguese / Italian light chains ({es,pt,it}/*Analyzer
    # .java: tokenize -> [it: ElisionFilter] -> lowercase -> snowball
    # stops -> UniNE light stem; kernels/romance.py pins all three
    # stemmers against the full canonical vocabularies). Value = "es" /
    # "pt" / "it" / "sv" / "hu", "" = absent. 1:1 post-stop stage (it
    # adds elision pre-stop); composes with the
    # standard chain only, like german/french.
    light_lang: str = ""
    # SetKeywordMarkerFilter stem exclusion set (analysis/miscellaneous/
    # SetKeywordMarkerFilter.java; every language analyzer's
    # stemExclusionSet constructor arg): tokens in the set bypass the
    # stemming stage (Porter / German light / French light / UniNE
    # light). Position: AFTER the stop filter, exactly the reference
    # chain slot. GermanNormalizationFilter is NOT keyword-aware
    # (de/GermanNormalizationFilter.java has no KeywordAttribute) —
    # excluded German tokens still normalize, only the stem is skipped.
    stem_exclusions: frozenset = frozenset()
    # CommonGramsFilter (analysis/commongrams/CommonGramsFilter.java:
    # 52-180; kernels/commongrams.py pins both stream contracts with the
    # reference's full s/n golden matrix): unigrams stay, plus a
    # "prev_cur" gram stacked at the previous token's position whenever
    # either member is in the set. Query-side Phrases re-analyze through
    # CommonGramsQueryFilter (grams whenever possible, displaced
    # unigrams dropped). frozenset() = filter absent. Requires an empty
    # stop set (the grams ARE the stopword strategy).
    common_grams: frozenset = frozenset()
    # DictionaryCompoundWordTokenFilter (compound/DictionaryCompoundWord
    # TokenFilter.java:73-100 over CompoundWordTokenFilterBase.java:90-116
    # defaults min_word=5/min_sub=2/max_sub=15; kernels/compound.py pins
    # the decompose contract): every token >= 5 chars additionally emits
    # its dictionary subwords AT THE SAME POSITION (posIncr 0, original
    # kept) — the Germanic compound-recall idiom. Query-side Terms become
    # SynonymQuery(term, *subwords). frozenset() = filter absent.
    compound_dict: frozenset = frozenset()
    # HyphenationCompoundWordTokenFilter (compound/HyphenationCompound
    # WordTokenFilter.java:135-205 decompose over a Liang/TeX pattern
    # grammar — kernels/hyphenation.py pins the hyphenator and the
    # decompose contract with the reference's public da_UTF8.xml
    # goldens): every token >= 5 chars additionally emits the parts
    # between its hyphen points AT THE SAME POSITION (posIncr 0,
    # original kept), dictionary-filtered when hyphen_dict is set,
    # every min/max-sized part when hyphen_dict is None (the
    # reference's no-dictionary mode). None = filter absent; exclusive
    # with compound_dict (one compound mode per chain).
    hyphen_spec: object = None
    hyphen_dict: frozenset | None = None
    # SynonymGraphFilter + FlattenGraphFilter at index time
    # (synonym/SynonymGraphFilter.java:426-545, core/FlattenGraphFilter
    # .java:268-340 — kernels/synonyms.py pins the graph+flatten
    # contract with reference-mirroring goldens). Value = tuple of
    # Solr-format rule lines ("a, b" equivalence / "x y => z" explicit);
    # () = filter absent. Positions renumber DENSELY over the flattened
    # stream (the flatten sausage); query-side Terms expand to
    # SynonymQuery (all-single-token paths) or OR-of-Term/Phrase.
    synonyms: tuple = ()
    # CJKBigramFilter flag bitmask (cjk/CJKBigramFilter.java:59-66 —
    # kernels/cjk.py pins the stream contract with reference-mirroring
    # goldens); 0 = filter absent. The chain is CJKAnalyzer.java:89-96:
    # width fold -> lowercase -> tokenize+bigram -> stop; positions
    # renumber over the expanded stream (a CJK run's width differs from
    # its raw token count), so offsets/payloads are rejected at index
    # time like the wd/html chains.
    cjk_bigram: int = 0
    # CJKBigramFilter outputUnigrams (the combined unigram+bigram
    # index): bigrams stack at their first unigram's position
    # (posInc 0, CJKBigramFilter.java:300-308).
    cjk_output_unigrams: bool = False
    # TurkishLowerCaseFilter (tr/TurkishLowerCaseFilter.java:49-90):
    # I→ı (or i when a combining dot above follows), İ→i, everything
    # else standard lowercase — replaces the plain lower() step in
    # every analysis path. Composes with the Turkish snowball chain.
    turkish_case: bool = False

    def __post_init__(self):
        if self.stem_keep_original and not self.stem:
            raise ValueError("stem_keep_original requires stem=True")
        if self.stem_keep_original and self.word_delimiter:
            raise ValueError("stem_keep_original is not supported with "
                             "word_delimiter")
        if self.phonetic and self.word_delimiter:
            raise ValueError(
                "phonetic and word_delimiter filters are mutually "
                "exclusive in this chain"
            )
        if self.german and (self.stem or self.phonetic
                            or self.word_delimiter or self.synonyms
                            or self.ascii_fold or self.possessive
                            or self.french):
            raise ValueError(
                "german composes only with the standard chain "
                "(GermanAnalyzer.java:132-142 has no Porter/phonetic/"
                "wd/synonym stages)"
            )
        if self.french and (self.stem or self.phonetic
                            or self.word_delimiter or self.synonyms
                            or self.ascii_fold or self.possessive):
            raise ValueError(
                "french composes only with the standard chain "
                "(FrenchAnalyzer.java:136-146 has no Porter/phonetic/"
                "wd/synonym stages)"
            )
        if self.light_lang and (self.stem or self.phonetic
                                or self.word_delimiter or self.synonyms
                                or self.ascii_fold or self.possessive
                                or self.german or self.french):
            raise ValueError(
                "light_lang composes only with the standard chain "
                "({es,pt,it} analyzers have no Porter/phonetic/wd/"
                "synonym stages)"
            )
        if self.stem_exclusions and not (
            self.stem or self.german or self.french or self.light_lang
        ):
            raise ValueError("stem_exclusions require a stemming stage")
        if self.stem_exclusions and (
            self.stem_keep_original or self.phonetic
            or self.word_delimiter or self.synonyms or self.common_grams
            or self.compound_dict
        ):
            raise ValueError(
                "stem_exclusions compose with the plain stemming chains "
                "only (KeywordRepeat/phonetic/wd/synonym/gram/compound "
                "chains are out of the reference's exclusion slot)"
            )
        if self.token_pattern and self.word_delimiter:
            raise ValueError(
                "token_pattern replaces the tokenizer; word_delimiter "
                "re-tokenizes the case-preserving source — exclusive"
            )
        if self.common_grams and (
            self.stem or self.phonetic or self.word_delimiter
            or self.synonyms or self.german or self.stop_words
        ):
            raise ValueError(
                "common_grams composes only with the standard chain and "
                "an empty stop set (the grams ARE the stopword strategy)"
            )
        if self.compound_dict and (
            self.stem or self.phonetic or self.word_delimiter
            or self.synonyms or self.german or self.french
            or self.common_grams or self.stem_keep_original
        ):
            raise ValueError(
                "compound_dict composes only with the standard chain "
                "(+ stop words): DictionaryCompoundWordTokenFilter sits "
                "directly after the stop filter in the reference chains"
            )
        if self.hyphen_dict is not None and self.hyphen_spec is None:
            raise ValueError("hyphen_dict requires hyphen_spec")
        if self.hyphen_spec is not None and (
            self.stem or self.phonetic or self.word_delimiter
            or self.synonyms or self.german or self.french
            or self.common_grams or self.stem_keep_original
            or self.compound_dict
        ):
            raise ValueError(
                "hyphen_spec composes only with the standard chain "
                "(+ stop words), and is exclusive with compound_dict — "
                "one compound mode per chain, matching the reference's "
                "either/or factory choice"
            )
        if self.synonyms:
            if self.word_delimiter or self.phonetic or self.stem:
                raise ValueError(
                    "synonyms compose only with the standard chain "
                    "(no word_delimiter/phonetic/stem in this engine)"
                )
            if self.stop_words:
                raise ValueError(
                    "synonyms require an empty stop set (the graph "
                    "matcher assumes a dense token stream)"
                )
        if self.cjk_output_unigrams and not self.cjk_bigram:
            raise ValueError("cjk_output_unigrams requires cjk_bigram")
        if self.turkish_case and (
            not self.lowercase or self.word_delimiter or self.cjk_bigram
            or self.ascii_fold
        ):
            raise ValueError(
                "turkish_case replaces the plain lowercase step "
                "(requires lowercase=True; exclusive with wd/cjk/fold)"
            )
        if self.cjk_bigram and (
            self.stem or self.german or self.french or self.light_lang
            or self.word_delimiter or self.phonetic or self.synonyms
            or self.common_grams or self.compound_dict or self.token_pattern
            or self.char_filters or self.html_strip or self.ascii_fold
            or self.possessive or self.stem_keep_original
            or self.stem_exclusions
        ):
            raise ValueError(
                "cjk_bigram composes only with lowercase + stop words "
                "(CJKAnalyzer.java:89-96 is width -> lower -> bigram -> "
                "stop; no other stages in the reference chain)"
            )

    def with_english_stop(self) -> "AnalyzerConfig":
        return AnalyzerConfig(
            stop_words=ENGLISH_STOP_WORDS,
            max_token_length=self.max_token_length,
            lowercase=self.lowercase,
            possessive=self.possessive,
            stem=self.stem,
            ascii_fold=self.ascii_fold,
            word_delimiter=self.word_delimiter,
            html_strip=self.html_strip,
            char_filters=self.char_filters,
            token_pattern=self.token_pattern,
            phonetic=self.phonetic,
            stem_keep_original=self.stem_keep_original,
            german=self.german,
            french=self.french,
            light_lang=self.light_lang,
            stem_exclusions=self.stem_exclusions,
            synonyms=self.synonyms,
            compound_dict=self.compound_dict,
            hyphen_spec=self.hyphen_spec,
            hyphen_dict=self.hyphen_dict,
            turkish_case=self.turkish_case,
            cjk_bigram=self.cjk_bigram,
            cjk_output_unigrams=self.cjk_output_unigrams,
        )


STANDARD = AnalyzerConfig()
ENGLISH = AnalyzerConfig(stop_words=ENGLISH_STOP_WORDS)
# full EnglishAnalyzer chain (EnglishAnalyzer.java:107-117)
ENGLISH_STEM = AnalyzerConfig(
    stop_words=ENGLISH_STOP_WORDS, possessive=True, stem=True
)
# StandardAnalyzer + ASCIIFoldingFilter: accent-insensitive matching
# (fold runs on the lowercased SOURCE, which commutes with tokenization:
# every folded codepoint is a letter mapping to letters)
STANDARD_FOLD = AnalyzerConfig(ascii_fold=True)
# code-identifier chain: WordDelimiterGraphFilter with the Solr factory
# defaults (camelCase / snake_case / letter-digit splits, per-subword
# possessive strip) then lowercase — `getFooBar` indexes get/foo/bar
CODE = AnalyzerConfig(word_delimiter=WD_DEFAULT)
# StandardAnalyzer behind an HTMLStripCharFilter (the Solr text_html idiom)
HTML = AnalyzerConfig(html_strip=True)
# StandardAnalyzer + PhoneticFilter(Soundex, inject=true)
PHONETIC = AnalyzerConfig(phonetic="soundex")
# KeywordRepeat + Porter + RemoveDuplicates: original AND stem indexed
STEM_KEEP = AnalyzerConfig(stem=True, stem_keep_original=True)
# StandardAnalyzer + SynonymGraphFilter + FlattenGraphFilter with the
# shipped SYN_RULES (kernels/synonyms.py — the DuckDB twin generator
# derives from the SAME tuple)
SYNONYM_EN = AnalyzerConfig(synonyms=SYN_RULES)
# GermanAnalyzer: lowercase + snowball german stops + normalization +
# light stem (de/GermanAnalyzer.java:132-142)
GERMAN = AnalyzerConfig(stop_words=GERMAN_STOP_WORDS, german=True)
# StandardAnalyzer + CommonGramsFilter over the corpus's function words
# (the Solr phrase-performance idiom: no stop filter, grams instead)
COMMON_GRAMS_EN = AnalyzerConfig(common_grams=frozenset({"the", "a"}))
# FrenchAnalyzer: elision + lowercase + snowball french stops + light
# stem (fr/FrenchAnalyzer.java:136-146)
FRENCH = AnalyzerConfig(stop_words=FRENCH_STOP_WORDS, french=True)
# StandardAnalyzer behind a PatternReplaceCharFilter that joins
# hyphenated compounds ("data-driven" -> one token "datadriven")
PATTERN_CF = AnalyzerConfig(char_filters=(("-", ""),))
# PatternTokenizer in match mode: letters-only tokens (digits split,
# the Solr pattern-tokenizer idiom)
PATTERN_TOK = AnalyzerConfig(token_pattern="[a-z]+")
# EnglishAnalyzer with a stemExclusionSet (EnglishAnalyzer.java:117
# stemExclusionSet constructor arg -> SetKeywordMarkerFilter before the
# Porter stem): 'customer' stays verbatim while everything else stems
ENGLISH_STEM_EXCL = AnalyzerConfig(
    stop_words=ENGLISH_STOP_WORDS, possessive=True, stem=True,
    stem_exclusions=frozenset({"customer"}),
)
# SpanishAnalyzer / PortugueseAnalyzer / ItalianAnalyzer: snowball
# stops + UniNE light stemmers ({es,pt,it}/*Analyzer.java chains;
# Italian includes its ElisionFilter article set)
SPANISH = AnalyzerConfig(stop_words=SPANISH_STOP_WORDS, light_lang="es")
PORTUGUESE = AnalyzerConfig(stop_words=PORTUGUESE_STOP_WORDS,
                            light_lang="pt")
ITALIAN = AnalyzerConfig(stop_words=ITALIAN_STOP_WORDS, light_lang="it")
# SwedishAnalyzer / HungarianAnalyzer: snowball stops + UniNE light
# stemmers ({sv,hu}/*Analyzer.java chains)
SWEDISH = AnalyzerConfig(stop_words=SWEDISH_STOP_WORDS, light_lang="sv")
HUNGARIAN = AnalyzerConfig(stop_words=HUNGARIAN_STOP_WORDS,
                           light_lang="hu")
# FinnishAnalyzer: snowball stops + UniNE light stemmer
# (fi/FinnishAnalyzer.java chain)
FINNISH = AnalyzerConfig(stop_words=FINNISH_STOP_WORDS, light_lang="fi")
# RussianAnalyzer: snowball stops + UniNE light stemmer — Cyrillic
# end-to-end (the \w+ tokenizer handles it natively)
RUSSIAN = AnalyzerConfig(stop_words=RUSSIAN_STOP_WORDS, light_lang="ru")
# NorwegianAnalyzer (no/NorwegianAnalyzer.java: snowball stops +
# NorwegianLightStemmer with the BOKMAAL flag); the Nynorsk and
# minimal variants ride the same registry
NORWEGIAN = AnalyzerConfig(stop_words=NORWEGIAN_STOP_WORDS,
                           light_lang="nb")
NORWEGIAN_NYNORSK = AnalyzerConfig(stop_words=NORWEGIAN_STOP_WORDS,
                                   light_lang="nn")
NORWEGIAN_MINIMAL = AnalyzerConfig(stop_words=NORWEGIAN_STOP_WORDS,
                                   light_lang="nb_min")
# The UniNE MINIMAL stemmer variants (GermanMinimalStemFilter /
# FrenchMinimalStemFilter — one-pass plural strips, a lighter touch
# than the light stemmers) behind the same snowball stop sets
GERMAN_MINIMAL = AnalyzerConfig(stop_words=GERMAN_STOP_WORDS,
                                light_lang="de_min")
FRENCH_MINIMAL = AnalyzerConfig(stop_words=FRENCH_STOP_WORDS,
                                light_lang="fr_min")
# StandardAnalyzer + DictionaryCompoundWordTokenFilter over a dictionary
# tuned to the testdata documents vocabulary (the Germanic
# compound-recall idiom: `customer` additionally indexes
# `custom`+`tom`, `window` indexes `wind`; `stream` exercises the
# whole-token-in-dictionary duplicate the reference also emits). The
# DuckDB twin generator derives its mapping table from the SAME
# decompose over the testdata vocabulary.
COMPOUND_DICT = frozenset({"custom", "tom", "wind", "col", "tab", "stream"})
COMPOUND = AnalyzerConfig(compound_dict=COMPOUND_DICT)
# StandardAnalyzer + HyphenationCompoundWordTokenFilter: a tiny Liang
# pattern grammar tuned to the testdata documents vocabulary ('s1t'
# and 'm1e' hyphenate customer -> cus-tom-er, 'n1d' hyphenates
# window -> win-dow) plus a subword dictionary — `customer` indexes
# cus+custom+tom (hyphen-point-ALIGNED parts only, unlike the
# every-offset dictionary scan above). The DuckDB twin derives its
# mapping table from the SAME hyphen_decompose over the testdata
# vocabulary; the hyphenator itself is pinned by the reference's
# public da_UTF8.xml goldens in tests/test_hyphenation.py.
HYPHEN_SPEC = HyphenationSpec(
    classes=tuple((c, c) for c in "abcdefghijklmnopqrstuvwxyz"),
    patterns=tuple(
        parse_pattern_values(p) for p in ("s1t", "m1e", "n1d")
    ),
)
HYPHEN_DICT = frozenset({"cus", "custom", "tom", "win", "dow"})
HYPHENATION = AnalyzerConfig(hyphen_spec=HYPHEN_SPEC,
                             hyphen_dict=HYPHEN_DICT)
# Snowball-program analyzers (da/DanishAnalyzer.java:103-109,
# nl/DutchAnalyzer.java:147-156 with its DEFAULT_STEM_DICT override,
# ro/RomanianAnalyzer.java:106-112): snowball stops + SnowballFilter,
# riding the 1:1 light_lang registry (kernels/snowball.py, vocab-pinned)
DANISH = AnalyzerConfig(stop_words=DANISH_STOP_WORDS, light_lang="da")
# SnowballFilter("English") — the Porter2 program (snowball/ext/
# EnglishStemmer.java; the Solr SnowballPorterFilterFactory
# language="English" idiom), distinct from the classic PorterStemFilter
# chain above; vocab-pinned bit-exact (29,417 words)
ENGLISH_SNOWBALL = AnalyzerConfig(stop_words=ENGLISH_STOP_WORDS,
                                  light_lang="en")
# TurkishAnalyzer (tr/TurkishAnalyzer.java:103-112): TurkishLowerCase
# (dotted/dotless I) + snowball stops + the snowball Turkish program —
# the largest snowball stemmer, vocab-pinned bit-exact (96,325 words).
# (ApostropheFilter is structurally a no-op here: the engine tokenizer
# never emits apostrophes inside tokens; kernels/turkish.py ships
# strip_apostrophe for faithful standalone use.)
TURKISH = AnalyzerConfig(stop_words=TURKISH_STOP_WORDS,
                         light_lang="tr", turkish_case=True)
# ArabicAnalyzer (ar/ArabicAnalyzer.java:134-145): published stop list
# + ArabicNormalizationFilter + the Larkey light-8 ArabicStemFilter
# (kernels/arabic.py, pinned by the reference's own golden pairs)
ARABIC = AnalyzerConfig(stop_words=ARABIC_STOP_WORDS, light_lang="ar")
DUTCH = AnalyzerConfig(stop_words=DUTCH_STOP_WORDS, light_lang="nl")
ROMANIAN = AnalyzerConfig(stop_words=ROMANIAN_STOP_WORDS,
                          light_lang="ro")
# CJKAnalyzer.java:89-96 chain (width -> lower -> bigram -> stopwords.txt)
CJK = AnalyzerConfig(stop_words=CJK_STOP_WORDS, cjk_bigram=CJK_ALL)
# the combined unigram+bigram index (CJKBigramFilter outputUnigrams=true)
CJK_UNIBI = AnalyzerConfig(stop_words=CJK_STOP_WORDS, cjk_bigram=CJK_ALL,
                           cjk_output_unigrams=True)

# named registry: the manifest persists the analyzer by name so the
# searcher analyzes query terms with the INDEX's chain (a stemmed index
# must stem query terms too, or `merges` misses `merge`)
ANALYZERS: dict = {
    "standard": STANDARD,
    "english": ENGLISH,
    "english_stem": ENGLISH_STEM,
    "standard_fold": STANDARD_FOLD,
    "code": CODE,
    "html": HTML,
    "phonetic": PHONETIC,
    "stem_keep": STEM_KEEP,
    "synonym_en": SYNONYM_EN,
    "german": GERMAN,
    "common_grams_en": COMMON_GRAMS_EN,
    "french": FRENCH,
    "compound": COMPOUND,
    "spanish": SPANISH,
    "portuguese": PORTUGUESE,
    "italian": ITALIAN,
    "english_stem_excl": ENGLISH_STEM_EXCL,
    "pattern_charfilter": PATTERN_CF,
    "pattern_letters": PATTERN_TOK,
    "swedish": SWEDISH,
    "hungarian": HUNGARIAN,
    "finnish": FINNISH,
    "russian": RUSSIAN,
    "german_minimal": GERMAN_MINIMAL,
    "french_minimal": FRENCH_MINIMAL,
    "norwegian": NORWEGIAN,
    "norwegian_nynorsk": NORWEGIAN_NYNORSK,
    "norwegian_minimal": NORWEGIAN_MINIMAL,
    "cjk": CJK,
    "cjk_unibi": CJK_UNIBI,
    "danish": DANISH,
    "dutch": DUTCH,
    "romanian": ROMANIAN,
    "hyphenation": HYPHENATION,
    "english_snowball": ENGLISH_SNOWBALL,
    "turkish": TURKISH,
    "arabic": ARABIC,
}


def analyzer_name(cfg: AnalyzerConfig) -> str:
    for name, c in ANALYZERS.items():
        if c == cfg:
            return name
    return "standard"  # unknown custom config: no query-side reshaping


def tokenize_one(text: str, cfg: AnalyzerConfig = STANDARD) -> tuple[list, list]:
    """Analyze one string → (terms, positions). Positions reflect the
    pre-filter token index so stop/overlong removals keep increments."""
    if not text:
        return [], []
    if cfg.html_strip:
        text = html_strip(text)
    for pat, rep in cfg.char_filters:
        text = re.sub(pat, rep, text)
    if cfg.word_delimiter:
        return _tokenize_one_wd(text, cfg)
    if cfg.cjk_bigram:
        return _tokenize_one_cjk(text, cfg)
    # Lowercase the source, then tokenize: identical result to Lucene's
    # tokenize-then-LowerCaseFilter on ASCII-dominant code text, and keeps
    # this path byte-identical to the vectorized analyze_series path.
    if cfg.lowercase:
        text = turkish_lower(text) if cfg.turkish_case else text.lower()
    if cfg.ascii_fold:
        text = ascii_fold(text)
    tok_re = re.compile(cfg.token_pattern) if cfg.token_pattern else _TOKEN_RE
    raw = tok_re.findall(text)
    terms, positions = [], []
    for pos, tok in enumerate(raw):
        if len(tok) > cfg.max_token_length:
            continue  # dropped but position consumed (StandardTokenizer.java:154-164)
        if cfg.possessive:
            tok = strip_possessive(tok)
        if cfg.french:
            tok = elide(tok)  # ElisionFilter BEFORE the stop check
        if cfg.light_lang == "it":
            tok = elide(tok, ITALIAN_ARTICLES)  # ItalianAnalyzer.java:128
        if cfg.turkish_case:
            tok = strip_apostrophe(tok)  # ApostropheFilter, pre-stop
        if tok in cfg.stop_words:
            continue  # position consumed (FilteringTokenFilter)
        excluded = tok in cfg.stem_exclusions  # SetKeywordMarkerFilter
        if cfg.french and not excluded:
            tok = french_term(tok)  # light stem, 1:1
        if cfg.german:
            # normalization is not keyword-aware; the light stem is
            tok = german_normalize(tok) if excluded else german_term(tok)
        if cfg.light_lang and not excluded:
            tok = light_stem(cfg.light_lang, tok)  # UniNE light, 1:1
        if cfg.stem and not excluded:
            stemmed = porter_stem(tok)
            if cfg.stem_keep_original and stemmed != tok:
                # KeywordRepeat order: original first, stem stacked
                terms.append(tok)
                positions.append(pos)
            tok = stemmed
        terms.append(tok)
        positions.append(pos)
        if cfg.phonetic:
            code = phonetic_code(tok, cfg.phonetic)
            if code:
                terms.append(code)
                positions.append(pos)  # posIncr 0: stacked at the token
        if cfg.compound_dict:
            # original passed through above; subwords stack at its
            # position in discovery order (CompoundWordTokenFilterBase
            # .java:90-116)
            for sub in compound_decompose(tok, cfg.compound_dict):
                terms.append(sub)
                positions.append(pos)
        if cfg.hyphen_spec is not None:
            # hyphenation-driven parts, same stacking contract
            for sub in hyphen_decompose(tok, cfg.hyphen_spec,
                                        cfg.hyphen_dict):
                terms.append(sub)
                positions.append(pos)
    if cfg.synonyms:
        # SynonymGraphFilter + FlattenGraphFilter over the dense token
        # stream; positions renumber through the flatten node mapping
        return apply_synonym_graph(terms, rules_map(cfg.synonyms))
    if cfg.common_grams:
        return common_grams_stream(terms, cfg.common_grams, positions)
    return terms, positions


def _tokenize_one_cjk(text: str, cfg: AnalyzerConfig) -> tuple[list, list]:
    """CJK chain (CJKAnalyzer.java:89-96): width fold -> lowercase ->
    tokenize -> per-token bigram expansion -> stop filter. Positions
    renumber over the expanded stream (each raw token consumes its
    expansion width); the stop filter runs AFTER bigramming, exactly
    the reference order — stop words are ASCII so they can only be
    pass-through tokens, never bigram members. Scalar twin of the
    _flatten_tokens_cjk vectorized path."""
    text = cjk_width_fold(text)
    if cfg.lowercase:
        text = text.lower()
    raw = _TOKEN_RE.findall(text)
    terms, positions = [], []
    pos = 0
    for tok in raw:
        if len(tok) > cfg.max_token_length:
            pos += 1
            continue
        parts, width = cjk_expand(tok, cfg.cjk_bigram,
                                  cfg.cjk_output_unigrams)
        for ptext, prel in parts:
            if ptext in cfg.stop_words:
                continue  # position consumed (FilteringTokenFilter)
            terms.append(ptext)
            positions.append(pos + prel)
        pos += width
    return terms, positions


def _tokenize_one_wd(text: str, cfg: AnalyzerConfig) -> tuple[list, list]:
    """word_delimiter chain: tokenize CASE-PRESERVING source → wd_split →
    lowercase → stop → stem. Positions renumber over the post-split
    stream; a token's width shifts everything after it (graph
    semantics). Scalar twin of the flatten_tokens wd path — the
    scalar==vectorized test pins agreement."""
    if cfg.ascii_fold:
        text = ascii_fold(text)
    raw = _TOKEN_RE.findall(text)
    terms, positions = [], []
    pos = 0
    for tok in raw:
        if len(tok) > cfg.max_token_length:
            pos += 1
            continue
        parts, width = wd_split(tok, cfg.word_delimiter)
        for ptext, pstart, _pend in parts:
            t = ptext.lower() if cfg.lowercase else ptext
            if t in cfg.stop_words:
                continue
            if cfg.stem:
                t = porter_stem(t)
            terms.append(t)
            positions.append(pos + pstart)
        pos += width
    return terms, positions


def analyze_series(texts: pd.Series, cfg: AnalyzerConfig = STANDARD) -> pd.Series:
    """Vectorized analysis: Series[str] → Series[list[str]] of terms.

    pandas .str.findall runs the regex in C per row — this is the Arrow
    UDF hot path (no Spark-level per-row Python)."""
    src = texts.fillna("")
    if (cfg.phonetic or cfg.stem_keep_original or cfg.synonyms
            or cfg.common_grams or cfg.compound_dict
            or cfg.hyphen_spec is not None):
        # stacked-token chains (posIncr-0 injection / graph rewrite):
        # route through the scalar twin so shingle/ngram consumers see
        # the full emitted stream — on the RAW source (tokenize_one
        # applies html_strip/char_filters itself; applying them here
        # first would run a non-idempotent char filter twice)
        return src.map(lambda t: tokenize_one(t, cfg)[0])
    if cfg.html_strip:
        src = html_strip_series(src)
    for pat, rep in cfg.char_filters:
        src = src.str.replace(pat, rep, regex=True)
    if cfg.word_delimiter:
        return src.map(lambda t: _tokenize_one_wd(t, cfg)[0])
    if cfg.cjk_bigram:
        return src.map(lambda t: _tokenize_one_cjk(t, cfg)[0])
    if cfg.lowercase:
        src = src.map(turkish_lower) if cfg.turkish_case else src.str.lower()
    if cfg.ascii_fold:
        src = src.str.translate(_FOLD_TABLE)
    tok_re = re.compile(cfg.token_pattern) if cfg.token_pattern else _TOKEN_RE
    raw = src.str.findall(tok_re)
    max_len = cfg.max_token_length
    stop = cfg.stop_words
    if (cfg.possessive or cfg.stem or cfg.german or cfg.french
            or cfg.light_lang):
        return raw.map(lambda toks: _filter_tokens(toks, cfg))
    return raw.map(
        lambda toks: [t for t in toks if len(t) <= max_len and t not in stop]
    )


def _filter_tokens(toks: list, cfg: AnalyzerConfig) -> list:
    out = []
    for t in toks:
        if len(t) > cfg.max_token_length:
            continue
        if cfg.possessive:
            t = strip_possessive(t)
        if cfg.french:
            t = elide(t)
        if cfg.light_lang == "it":
            t = elide(t, ITALIAN_ARTICLES)
        if cfg.turkish_case:
            t = strip_apostrophe(t)
        if t in cfg.stop_words:
            continue
        excluded = t in cfg.stem_exclusions
        if cfg.german:
            t = german_normalize(t) if excluded else german_term(t)
        if cfg.french and not excluded:
            t = french_term(t)
        if cfg.light_lang and not excluded:
            t = light_stem(cfg.light_lang, t)
        out.append(porter_stem(t) if cfg.stem and not excluded else t)
    return out


def analyze_with_positions(texts: pd.Series, cfg: AnalyzerConfig = STANDARD):
    """Series[str] → (Series[list[str]], Series[list[int]]) with positions."""
    out_terms, out_pos = [], []
    for text in texts.fillna(""):
        t, p = tokenize_one(text, cfg)
        out_terms.append(t)
        out_pos.append(p)
    return pd.Series(out_terms, index=texts.index), pd.Series(out_pos, index=texts.index)


def flatten_tokens(texts: pd.Series, cfg: AnalyzerConfig = STANDARD):
    """Vectorized inversion prep: Series[str] →
    (terms np.ndarray[object], row_idx np.ndarray[int64], pos np.ndarray[int64],
     doc_len np.ndarray[int64]) — doc_len is the post-filter token count
    (the norm input). All steps are pandas/NumPy C loops.
    """
    if cfg.html_strip:
        texts = html_strip_series(texts.fillna(""))
    if cfg.char_filters:
        texts = texts.fillna("")
        for pat, rep in cfg.char_filters:
            texts = texts.str.replace(pat, rep, regex=True)
    if cfg.word_delimiter:
        return _flatten_tokens_wd(texts, cfg)
    if cfg.cjk_bigram:
        return _flatten_tokens_cjk(texts, cfg)
    n = len(texts)
    src = texts.fillna("")
    if cfg.lowercase:
        src = src.map(turkish_lower) if cfg.turkish_case else src.str.lower()
    if cfg.ascii_fold:
        src = src.str.translate(_FOLD_TABLE)
    tok_re = re.compile(cfg.token_pattern) if cfg.token_pattern else _TOKEN_RE
    tok_lists = src.str.findall(tok_re)
    raw_counts = tok_lists.map(len).to_numpy(dtype=np.int64)
    total = int(raw_counts.sum())
    if total == 0:
        z = np.empty(0, dtype=np.int64)
        return np.empty(0, dtype=object), z, z, np.zeros(n, dtype=np.int64)
    terms = np.concatenate(
        [np.asarray(t, dtype=object) for t in tok_lists if t]
    )
    row_idx = np.repeat(np.arange(n, dtype=np.int64), raw_counts)
    # position = raw token index within its document
    offsets = np.concatenate(([0], np.cumsum(raw_counts)[:-1]))
    pos = np.arange(total, dtype=np.int64) - np.repeat(offsets, raw_counts)
    term_s = pd.Series(terms, dtype=object)
    keep = (term_s.str.len() <= cfg.max_token_length).to_numpy()
    if cfg.possessive:
        # strip BEFORE the stop check (chain order: possessive -> stop)
        term_s = term_s.str.replace(r"['’＇][sS]$", "", regex=True)
        terms = term_s.to_numpy(dtype=object)
    if cfg.french or cfg.light_lang == "it":
        # ElisionFilter BEFORE the stop check: apostrophes are rare —
        # rewrite only the tokens that carry one
        arts = FRENCH_ARTICLES if cfg.french else ITALIAN_ARTICLES
        has_apos = term_s.str.contains("['’]", regex=True).to_numpy()
        if has_apos.any():
            terms = term_s.to_numpy(dtype=object).copy()
            idx = np.nonzero(has_apos)[0]
            terms[idx] = [elide(t, arts) for t in terms[idx]]
            term_s = pd.Series(terms, dtype=object)
    if cfg.turkish_case:
        # ApostropheFilter pre-stop: rewrite only tokens carrying one
        has_apos = term_s.str.contains("['’]", regex=True).to_numpy()
        if has_apos.any():
            terms = term_s.to_numpy(dtype=object).copy()
            idx = np.nonzero(has_apos)[0]
            terms[idx] = [strip_apostrophe(t) for t in terms[idx]]
            term_s = pd.Series(terms, dtype=object)
    if cfg.stop_words:
        keep &= ~term_s.isin(cfg.stop_words).to_numpy()
    terms, row_idx, pos = terms[keep], row_idx[keep], pos[keep]
    excl_mask = None
    if cfg.stem_exclusions:
        # SetKeywordMarkerFilter slot: mark post-stop tokens, restore
        # them after the (vectorized) stem stages run
        excl_mask = (
            pd.Series(terms, dtype=object).isin(cfg.stem_exclusions)
            .to_numpy()
        )
        if excl_mask.any():
            excl_orig = terms[excl_mask].copy()
        else:
            excl_mask = None
    if cfg.french:
        terms = french_array(terms)
    if cfg.german:
        # per-UNIQUE-term normalize+light-stem, C-level gather back
        terms = german_array(terms)
    if cfg.light_lang:
        terms = light_stem_array(cfg.light_lang, terms)
    if cfg.stem:
        if cfg.stem_keep_original:
            terms, row_idx, pos = _inject_keep_original(terms, row_idx, pos)
        else:
            # per-UNIQUE-term stemming (Zipf: vocabulary << token stream),
            # then a C-level map back over the token array
            terms = stem_array(terms)
    if excl_mask is not None:
        terms = terms.copy()
        if cfg.german:  # normalization still applies to keywords
            terms[excl_mask] = [german_normalize(t) for t in excl_orig]
        else:
            terms[excl_mask] = excl_orig
    if cfg.phonetic:
        terms, row_idx, pos = _inject_phonetic(terms, row_idx, pos, cfg)
    if cfg.synonyms:
        terms, row_idx, pos = _apply_synonyms_flat(terms, row_idx, pos, n, cfg)
    if cfg.common_grams:
        terms, row_idx, pos = _inject_common_grams(terms, row_idx, pos, cfg)
    if cfg.compound_dict:
        terms, row_idx, pos = _inject_compound(terms, row_idx, pos, cfg)
    if cfg.hyphen_spec is not None:
        terms, row_idx, pos = _inject_hyphen(terms, row_idx, pos, cfg)
    doc_len = np.bincount(row_idx, minlength=n).astype(np.int64)
    return terms, row_idx, pos, doc_len


def _inject_compound(terms, row_idx, pos, cfg: AnalyzerConfig):
    """Vectorized DictionaryCompoundWordTokenFilter: after each token, its
    dictionary subwords at the SAME position (original kept). Per-unique
    decomposition (Zipf) then a variable-width segment gather —
    stream-identical to the scalar tokenize_one ordering."""
    codes, uniq = pd.factorize(pd.Series(terms, dtype=object), sort=False)
    subs_u = [compound_decompose(u, cfg.compound_dict) for u in uniq]
    counts_u = np.fromiter((1 + len(s) for s in subs_u), dtype=np.int64,
                           count=len(subs_u))
    counts = counts_u[codes]
    total = int(counts.sum())
    if total == len(terms):  # nothing decomposed
        return terms, row_idx, pos
    out_terms = np.empty(total, dtype=object)
    out_rows = np.repeat(row_idx, counts)
    out_pos = np.repeat(pos, counts)
    first = np.cumsum(counts) - counts
    out_terms[first] = terms
    # scatter per (unique term, subword slot): loops vocabulary x
    # subwords (tiny), each fill vectorized over that term's occurrences
    for u in np.nonzero(counts_u > 1)[0]:
        occ = first[codes == u]
        for j, sub in enumerate(subs_u[u]):
            out_terms[occ + 1 + j] = sub
    return out_terms, out_rows, out_pos


def _inject_hyphen(terms, row_idx, pos, cfg: AnalyzerConfig):
    """Vectorized HyphenationCompoundWordTokenFilter: after each token,
    its hyphenation-derived parts at the SAME position (original kept).
    Per-unique decomposition (Zipf) then the same variable-width segment
    gather as _inject_compound — stream-identical to the scalar
    tokenize_one ordering."""
    from .hyphenation import hyphen_decompose as hdec

    codes, uniq = pd.factorize(pd.Series(terms, dtype=object), sort=False)
    subs_u = [hdec(u, cfg.hyphen_spec, cfg.hyphen_dict) for u in uniq]
    counts_u = np.fromiter((1 + len(s) for s in subs_u), dtype=np.int64,
                           count=len(subs_u))
    counts = counts_u[codes]
    total = int(counts.sum())
    if total == len(terms):  # nothing decomposed
        return terms, row_idx, pos
    out_terms = np.empty(total, dtype=object)
    out_rows = np.repeat(row_idx, counts)
    out_pos = np.repeat(pos, counts)
    first = np.cumsum(counts) - counts
    out_terms[first] = terms
    for u in np.nonzero(counts_u > 1)[0]:
        occ = first[codes == u]
        for j, sub in enumerate(subs_u[u]):
            out_terms[occ + 1 + j] = sub
    return out_terms, out_rows, out_pos


def _inject_keep_original(terms, row_idx, pos):
    """Vectorized KeywordRepeat+stem+RemoveDuplicates: ORIGINAL then STEM
    at one position when they differ (per-unique stemming, then the same
    segment gather as the phonetic injector)."""
    codes, uniq = pd.factorize(pd.Series(terms, dtype=object), sort=False)
    stems_u = stem_array(np.asarray(uniq, dtype=object))
    differ = stems_u != np.asarray(uniq, dtype=object)
    counts = np.where(differ[codes], 2, 1).astype(np.int64)
    total = int(counts.sum())
    out_terms = np.empty(total, dtype=object)
    out_rows = np.repeat(row_idx, counts)
    out_pos = np.repeat(pos, counts)
    first = np.cumsum(counts) - counts
    out_terms[first] = terms                      # original (or the stem
    two = counts == 2                             #  when they are equal)
    out_terms[first[two] + 1] = stems_u[codes[two]]
    # single-output tokens where stem == original already hold the stem
    return out_terms, out_rows, out_pos


def _inject_phonetic(terms, row_idx, pos, cfg: AnalyzerConfig):
    """Vectorized PhoneticFilter inject=true: after each token, its code
    at the SAME position. Per-unique-term encoding (Zipf) then a segment
    gather — stream-identical to the scalar tokenize_one ordering."""
    codes, uniq = pd.factorize(pd.Series(terms, dtype=object), sort=False)
    u_code = np.asarray(
        [phonetic_code(u, cfg.phonetic) for u in uniq], dtype=object
    )
    has = np.asarray([bool(c) for c in u_code])
    counts = np.where(has[codes], 2, 1).astype(np.int64)
    total = int(counts.sum())
    out_terms = np.empty(total, dtype=object)
    out_rows = np.repeat(row_idx, counts)
    out_pos = np.repeat(pos, counts)
    first = np.cumsum(counts) - counts
    out_terms[first] = terms
    extra = first[counts == 2] + 1
    out_terms[extra] = u_code[codes[counts == 2]]
    return out_terms, out_rows, out_pos


def _apply_synonyms_flat(terms, row_idx, pos, n: int, cfg: AnalyzerConfig):
    """Vectorized SynonymGraphFilter+flatten over the flattened token
    stream: a C-level trigger scan (np.isin against the rule inputs'
    first tokens) splits docs into a no-match FAST path (positions
    renumber densely, everything stays NumPy) and a per-doc scalar graph
    pass for the (typically rare) docs containing a trigger — work is
    proportional to trigger-doc tokens, not corpus tokens. Must stay
    stream-identical to tokenize_one (scalar==vectorized test)."""
    smap = rules_map(cfg.synonyms)
    if len(terms) == 0 or not smap:
        return terms, row_idx, pos
    # dense per-doc renumbering (the synonym stage's position contract —
    # apply_synonym_graph numbers the flattened stream 0..k-1)
    counts = np.bincount(row_idx, minlength=n).astype(np.int64)
    offsets = np.cumsum(counts) - counts
    dense_pos = np.arange(len(terms), dtype=np.int64) - np.repeat(
        offsets[counts > 0], counts[counts > 0]
    )
    triggers = np.asarray(list(smap.by_first), dtype=object)
    hit = np.isin(terms, triggers)
    if not hit.any():
        return terms, row_idx, dense_pos
    doc_hit = np.bincount(row_idx[hit], minlength=n) > 0
    tok_hit = doc_hit[row_idx]
    out_t = [terms[~tok_hit]]
    out_r = [row_idx[~tok_hit]]
    out_p = [dense_pos[~tok_hit]]
    out_s = [dense_pos[~tok_hit]]  # emission seq == dense pos on fast path
    for d in np.nonzero(doc_hit)[0]:
        lo, hi = offsets[d], offsets[d] + counts[d]
        t, p = apply_synonym_graph(list(terms[lo:hi]), smap)
        k = len(t)
        out_t.append(np.asarray(t, dtype=object))
        out_r.append(np.full(k, d, dtype=np.int64))
        out_p.append(np.asarray(p, dtype=np.int64))
        out_s.append(np.arange(k, dtype=np.int64))
    a_t = np.concatenate(out_t)
    a_r = np.concatenate(out_r)
    a_p = np.concatenate(out_p)
    a_s = np.concatenate(out_s)
    order = np.lexsort((a_s, a_r))
    return a_t[order], a_r[order], a_p[order]


def _inject_common_grams(terms, row_idx, pos, cfg: AnalyzerConfig):
    """Vectorized CommonGramsFilter: gram "t[i]_t[i+1]" stacked at
    pos[i] for every consecutive same-doc pair where either member is
    common — shifted-array masks plus one pandas str concat, then the
    same (row, seq) gather the other injectors use (uni seq 2i, gram
    seq 2i+1 preserves the filter's emission order)."""
    n_tok = len(terms)
    if n_tok < 2:
        return terms, row_idx, pos
    ts = pd.Series(terms, dtype=object)
    common = ts.isin(cfg.common_grams).to_numpy()
    same_doc = row_idx[:-1] == row_idx[1:]
    gram_at = same_doc & (common[:-1] | common[1:])  # left-member index
    if not gram_at.any():
        return terms, row_idx, pos
    left = np.nonzero(gram_at)[0]
    gram_terms = (
        ts.iloc[left].reset_index(drop=True)
        + "_"
        + ts.iloc[left + 1].reset_index(drop=True)
    ).to_numpy(dtype=object)
    seq = np.arange(n_tok, dtype=np.int64) * 2
    a_t = np.concatenate([terms, gram_terms])
    a_r = np.concatenate([row_idx, row_idx[left]])
    a_p = np.concatenate([pos, pos[left]])
    a_s = np.concatenate([seq, seq[left] + 1])
    order = np.lexsort((a_s, a_r))
    return a_t[order], a_r[order], a_p[order]


def _flatten_tokens_cjk(texts: pd.Series, cfg: AnalyzerConfig):
    """Vectorized inversion prep for the CJK bigram chain: width-fold +
    lowercase the source, tokenize, expand per UNIQUE raw token (Zipf —
    same trick as the wd flatten), then gather over per-unique part
    slices. Positions = segmented exclusive cumsum of expansion widths
    plus each part's in-token relative position. Must stay
    stream-identical to _tokenize_one_cjk (scalar==vectorized test)."""
    n = len(texts)
    src = texts.fillna("")
    # width folding is rare on this corpus: rewrite only rows carrying a
    # halfwidth/fullwidth-forms char
    has_wide = src.str.contains("[＀-￯]", regex=True)
    if has_wide.any():
        src = src.where(~has_wide, src[has_wide].map(cjk_width_fold))
    if cfg.lowercase:
        src = src.str.lower()
    tok_lists = src.str.findall(_TOKEN_RE)
    raw_counts = tok_lists.map(len).to_numpy(dtype=np.int64)
    total = int(raw_counts.sum())
    if total == 0:
        z = np.empty(0, dtype=np.int64)
        return np.empty(0, dtype=object), z, z, np.zeros(n, dtype=np.int64)
    raw = np.concatenate([np.asarray(t, dtype=object) for t in tok_lists if t])
    row_idx = np.repeat(np.arange(n, dtype=np.int64), raw_counts)

    codes, uniq = pd.factorize(pd.Series(raw), sort=False)
    part_texts: list[str] = []
    part_rel: list[int] = []
    u_start = np.empty(len(uniq), dtype=np.int64)
    u_count = np.empty(len(uniq), dtype=np.int64)
    widths_u = np.empty(len(uniq), dtype=np.int64)
    for i, u in enumerate(uniq):
        u_start[i] = len(part_texts)
        if len(u) > cfg.max_token_length:
            parts, width = (), 1  # overlong raw token: dropped, 1 position
        else:
            parts, width = cjk_expand(u, cfg.cjk_bigram,
                                      cfg.cjk_output_unigrams)
        for ptext, prel in parts:
            part_texts.append(ptext)
            part_rel.append(prel)
        u_count[i] = len(part_texts) - u_start[i]
        widths_u[i] = width
    all_texts = np.asarray(part_texts, dtype=object)
    all_rel = np.asarray(part_rel, dtype=np.int64)

    widths = widths_u[codes]
    counts = u_count[codes]
    cum = np.cumsum(widths) - widths
    doc_first = np.concatenate(([0], np.cumsum(raw_counts)[:-1]))
    base = np.repeat(cum[np.minimum(doc_first, total - 1)], raw_counts)
    start_pos = cum - base
    n_parts = int(counts.sum())
    if n_parts == 0:
        z = np.empty(0, dtype=np.int64)
        return np.empty(0, dtype=object), z, z, np.zeros(n, dtype=np.int64)
    seg_base = np.cumsum(counts) - counts
    within = np.arange(n_parts, dtype=np.int64) - np.repeat(seg_base, counts)
    gather = np.repeat(u_start[codes], counts) + within
    terms = all_texts[gather]
    pos = np.repeat(start_pos, counts) + all_rel[gather]
    rows = np.repeat(row_idx, counts)

    if cfg.stop_words:
        keep = ~pd.Series(terms, dtype=object).isin(cfg.stop_words).to_numpy()
        terms, rows, pos = terms[keep], rows[keep], pos[keep]
    doc_len = np.bincount(rows, minlength=n).astype(np.int64)
    return terms, rows, pos, doc_len


def _flatten_tokens_wd(texts: pd.Series, cfg: AnalyzerConfig):
    """Vectorized inversion prep for the word_delimiter chain: tokenize
    the CASE-PRESERVING source, split per UNIQUE raw token (Zipf: the
    vocabulary is far smaller than the token stream — same trick as
    stemming), then expand the stream with a gather over per-unique part
    slices. Positions = segmented exclusive cumsum of token widths plus
    each part's in-token start (graph position semantics). Must stay
    stream-identical to _tokenize_one_wd (scalar==vectorized test)."""
    n = len(texts)
    src = texts.fillna("")
    if cfg.ascii_fold:
        src = src.str.translate(_FOLD_TABLE)
    tok_lists = src.str.findall(_TOKEN_RE)
    raw_counts = tok_lists.map(len).to_numpy(dtype=np.int64)
    total = int(raw_counts.sum())
    if total == 0:
        z = np.empty(0, dtype=np.int64)
        return np.empty(0, dtype=object), z, z, np.zeros(n, dtype=np.int64)
    raw = np.concatenate([np.asarray(t, dtype=object) for t in tok_lists if t])
    row_idx = np.repeat(np.arange(n, dtype=np.int64), raw_counts)

    codes, uniq = pd.factorize(pd.Series(raw), sort=False)
    flags = cfg.word_delimiter
    part_texts: list[str] = []
    part_offs: list[int] = []
    u_start = np.empty(len(uniq), dtype=np.int64)
    u_count = np.empty(len(uniq), dtype=np.int64)
    widths_u = np.empty(len(uniq), dtype=np.int64)
    for i, u in enumerate(uniq):
        u_start[i] = len(part_texts)
        if len(u) > cfg.max_token_length:
            parts, width = (), 1  # overlong raw token: dropped, 1 position
        else:
            parts, width = wd_split(u, flags)
        for ptext, pstart, _pend in parts:
            part_texts.append(ptext.lower() if cfg.lowercase else ptext)
            part_offs.append(pstart)
        u_count[i] = len(part_texts) - u_start[i]
        widths_u[i] = width
    all_texts = np.asarray(part_texts, dtype=object)
    all_offs = np.asarray(part_offs, dtype=np.int64)

    widths = widths_u[codes]
    counts = u_count[codes]
    # per-token start position = exclusive cumsum of widths within its doc
    cum = np.cumsum(widths) - widths
    doc_first = np.concatenate(([0], np.cumsum(raw_counts)[:-1]))
    base = np.repeat(cum[np.minimum(doc_first, total - 1)], raw_counts)
    start_pos = cum - base
    # gather each token's part slice [u_start, u_start + u_count)
    n_parts = int(counts.sum())
    if n_parts == 0:
        z = np.empty(0, dtype=np.int64)
        return np.empty(0, dtype=object), z, z, np.zeros(n, dtype=np.int64)
    seg_base = np.cumsum(counts) - counts
    within = np.arange(n_parts, dtype=np.int64) - np.repeat(seg_base, counts)
    gather = np.repeat(u_start[codes], counts) + within
    terms = all_texts[gather]
    pos = np.repeat(start_pos, counts) + all_offs[gather]
    rows = np.repeat(row_idx, counts)

    if cfg.stop_words:
        keep = ~pd.Series(terms, dtype=object).isin(cfg.stop_words).to_numpy()
        terms, rows, pos = terms[keep], rows[keep], pos[keep]
    if cfg.stem:
        terms = stem_array(terms)
    doc_len = np.bincount(rows, minlength=n).astype(np.int64)
    return terms, rows, pos, doc_len


def shingle_tokens(
    terms: list,
    min_n: int = 2,
    max_n: int = 2,
    sep: str = " ",
    output_unigrams: bool = True,
) -> list:
    """ShingleFilter (analysis/shingle/ShingleFilter.java:61-146): emit
    word n-grams of consecutive tokens for every size in [min_n, max_n],
    in the reference's position-ordered interleaving (at each position:
    the unigram if outputUnigrams, then each shingle size starting
    there). min_n >= 2 like the reference's minShingleSize contract."""
    if min_n < 2 or max_n < min_n:
        raise ValueError("shingle sizes need 2 <= min_n <= max_n")
    out = []
    n_terms = len(terms)
    for i in range(n_terms):
        if output_unigrams:
            out.append(terms[i])
        for n in range(min_n, max_n + 1):
            if i + n <= n_terms:
                out.append(sep.join(terms[i:i + n]))
    return out


def shingle_series(
    texts: pd.Series,
    cfg: AnalyzerConfig = STANDARD,
    min_n: int = 2,
    max_n: int = 2,
    output_unigrams: bool = True,
) -> pd.Series:
    """Analyze then shingle each row — Series[str] → Series[list[str]]
    (the analyzer-chain composition a shingled field indexes)."""
    return analyze_series(texts, cfg).map(
        lambda t: shingle_tokens(t, min_n, max_n, " ", output_unigrams)
    )


def ngram_tokens(
    terms: list, min_n: int = 1, max_n: int = 2, preserve_original: bool = False
) -> list:
    """NGramTokenFilter (analysis/ngram/NGramTokenFilter.java:60-160):
    per input token, every char n-gram in emission order — for each start
    offset, gram sizes min..max, then the next offset. preserve_original
    keeps tokens shorter than min_n (emitted alone, :87-92) and appends
    tokens longer than max_n after their grams (:110-117)."""
    if min_n < 1 or min_n > max_n:
        raise ValueError("ngram sizes need 1 <= min_n <= max_n")
    out = []
    for t in terms:
        L = len(t)
        if L < min_n:
            if preserve_original:
                out.append(t)
            continue
        for pos in range(L):
            for n in range(min_n, max_n + 1):
                if pos + n <= L:
                    out.append(t[pos:pos + n])
        if preserve_original and L > max_n:
            out.append(t)
    return out


def edge_ngram_tokens(
    terms: list, min_n: int = 1, max_n: int = 2, preserve_original: bool = False
) -> list:
    """EdgeNGramTokenFilter (analysis/ngram/EdgeNGramTokenFilter.java:
    60-130): per input token, the front-anchored grams of sizes min..max;
    preserve_original keeps shorter-than-min tokens and appends
    longer-than-max originals after their grams."""
    if min_n < 1 or min_n > max_n:
        raise ValueError("edge ngram sizes need 1 <= min_n <= max_n")
    out = []
    for t in terms:
        L = len(t)
        if L < min_n:
            if preserve_original:
                out.append(t)
            continue
        for n in range(min_n, min(max_n, L) + 1):
            out.append(t[:n])
        if preserve_original and L > max_n:
            out.append(t)
    return out


def ngram_series(
    texts: pd.Series,
    cfg: AnalyzerConfig = STANDARD,
    min_n: int = 1,
    max_n: int = 2,
    edge: bool = False,
    preserve_original: bool = False,
) -> pd.Series:
    """Analyze then n-gram each row — Series[str] → Series[list[str]]:
    the (Edge)NGram analyzer-chain composition a substring/prefix-search
    field indexes (the filters compose AFTER stop filtering, like
    ShingleFilter)."""
    fn = edge_ngram_tokens if edge else ngram_tokens
    return analyze_series(texts, cfg).map(
        lambda t: fn(t, min_n, max_n, preserve_original)
    )


# DelimitedPayloadTokenFilter (analysis/payloads/
# DelimitedPayloadTokenFilter.java + FloatEncoder.java): `token|2.5`
# attaches payload 2.5 to `token`. The annotation must terminate the
# token (delimiter is a non-word char) and be followed by whitespace or
# end-of-text, like the whitespace-tokenized form the reference filter
# consumes. Unannotated tokens carry the null-payload default 1.0
# (PayloadDecoder.FLOAT_DECODER's null -> 1 convention).
_PAYLOAD_ANNOT = re.compile(r"\|(-?\d+(?:\.\d+)?)(?=\s|$)")


def parse_delimited_payloads(text: str) -> tuple[str, np.ndarray]:
    """One doc's annotated text → (clean_text, float32 payload array
    aligned with the clean text's RAW token positions). Token counting is
    per-part incremental: an annotation always ends a token and is
    followed by non-word input, so tokens never span part boundaries."""
    if not text or "|" not in text:
        n = len(_TOKEN_RE.findall(text or ""))
        return text or "", np.ones(n, dtype=np.float32)
    parts = []
    pays = []  # (raw_pos, value)
    tok_count = 0
    last = 0
    for m in _PAYLOAD_ANNOT.finditer(text):
        seg = text[last:m.start()]
        parts.append(seg)
        tok_count += len(_TOKEN_RE.findall(seg))
        if tok_count > 0:
            pays.append((tok_count - 1, float(m.group(1))))
        last = m.end()
    tail = text[last:]
    parts.append(tail)
    tok_count += len(_TOKEN_RE.findall(tail))
    out = np.ones(tok_count, dtype=np.float32)
    for pos, v in pays:
        out[pos] = np.float32(v)
    return "".join(parts), out
