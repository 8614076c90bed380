"""Light analysis chains — Spanish, Portuguese, Italian, Swedish and
Hungarian analyzers' filter stacks re-implemented from the published
algorithms (NOT a port):

  - SpanishAnalyzer / PortugueseAnalyzer / ItalianAnalyzer chains
    (analysis/common/src/java/org/apache/lucene/analysis/{es,pt,it}/
    *Analyzer.java): StandardTokenizer -> LowerCaseFilter ->
    StopFilter(snowball stop list) -> *LightStemFilter. (The Italian
    reference chain also runs ElisionFilter; the engine reuses the
    shared elision helper with the Italian article set.)
  - The stemmers are Jacques Savoy's UniNE LIGHT stemmers ("Light
    Stemming Approaches for the French, Portuguese, German and
    Hungarian Languages", SAC 2006, and the UniNE report for
    Spanish/Italian): accent folding + final-vowel / plural /
    feminine-form reduction. Reference twins: es/SpanishLightStemmer
    .java:35-80, pt/PortugueseLightStemmer.java:35-215,
    it/ItalianLightStemmer.java:35-95.

The full canonical vocabularies (the reference's eslighttestdata.zip /
ptlighttestdata.zip / itlighttestdata.zip) pin all three stemmers in
tests/test_romance.py. Stop lists are the published snowball lists the
reference ships verbatim (snowball/{spanish,portuguese,italian}_stop
.txt).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SPANISH_STOP_WORDS = frozenset({
    "a", "al", "algo", "algunas", "algunos", "ante", "antes", "como",
    "con", "contra", "cual", "cuando", "de", "del", "desde", "donde",
    "durante", "e", "el", "ella", "ellas", "ellos", "en", "entre",
    "era", "erais", "eran", "eras", "eres", "es", "esa", "esas", "ese",
    "eso", "esos", "esta", "estaba", "estabais", "estaban", "estabas",
    "estad", "estada", "estadas", "estado", "estados", "estamos",
    "estando", "estar", "estaremos", "estará", "estarán", "estarás",
    "estaré", "estaréis", "estaría", "estaríais", "estaríamos",
    "estarían", "estarías", "estas", "este", "estemos", "esto", "estos",
    "estoy", "estuve", "estuviera", "estuvierais", "estuvieran",
    "estuvieras", "estuvieron", "estuviese", "estuvieseis",
    "estuviesen", "estuvieses", "estuvimos", "estuviste", "estuvisteis",
    "estuviéramos", "estuviésemos", "estuvo", "está", "estábamos",
    "estáis", "están", "estás", "esté", "estéis", "estén", "estés",
    "fue", "fuera", "fuerais", "fueran", "fueras", "fueron", "fuese",
    "fueseis", "fuesen", "fueses", "fui", "fuimos", "fuiste",
    "fuisteis", "fuéramos", "fuésemos", "ha", "habida", "habidas",
    "habido", "habidos", "habiendo", "habremos", "habrá", "habrán",
    "habrás", "habré", "habréis", "habría", "habríais", "habríamos",
    "habrían", "habrías", "habéis", "había", "habíais", "habíamos",
    "habían", "habías", "han", "has", "hasta", "hay", "haya", "hayamos",
    "hayan", "hayas", "hayáis", "he", "hemos", "hube", "hubiera",
    "hubierais", "hubieran", "hubieras", "hubieron", "hubiese",
    "hubieseis", "hubiesen", "hubieses", "hubimos", "hubiste",
    "hubisteis", "hubiéramos", "hubiésemos", "hubo", "la", "las", "le",
    "les", "lo", "los", "me", "mi", "mis", "mucho", "muchos", "muy",
    "más", "mí", "mía", "mías", "mío", "míos", "nada", "ni", "no",
    "nos", "nosotras", "nosotros", "nuestra", "nuestras", "nuestro",
    "nuestros", "o", "os", "otra", "otras", "otro", "otros", "para",
    "pero", "poco", "por", "porque", "que", "quien", "quienes", "qué",
    "se", "sea", "seamos", "sean", "seas", "seremos", "será", "serán",
    "serás", "seré", "seréis", "sería", "seríais", "seríamos", "serían",
    "serías", "seáis", "sido", "siendo", "sin", "sobre", "sois",
    "somos", "son", "soy", "su", "sus", "suya", "suyas", "suyo",
    "suyos", "sí", "también", "tanto", "te", "tendremos", "tendrá",
    "tendrán", "tendrás", "tendré", "tendréis", "tendría", "tendríais",
    "tendríamos", "tendrían", "tendrías", "tened", "tenemos", "tenga",
    "tengamos", "tengan", "tengas", "tengo", "tengáis", "tenida",
    "tenidas", "tenido", "tenidos", "teniendo", "tenéis", "tenía",
    "teníais", "teníamos", "tenían", "tenías", "ti", "tiene", "tienen",
    "tienes", "todo", "todos", "tu", "tus", "tuve", "tuviera",
    "tuvierais", "tuvieran", "tuvieras", "tuvieron", "tuviese",
    "tuvieseis", "tuviesen", "tuvieses", "tuvimos", "tuviste",
    "tuvisteis", "tuviéramos", "tuviésemos", "tuvo", "tuya", "tuyas",
    "tuyo", "tuyos", "tú", "un", "una", "uno", "unos", "vosotras",
    "vosotros", "vuestra", "vuestras", "vuestro", "vuestros", "y", "ya",
    "yo", "él", "éramos",
})

PORTUGUESE_STOP_WORDS = frozenset({
    "a", "ao", "aos", "aquela", "aquelas", "aquele", "aqueles",
    "aquilo", "as", "até", "com", "como", "da", "das", "de", "dela",
    "delas", "dele", "deles", "depois", "do", "dos", "e", "ela", "elas",
    "ele", "eles", "em", "entre", "era", "eram", "essa", "essas",
    "esse", "esses", "esta", "estamos", "estas", "estava", "estavam",
    "este", "esteja", "estejam", "estejamos", "estes", "esteve",
    "estive", "estivemos", "estiver", "estivera", "estiveram",
    "estiverem", "estivermos", "estivesse", "estivessem", "estivéramos",
    "estivéssemos", "estou", "está", "estávamos", "estão", "eu", "foi",
    "fomos", "for", "fora", "foram", "forem", "formos", "fosse",
    "fossem", "fui", "fôramos", "fôssemos", "haja", "hajam", "hajamos",
    "havemos", "hei", "houve", "houvemos", "houver", "houvera",
    "houveram", "houverei", "houverem", "houveremos", "houveria",
    "houveriam", "houvermos", "houverá", "houverão", "houveríamos",
    "houvesse", "houvessem", "houvéramos", "houvéssemos", "há", "hão",
    "isso", "isto", "já", "lhe", "lhes", "mais", "mas", "me", "mesmo",
    "meu", "meus", "minha", "minhas", "muito", "na", "nas", "nem", "no",
    "nos", "nossa", "nossas", "nosso", "nossos", "num", "numa", "não",
    "nós", "o", "os", "ou", "para", "pela", "pelas", "pelo", "pelos",
    "por", "qual", "quando", "que", "quem", "se", "seja", "sejam",
    "sejamos", "sem", "serei", "seremos", "seria", "seriam", "será",
    "serão", "seríamos", "seu", "seus", "somos", "sou", "sua", "suas",
    "são", "só", "também", "te", "tem", "temos", "tenha", "tenham",
    "tenhamos", "tenho", "terei", "teremos", "teria", "teriam", "terá",
    "terão", "teríamos", "teu", "teus", "teve", "tinha", "tinham",
    "tive", "tivemos", "tiver", "tivera", "tiveram", "tiverem",
    "tivermos", "tivesse", "tivessem", "tivéramos", "tivéssemos", "tu",
    "tua", "tuas", "tém", "tínhamos", "um", "uma", "você", "vocês",
    "vos", "à", "às", "éramos",
})

ITALIAN_STOP_WORDS = frozenset({
    "a", "abbia", "abbiamo", "abbiano", "abbiate", "ad", "agl", "agli",
    "ai", "al", "all", "alla", "alle", "allo", "anche", "avemmo",
    "avendo", "avesse", "avessero", "avessi", "avessimo", "aveste",
    "avesti", "avete", "aveva", "avevamo", "avevano", "avevate",
    "avevi", "avevo", "avrai", "avranno", "avrebbe", "avrebbero",
    "avrei", "avremmo", "avremo", "avreste", "avresti", "avrete",
    "avrà", "avrò", "avuta", "avute", "avuti", "avuto", "c", "che",
    "chi", "ci", "coi", "col", "come", "con", "contro", "cui", "da",
    "dagl", "dagli", "dai", "dal", "dall", "dalla", "dalle", "dallo",
    "degl", "degli", "dei", "del", "dell", "della", "delle", "dello",
    "di", "dov", "dove", "e", "ebbe", "ebbero", "ebbi", "ed", "era",
    "erano", "eravamo", "eravate", "eri", "ero", "essendo", "faccia",
    "facciamo", "facciano", "facciate", "faccio", "facemmo", "facendo",
    "facesse", "facessero", "facessi", "facessimo", "faceste",
    "facesti", "faceva", "facevamo", "facevano", "facevate", "facevi",
    "facevo", "fai", "fanno", "farai", "faranno", "farebbe",
    "farebbero", "farei", "faremmo", "faremo", "fareste", "faresti",
    "farete", "farà", "farò", "fece", "fecero", "feci", "fosse",
    "fossero", "fossi", "fossimo", "foste", "fosti", "fu", "fui",
    "fummo", "furono", "gli", "ha", "hai", "hanno", "ho", "i", "il",
    "in", "io", "l", "la", "le", "lei", "li", "lo", "loro", "lui", "ma",
    "mi", "mia", "mie", "miei", "mio", "ne", "negl", "negli", "nei",
    "nel", "nell", "nella", "nelle", "nello", "noi", "non", "nostra",
    "nostre", "nostri", "nostro", "o", "per", "perché", "più", "quale",
    "quanta", "quante", "quanti", "quanto", "quella", "quelle",
    "quelli", "quello", "questa", "queste", "questi", "questo", "sarai",
    "saranno", "sarebbe", "sarebbero", "sarei", "saremmo", "saremo",
    "sareste", "saresti", "sarete", "sarà", "sarò", "se", "sei", "si",
    "sia", "siamo", "siano", "siate", "siete", "sono", "sta", "stai",
    "stando", "stanno", "starai", "staranno", "starebbe", "starebbero",
    "starei", "staremmo", "staremo", "stareste", "staresti", "starete",
    "starà", "starò", "stava", "stavamo", "stavano", "stavate", "stavi",
    "stavo", "stemmo", "stesse", "stessero", "stessi", "stessimo",
    "steste", "stesti", "stette", "stettero", "stetti", "stia",
    "stiamo", "stiano", "stiate", "sto", "su", "sua", "sue", "sugl",
    "sugli", "sui", "sul", "sull", "sulla", "sulle", "sullo", "suo",
    "suoi", "ti", "tra", "tu", "tua", "tue", "tuo", "tuoi", "tutti",
    "tutto", "un", "una", "uno", "vi", "voi", "vostra", "vostre",
    "vostri", "vostro", "è",
})

SWEDISH_STOP_WORDS = frozenset({
    "alla", "allt", "att", "av", "blev", "bli", "blir", "blivit", "de",
    "dem", "den", "denna", "deras", "dess", "dessa", "det", "detta",
    "dig", "din", "dina", "ditt", "du", "där", "då", "efter", "ej",
    "eller", "en", "er", "era", "ert", "ett", "från", "för", "ha",
    "hade", "han", "hans", "har", "henne", "hennes", "hon", "honom",
    "hur", "här", "i", "icke", "ingen", "inom", "inte", "jag", "ju",
    "kan", "kunde", "man", "med", "mellan", "men", "mig", "min", "mina",
    "mitt", "mot", "mycket", "ni", "nu", "när", "någon", "något",
    "några", "och", "om", "oss", "på", "samma", "sedan", "sig", "sin",
    "sina", "sitta", "själv", "skulle", "som", "så", "sådan", "sådana",
    "sådant", "till", "under", "upp", "ut", "utan", "vad", "var",
    "vara", "varför", "varit", "varje", "vars", "vart", "vem", "vi",
    "vid", "vilka", "vilkas", "vilken", "vilket", "vår", "våra", "vårt",
    "än", "är", "åt", "över",
})

HUNGARIAN_STOP_WORDS = frozenset({
    "a", "abban", "ahhoz", "ahogy", "ahol", "aki", "akik", "akkor",
    "alatt", "amely", "amelyek", "amelyekben", "amelyeket", "amelyet",
    "amelynek", "ami", "amikor", "amit", "amolyan", "amíg", "annak",
    "arra", "arról", "az", "azok", "azon", "azonban", "azt", "aztán",
    "azután", "azzal", "azért", "be", "belül", "benne", "bár", "cikk",
    "cikkek", "cikkeket", "csak", "de", "e", "ebben", "eddig", "egy",
    "egyes", "egyetlen", "egyik", "egyre", "egyéb", "egész", "ehhez",
    "ekkor", "el", "ellen", "első", "elég", "elő", "először", "előtt",
    "emilyen", "ennek", "erre", "ez", "ezek", "ezen", "ezt", "ezzel",
    "ezért", "fel", "felé", "hanem", "hiszen", "hogy", "hogyan", "igen",
    "ill", "ill.", "illetve", "ilyen", "ilyenkor", "ismét", "ison",
    "itt", "jobban", "jó", "jól", "kell", "kellett", "keressünk",
    "keresztül", "ki", "kívül", "között", "közül", "legalább", "legyen",
    "lehet", "lehetett", "lenne", "lenni", "lesz", "lett", "maga",
    "magát", "majd", "meg", "mellett", "mely", "melyek", "mert", "mi",
    "mikor", "milyen", "minden", "mindenki", "mindent", "mindig",
    "mint", "mintha", "mit", "mivel", "miért", "most", "már", "más",
    "másik", "még", "míg", "nagy", "nagyobb", "nagyon", "ne", "nekem",
    "neki", "nem", "nincs", "néha", "néhány", "nélkül", "olyan", "ott",
    "pedig", "persze", "rá", "s", "saját", "sem", "semmi", "sok",
    "sokat", "sokkal", "szemben", "szerint", "szinte", "számára",
    "talán", "tehát", "teljes", "tovább", "továbbá", "több", "ugyanis",
    "utolsó", "után", "utána", "vagy", "vagyis", "vagyok", "valaki",
    "valami", "valamint", "való", "van", "vannak", "vele", "vissza",
    "viszont", "volna", "volt", "voltak", "voltam", "voltunk", "által",
    "általában", "át", "én", "éppen", "és", "így", "össze", "úgy", "új",
    "újabb", "újra", "ő", "ők", "őket",
})

_ES_IT_FOLD = str.maketrans(
    "àáâäòóôöèéêëùúûüìíîï",
    "aaaaoooo" "eeee" "uuuu" "iiii",
)
# Portuguese folds the nasal/cedilla letters too, AFTER suffix removal
_PT_FOLD = str.maketrans(
    "àáâäãòóôöõèéêëùúûüìíîïç",
    "aaaaa" "ooooo" "eeee" "uuuu" "iiii" "c",
)


def spanish_light_stem(s: str) -> str:
    """es/SpanishLightStemmer.java:35-80 — fold accents, strip one final
    o/a/e, or the plural forms -eses/-ces(->z)/-os/-as/-es."""
    if len(s) < 5:
        return s
    s = s.translate(_ES_IT_FOLD)
    if s[-1] in "oae":
        return s[:-1]
    if s[-1] == "s":
        if s[-4:-1] == "ese":
            return s[:-2]
        if s[-3:-1] == "ce":
            return s[:-3] + "z"
        if s[-2] in "oae":
            return s[:-2]
    return s


def italian_light_stem(s: str) -> str:
    """it/ItalianLightStemmer.java:35-95 — fold accents, then strip the
    final vowel (two chars for the -ie/-he/-hi/-ii/-ia/-io plural and
    hard-consonant forms)."""
    if len(s) < 6:
        return s
    s = s.translate(_ES_IT_FOLD)
    last, prev = s[-1], s[-2]
    if last == "e":
        return s[:-2] if prev in "ih" else s[:-1]
    if last == "i":
        return s[:-2] if prev in "hi" else s[:-1]
    if last == "a":
        return s[:-2] if prev == "i" else s[:-1]
    if last == "o":
        return s[:-2] if prev == "i" else s[:-1]
    return s


def _pt_remove_suffix(s: str) -> str:
    """pt/PortugueseLightStemmer.java:64-120 removeSuffix."""
    n = len(s)
    if n > 4 and s.endswith("es") and s[-3] in "rslz":
        return s[:-2]
    if n > 3 and s.endswith("ns"):
        return s[:-2] + "m"
    if n > 4 and (s.endswith("eis") or s.endswith("éis")):
        return s[:-3] + "el"
    if n > 4 and s.endswith("ais"):
        return s[:-3] + "al"
    if n > 4 and s.endswith("óis"):
        return s[:-3] + "ol"
    if n > 4 and s.endswith("is"):
        return s[:-1] + "l"
    if n > 3 and (s.endswith("ões") or s.endswith("ães")):
        return s[:-3] + "ão"
    if n > 6 and s.endswith("mente"):
        return s[:-5]
    if n > 3 and s.endswith("s"):
        return s[:-1]
    return s


def _pt_norm_feminine(s: str) -> str:
    """pt/PortugueseLightStemmer.java:122-170 normFeminine."""
    n = len(s)
    if n > 7 and (s.endswith("inha") or s.endswith("iaca")
                  or s.endswith("eira")):
        return s[:-1] + "o"
    if n > 6:
        if (s.endswith("osa") or s.endswith("ica") or s.endswith("ida")
                or s.endswith("ada") or s.endswith("iva")
                or s.endswith("ama")):
            return s[:-1] + "o"
        if s.endswith("ona"):
            return s[:-3] + "ão"
        if s.endswith("ora"):
            return s[:-1]
        if s.endswith("esa"):
            return s[:-3] + "ês"
        if s.endswith("na"):
            return s[:-1] + "o"
    return s


def portuguese_light_stem(s: str) -> str:
    """pt/PortugueseLightStemmer.java:35-62 — suffix removal, feminine
    normalization, final-vowel strip, THEN accent/nasal/cedilla fold
    (the fold runs last in the reference, over the truncated stem)."""
    if len(s) < 4:
        return s
    s = _pt_remove_suffix(s)
    if len(s) > 3 and s.endswith("a"):
        s = _pt_norm_feminine(s)
    if len(s) > 4 and s[-1] in "eao":
        s = s[:-1]
    return s.translate(_PT_FOLD)


# Italian DEFAULT_ARTICLES (it/ItalianAnalyzer.java:47-50) for the
# shared elision helper
ITALIAN_ARTICLES = frozenset({
    "c", "l", "all", "dall", "dell", "nell", "sull", "coll", "pell",
    "gl", "agl", "dagl", "degl", "negl", "sugl", "un", "m", "t", "s",
    "v", "d",
})



def swedish_light_stem(s: str) -> str:
    """sv/SwedishLightStemmer.java:35-80 — definite-article / plural /
    comparative suffix strips, longest class first (no accent folding:
    the reference keeps Swedish å/ä/ö)."""
    if len(s) > 4 and s.endswith("s"):
        s = s[:-1]
    n = len(s)
    if n > 7 and (s.endswith("elser") or s.endswith("heten")):
        return s[:-5]
    if n > 6 and s[-4:] in ("arne", "erna", "ande", "else", "aste",
                            "orna", "aren"):
        return s[:-4]
    if n > 5 and s[-3:] in ("are", "ast", "het"):
        return s[:-3]
    if n > 4 and s[-2:] in ("ar", "er", "or", "en", "at", "te", "et"):
        return s[:-2]
    if n > 3 and s[-1] in "taen":
        return s[:-1]
    return s


_HU_FOLD = str.maketrans("áëéíóőõöúűũûü", "aeei" + "oooo" + "uuuuu")
_HU_VOWELS = frozenset("aeiouy")


def _hu_remove_case(s: str) -> str:
    """hu/HungarianLightStemmer.java:55-105 removeCase."""
    n = len(s)
    if n > 6 and s.endswith("kent"):
        return s[:-4]
    if n > 5:
        if s[-3:] in ("nak", "nek", "val", "vel", "ert", "rol", "ban",
                      "ben", "bol", "nal", "nel", "hoz", "hez", "tol"):
            return s[:-3]
        if s[-2:] in ("al", "el"):
            if s[-3] not in _HU_VOWELS and s[-3] == s[-4]:
                return s[:-3]
    if n > 4:
        if s[-2:] in ("at", "et", "ot", "va", "ve", "ra", "re", "ba",
                      "be", "ul", "ig"):
            return s[:-2]
        if s[-2:] in ("on", "en") and s[-3] not in _HU_VOWELS:
            return s[:-2]
        if s[-1] in "tn":
            return s[:-1]
        if s[-1] in "ae" and s[-2] == s[-3] and s[-2] not in _HU_VOWELS:
            return s[:-2]
    return s


def _hu_remove_possessive(s: str) -> str:
    """hu/HungarianLightStemmer.java:107-160 removePossessive."""
    n = len(s)
    if n > 6:
        if s[-5] not in _HU_VOWELS and s[-4:] in ("atok", "otok", "etek"):
            return s[:-4]
        if s[-4:] in ("itek", "itok"):
            return s[:-4]
    if n > 5:
        if s[-4] not in _HU_VOWELS and s[-3:] in ("unk", "tok", "tek"):
            return s[:-3]
        if s[-4] in _HU_VOWELS and s.endswith("juk"):
            return s[:-3]
        if s.endswith("ink"):
            return s[:-3]
    if n > 4:
        if s[-3] not in _HU_VOWELS and s[-2:] in ("am", "em", "om", "ad",
                                                  "ed", "od", "uk"):
            return s[:-2]
        if s[-3] in _HU_VOWELS and s[-2:] in ("nk", "ja", "je"):
            return s[:-2]
        if s[-2:] in ("im", "id", "ik"):
            return s[:-2]
    if n > 3:
        if s[-1] in "ae" and s[-2] not in _HU_VOWELS:
            return s[:-1]
        if s[-1] in "md" and s[-2] in _HU_VOWELS:
            return s[:-1]
        if s[-1] == "i":
            return s[:-1]
    return s


def hungarian_light_stem(s: str) -> str:
    """hu/HungarianLightStemmer.java:36-53 — fold accents, remove case
    ending, possessive, plural (-k with the a/o/e fallthrough), then a
    final-vowel normalize."""
    s = s.translate(_HU_FOLD)
    s = _hu_remove_case(s)
    s = _hu_remove_possessive(s)
    if len(s) > 3 and s.endswith("k"):  # removePlural
        s = s[:-2] if s[-2] in "aoe" and len(s) > 4 else s[:-1]
    if len(s) > 3 and s[-1] in "aeio":  # normalize
        s = s[:-1]
    return s




FINNISH_STOP_WORDS = frozenset({
    "ei", "eivät", "emme", "en", "et", "ette", "että", "he", "heidän",
    "heidät", "heihin", "heille", "heillä", "heiltä", "heissä",
    "heistä", "heitä", "hän", "häneen", "hänelle", "hänellä", "häneltä",
    "hänen", "hänessä", "hänestä", "hänet", "häntä", "itse", "ja",
    "johon", "joiden", "joihin", "joiksi", "joilla", "joille", "joilta",
    "joina", "joissa", "joista", "joita", "joka", "joksi", "jolla",
    "jolle", "jolta", "jona", "jonka", "jos", "jossa", "josta", "jota",
    "jotka", "kanssa", "keiden", "keihin", "keiksi", "keille", "keillä",
    "keiltä", "keinä", "keissä", "keistä", "keitä", "keneen", "keneksi",
    "kenelle", "kenellä", "keneltä", "kenen", "kenenä", "kenessä",
    "kenestä", "kenet", "ketkä", "ketä", "koska", "kuin", "kuka", "kun",
    "me", "meidän", "meidät", "meihin", "meille", "meillä", "meiltä",
    "meissä", "meistä", "meitä", "mihin", "miksi", "mikä", "mille",
    "millä", "miltä", "minkä", "minua", "minulla", "minulle", "minulta",
    "minun", "minussa", "minusta", "minut", "minuun", "minä", "missä",
    "mistä", "mitkä", "mitä", "mukaan", "mutta", "ne", "niiden",
    "niihin", "niiksi", "niille", "niillä", "niiltä", "niin", "niinä",
    "niissä", "niistä", "niitä", "noiden", "noihin", "noiksi", "noilla",
    "noille", "noilta", "noin", "noina", "noissa", "noista", "noita",
    "nuo", "nyt", "näiden", "näihin", "näiksi", "näille", "näillä",
    "näiltä", "näinä", "näissä", "näistä", "näitä", "nämä", "ole",
    "olemme", "olen", "olet", "olette", "oli", "olimme", "olin",
    "olisi", "olisimme", "olisin", "olisit", "olisitte", "olisivat",
    "olit", "olitte", "olivat", "olla", "olleet", "ollut", "on", "ovat",
    "poikki", "se", "sekä", "sen", "siihen", "siinä", "siitä", "siksi",
    "sille", "sillä", "siltä", "sinua", "sinulla", "sinulle", "sinulta",
    "sinun", "sinussa", "sinusta", "sinut", "sinuun", "sinä", "sitä",
    "tai", "tallä", "te", "teidän", "teidät", "teihin", "teille",
    "teillä", "teiltä", "teissä", "teistä", "teitä", "tuo", "tuohon",
    "tuoksi", "tuolla", "tuolle", "tuolta", "tuon", "tuona", "tuossa",
    "tuosta", "tuotä", "tähän", "täksi", "tälle", "tältä", "tämä",
    "tämän", "tänä", "tässä", "tästä", "tätä", "vaan", "vai", "vaikka",
    "yli",
})


_FI_FOLD = str.maketrans("äåö", "aao")
_FI_VOWELS = frozenset("aeiouy")


def _fi_step1(s: str) -> str:
    """fi/FinnishLightStemmer.java:55-70 step1 (recursive -kin/-ko)."""
    if len(s) > 8:
        if s.endswith("kin"):
            return _fi_step1(s[:-3])
        if s.endswith("ko"):
            return _fi_step1(s[:-2])
    if len(s) > 11:
        if s.endswith("dellinen"):
            return s[:-8]
        if s.endswith("dellisuus"):
            return s[:-9]
    return s


def _fi_step2(s: str) -> str:
    n = len(s)
    if n > 5:
        if s[-3:] in ("lla", "tse", "sti"):
            return s[:-3]
        if s.endswith("ni"):
            return s[:-2]
        if s.endswith("aa"):
            return s[:-1]
    return s


def _fi_step3(s: str) -> str:
    n = len(s)
    if n > 8:
        if s.endswith("nnen"):
            return s[:-4] + "s"
        if s.endswith("ntena"):
            return s[:-5] + "s"
        if s.endswith("tten"):
            return s[:-4]
        if s.endswith("eiden"):
            return s[:-5]
    if n > 6:
        if s[-4:] in ("neen", "niin", "seen", "teen", "inen"):
            return s[:-4]
        if s[-3] == "h" and s[-2] in _FI_VOWELS and s[-1] == "n":
            return s[:-3]
        if s.endswith("den"):
            return s[:-3] + "s"
        if s.endswith("ksen"):
            return s[:-4] + "s"
        if s[-3:] in ("ssa", "sta", "lla", "lta", "tta", "ksi", "lle"):
            return s[:-3]
    if n > 5:
        if s[-2:] in ("na", "ne"):
            return s[:-2]
        if s.endswith("nei"):
            return s[:-3]
    if n > 4:
        if s[-2:] in ("ja", "ta"):
            return s[:-2]
        if s[-1] == "a":
            return s[:-1]
        if s[-1] == "n" and s[-2] in _FI_VOWELS:
            return s[:-2]
        if s[-1] == "n":
            return s[:-1]
    return s


def _fi_norm1(s: str) -> str:
    if len(s) > 5 and s.endswith("hde"):
        s = s[:-3] + "ksi"  # in-place rewrite, the checks below continue
    if len(s) > 4 and (s.endswith("ei") or s.endswith("at")):
        return s[:-2]
    if len(s) > 3 and s[-1] in "tsjeai":
        return s[:-1]
    return s


def _fi_norm2(s: str) -> str:
    if len(s) > 8 and s[-1] in "eou":
        s = s[:-1]
    if len(s) > 4:
        if s[-1] == "i":
            s = s[:-1]
        if len(s) > 4:
            # collapse consecutive duplicate k/p/t anywhere in the stem
            out = [s[0]]
            for c in s[1:]:
                if c == out[-1] and c in "kpt":
                    continue
                out.append(c)
            s = "".join(out)
    return s


def finnish_light_stem(s: str) -> str:
    """fi/FinnishLightStemmer.java:35-53 — fold a-umlauts, recursive
    clitic strip, adverb/case endings, then two normalize passes (incl.
    the kpt-gemination collapse)."""
    if len(s) < 4:
        return s
    s = s.translate(_FI_FOLD)
    return _fi_norm2(_fi_norm1(_fi_step3(_fi_step2(_fi_step1(s)))))




RUSSIAN_STOP_WORDS = frozenset({
    "а", "без", "более", "больше", "будет", "будто", "бы", "был",
    "была", "были", "было", "быть", "в", "вам", "вас", "вдруг", "ведь",
    "во", "вот", "впрочем", "все", "всегда", "всего", "всех", "всю",
    "вы", "где", "говорил", "да", "даже", "два", "для", "до", "другой",
    "его", "ее", "ей", "ему", "если", "есть", "еще", "ж", "же", "жизнь",
    "за", "зачем", "здесь", "и", "из", "или", "им", "иногда", "их", "к",
    "кажется", "как", "какая", "какой", "когда", "конечно", "кто",
    "куда", "ли", "лучше", "между", "меня", "мне", "много", "может",
    "можно", "мой", "моя", "мы", "на", "над", "надо", "наконец", "нас",
    "не", "него", "нее", "ней", "нельзя", "нет", "ни", "нибудь",
    "никогда", "ним", "них", "ничего", "но", "ну", "о", "об", "один",
    "он", "она", "они", "опять", "от", "перед", "по", "под", "после",
    "потом", "потому", "почти", "при", "про", "раз", "разве", "с",
    "сам", "свою", "себе", "себя", "сегодня", "сейчас", "сказал",
    "сказала", "сказать", "со", "совсем", "так", "такой", "там", "тебя",
    "тем", "теперь", "то", "тогда", "того", "тоже", "только", "том",
    "тот", "три", "тут", "ты", "у", "уж", "уже", "хорошо", "хоть",
    "чего", "человек", "чем", "через", "что", "чтоб", "чтобы", "чуть",
    "эти", "этого", "этой", "этом", "этот", "эту", "я",
})

_RU_CASE3 = ("иям", "иях", "оях", "ями", "оям", "оьв", "ами", "его",
             "ему", "ери", "ими", "ого", "ому", "ыми", "оев")
_RU_CASE2 = ("ая", "яя", "ях", "юю", "ах", "ею", "их", "ия", "ию", "ьв",
             "ою", "ую", "ям", "ых", "ея", "ам", "ем", "ей", "ём", "ев",
             "ий", "им", "ое", "ой", "ом", "ов", "ые", "ый", "ым", "ми")


def russian_light_stem(s: str) -> str:
    """ru/RussianLightStemmer.java:35-120 — case-ending removal then a
    soft-sign / -и / doubled-н normalize. Cyrillic end-to-end: the
    engine tokenizer (\\w+) handles it natively; the ASCII-only DuckDB
    token pattern cannot, so this chain is pinned by the canonical
    vocabulary + pytest e2e rather than a driver oracle entry."""
    n = len(s)
    if n > 6 and (s.endswith("иями") or s.endswith("оями")):
        s = s[:-4]
    elif n > 5 and s[-3:] in _RU_CASE3:
        s = s[:-3]
    elif n > 4 and s[-2:] in _RU_CASE2:
        s = s[:-2]
    elif n > 3 and s[-1] in "аеиоуйыяь":
        s = s[:-1]
    if len(s) > 3:  # normalize
        if s[-1] in "ьи":
            return s[:-1]
        if s[-1] == "н" and s[-2] == "н":
            return s[:-1]
    return s


_DE_MIN_FOLD = str.maketrans("äöü", "aou")


def german_minimal_stem(s: str) -> str:
    """de/GermanMinimalStemmer.java:35-70 (the UniNE MINIMAL variant —
    one plural-suffix pass, distinct from kernels/german.py's light
    chain): fold umlauts, strip -nen / -en/-se/-es/-er / single
    n/e/s/r."""
    if len(s) < 5:
        return s
    s = s.translate(_DE_MIN_FOLD)
    n = len(s)
    if n > 6 and s.endswith("nen"):
        return s[:-3]
    if n > 5 and s[-2:] in ("en", "se", "es", "er"):
        return s[:-2]
    if s[-1] in "nesr":
        return s[:-1]
    return s


def french_minimal_stem(s: str) -> str:
    """fr/FrenchMinimalStemmer.java:30-50 (UniNE minimal variant): the
    -aux -> -al rewrite, then at most one strip each of s/r/e/é and a
    final duplicate-letter collapse."""
    if len(s) < 6:
        return s
    if s[-1] == "x":
        if s[-3] == "a" and s[-2] == "u":
            return s[:-3] + "al"
        return s[:-1]
    if s[-1] == "s":
        s = s[:-1]
    if s[-1] == "r":
        s = s[:-1]
    if s[-1] == "e":
        s = s[:-1]
    if s[-1] == "é":
        s = s[:-1]
    if s[-1] == s[-2]:
        s = s[:-1]
    return s


NORWEGIAN_STOP_WORDS = frozenset({
    "alle", "at", "av", "bare", "begge", "ble", "blei", "bli", "blir",
    "blitt", "både", "båe", "da", "de", "deg", "dei", "deim", "deira",
    "deires", "dem", "den", "denne", "der", "dere", "deres", "det",
    "dette", "di", "din", "disse", "ditt", "du", "dykk", "dykkar", "då",
    "eg", "ein", "eit", "eitt", "eller", "elles", "en", "enn", "er",
    "et", "ett", "etter", "for", "fordi", "fra", "før", "ha", "hadde",
    "han", "hans", "har", "hennar", "henne", "hennes", "her", "hjå",
    "ho", "hoe", "honom", "hoss", "hossen", "hun", "hva", "hvem",
    "hver", "hvilke", "hvilken", "hvis", "hvor", "hvordan", "hvorfor",
    "i", "ikke", "ikkje", "ingen", "ingi", "inkje", "inn", "inni", "ja",
    "jeg", "kan", "kom", "korleis", "korso", "kun", "kunne", "kva",
    "kvar", "kvarhelst", "kven", "kvi", "kvifor", "man", "mange", "me",
    "med", "medan", "meg", "meget", "mellom", "men", "mi", "min",
    "mine", "mitt", "mot", "mykje", "ned", "no", "noe", "noen", "noka",
    "noko", "nokon", "nokor", "nokre", "nå", "når", "og", "også", "om",
    "opp", "oss", "over", "på", "samme", "seg", "selv", "si", "sia",
    "sidan", "siden", "sin", "sine", "sitt", "sjøl", "skal", "skulle",
    "slik", "so", "som", "somme", "somt", "så", "sånn", "til", "um",
    "upp", "ut", "uten", "var", "vart", "varte", "ved", "vere", "verte",
    "vi", "vil", "ville", "vore", "vors", "vort", "vår", "være", "vært",
    "å",
})


def norwegian_light_stem(s: str, bokmaal: bool = True,
                         nynorsk: bool = False) -> str:
    """no/NorwegianLightStemmer.java:55-150 — genitive strip then one
    suffix pass with Bokmål/Nynorsk-conditional endings."""
    if len(s) > 4 and s.endswith("s"):
        s = s[:-1]
    n = len(s)
    if n > 7 and ((bokmaal and (s.endswith("heter") or s.endswith("heten")))
                  or (nynorsk and s.endswith("heita"))):
        return s[:-5]
    if n > 8 and nynorsk and s[-6:] in ("heiter", "leiken", "leikar"):
        return s[:-6]
    if n > 5 and (s.endswith("dom") or (bokmaal and s.endswith("het"))):
        return s[:-3]
    if n > 6 and nynorsk and s[-4:] in ("heit", "semd", "leik"):
        return s[:-4]
    if n > 7 and s[-5:] in ("elser", "elsen"):
        return s[:-5]
    if n > 6 and ((bokmaal and s[-4:] in ("ende", "este", "eren"))
                  or (nynorsk and s[-4:] in ("ande", "aste", "aren"))
                  or s.endswith("else")):
        return s[:-4]
    if n > 5 and ((bokmaal and s[-3:] in ("ere", "est"))
                  or (nynorsk and s[-3:] in ("are", "ast", "ane"))
                  or s.endswith("ene")):
        return s[:-3]
    if n > 4 and (s[-2:] in ("er", "en", "et", "te")
                  or (nynorsk and s.endswith("ar"))
                  or (bokmaal and s.endswith("st"))):
        return s[:-2]
    if n > 3 and s[-1] in "aen":
        return s[:-1]
    return s


def norwegian_minimal_stem(s: str, bokmaal: bool = True,
                           nynorsk: bool = False) -> str:
    """no/NorwegianMinimalStemmer.java:40-75 — genitive strip + the
    noun-declension subset of the light pass."""
    if len(s) > 4 and s.endswith("s"):
        s = s[:-1]
    n = len(s)
    if n > 5 and (s.endswith("ene") or (nynorsk and s.endswith("ane"))):
        return s[:-3]
    if n > 4 and (s[-2:] in ("er", "en", "et")
                  or (nynorsk and s.endswith("ar"))):
        return s[:-2]
    if n > 3 and s[-1] in "ae":
        return s[:-1]
    return s


def _nb_light(s: str) -> str:
    return norwegian_light_stem(s, bokmaal=True, nynorsk=False)


def _nn_light(s: str) -> str:
    return norwegian_light_stem(s, bokmaal=False, nynorsk=True)


def _nb_minimal(s: str) -> str:
    return norwegian_minimal_stem(s, bokmaal=True, nynorsk=False)


def _nn_minimal(s: str) -> str:
    return norwegian_minimal_stem(s, bokmaal=False, nynorsk=True)


# Snowball programs ride the same 1:1 registry (kernels/snowball.py;
# vocab-pinned bit-exact like the UniNE families)
from .snowball import danish_stem as _da_snowball  # noqa: E402
from .snowball import dutch_term as _nl_snowball  # noqa: E402
from .snowball import english_stem as _en_snowball  # noqa: E402
from .snowball import romanian_stem as _ro_snowball  # noqa: E402
from .arabic import arabic_term as _ar_light  # noqa: E402
from .turkish import turkish_stem as _tr_snowball  # noqa: E402

LIGHT_STEMMERS = {
    "es": spanish_light_stem,
    "pt": portuguese_light_stem,
    "it": italian_light_stem,
    "sv": swedish_light_stem,
    "hu": hungarian_light_stem,
    "fi": finnish_light_stem,
    "ru": russian_light_stem,
    "de_min": german_minimal_stem,
    "fr_min": french_minimal_stem,
    "nb": _nb_light,
    "nn": _nn_light,
    "nb_min": _nb_minimal,
    "nn_min": _nn_minimal,
    "da": _da_snowball,
    "nl": _nl_snowball,
    "ro": _ro_snowball,
    "en": _en_snowball,
    "tr": _tr_snowball,
    "ar": _ar_light,
}


def light_stem(lang: str, word: str) -> str:
    return LIGHT_STEMMERS[lang](word)


def light_stem_array(lang: str, terms: np.ndarray) -> np.ndarray:
    """Per-UNIQUE-term stem, C-level gather back (porter.stem_array
    shape)."""
    if len(terms) == 0:
        return terms
    fn = LIGHT_STEMMERS[lang]
    codes, uniq = pd.factorize(pd.Series(terms, dtype=object), sort=False)
    mapped = np.asarray([fn(t) for t in uniq], dtype=object)
    return mapped[codes]
