"""Language-ID model data: character-trigram profiles + script ranges.

Classic Cavnar-Trenkle n-gram text categorization (public method,
"N-Gram-Based Text Categorization", 1994): each language is a
rank-ordered list of its most frequent character trigrams (spaces
included, text lowercased); a document is classified by minimum
out-of-place rank distance. Profiles below are compiled from public
letter/n-gram frequency knowledge for the 18 Latin-script languages;
non-Latin scripts are decided by Unicode block first (a far stronger
signal than n-grams).

DISTINCTIVE_CHARS gives per-language orthography markers (ã -> pt,
ß -> de, ...) used as additive evidence to separate close relatives
(es/pt, sv/no/da).
"""

from __future__ import annotations

# rank-ordered most-frequent trigrams per language (space-padded)
TRIGRAM_PROFILES: dict[str, list[str]] = {
    "en": [
        " th", "the", "he ", "ing", "ng ", " an", "and", "nd ", " of",
        "of ", " to", "to ", "ed ", " in", "ion", "on ", "ent", " co",
        "er ", "at ", "es ", " is", "is ", "tio", "ati", "for", " be",
        "ere", "her", "ter", " wh", "thi", " it", "was", "as ",
    ],
    "es": [
        " de", "de ", "os ", "la ", " la", " es", "es ", "el ", " el",
        "que", " qu", "ue ", "en ", " en", " co", "ent", "ció", "ión",
        "ón ", "ar ", "ado", " se", "er ", "as ", "con", "aci", "sta",
        " po", "por", "or ", "los", " lo", "del", "o d", "a d",
    ],
    "fr": [
        " de", "de ", "es ", "le ", " le", "ent", "nt ", " la", "la ",
        "et ", " et", "les", "ion", "que", " qu", "ue ", "re ", "ur ",
        " pa", "par", "our", "ous", " co", "con", "ans", "dan", " da",
        "ait", "men", "tio", "des", " un", "une", "eur", " po",
    ],
    "de": [
        "en ", "er ", "der", " de", "die", " di", "ie ", "ch ", "sch",
        " sc", "ein", " ei", "ine", "und", " un", "nd ", "ung", "ng ",
        "cht", "ich", "ht ", " ge", "gen", "ten", "ber", "den", " be",
        "ver", " ve", "hen", "das", " da", "ist", " is", "st ",
    ],
    "it": [
        " di", "di ", "to ", "la ", " la", "re ", " co", "che", " ch",
        "he ", "no ", "o d", "are", "ion", "zio", "ne ", "lle", "ell",
        "del", " de", "ent", "ta ", "per", " pe", "una", " un", "ato",
        "con", "ti ", "i d", "e d", "ia ", "azi", "men", "ere",
        "o a", "ano", "ndo", "nti", "tta",
    ],
    "pt": [
        " de", "de ", "os ", "ão ", "ção", "açã", " co", "que", " qu",
        "ue ", "da ", " da", "do ", " do", "es ", "ent", "em ", " em",
        "ara", "par", " pa", "com", "o d", "as ", "ma ", " se", "nto",
        "ade", "dad", " a ", "ras", "era", "ida", "men", "çõe",
    ],
    "nl": [
        "en ", "de ", " de", "et ", " he", "het", "an ", "van", " va",
        "een", " ee", "n d", "er ", "ijk", "sch", " ge", "ver", " ve",
        "ing", "ng ", "te ", " be", "oor", "aar", "den", "ede", " me",
        "met", "ten", " en", "ij ", "ijn", "zij", " zi", "at ",
    ],
    "sv": [
        "en ", "et ", "ar ", "att", " at", "tt ", "och", " oc", "ch ",
        "för", " fö", "ör ", "det", " de", "er ", "om ", " om", "ing",
        "ng ", " st", "som", " so", "na ", "til", " ti", "ill", "and",
        "nde", "de ", " ha", "har", "ans", "ter", " me", "med",
    ],
    "no": [
        "er ", "en ", "et ", "det", " de", "og ", " og", "til", " ti",
        "il ", "av ", " av", "ikk", "kke", "ing", "ene", " fo", "for",
        "or ", "som", " so", "om ", " ha", "har", "ar ", "ed ", " me",
        "med", "ter", "ere", " st", "den", " en", "ke ", "jon",
    ],
    "da": [
        "er ", "en ", "et ", "der", "det", " de", "og ", " og", "af ",
        " af", "til", " ti", "il ", "ede", "nde", "ige", "ske", " fo",
        "for", "or ", "som", " so", "om ", " ha", "har", "ar ", " me",
        "med", "rne", "ere", "de ", "ke ", "ikk", "kke", "ion",
    ],
    "fi": [
        "en ", "in ", "an ", "een", "ssa", " ja", "ja ", "sta", "aan",
        "lla", "ist", "itt", "tä ", "ää ", "ksi", "ine", "sen", "ett",
        "tta", "ta ", "on ", " on", "nen", "ten", "mis", "lli", "ell",
        "isi", "än ", "stä", " ka", " pa", "oit", "uks", "vat",
        "lle", "emm", "nne", "maa", "ia ",
    ],
    "pl": [
        "ie ", "nie", " ni", "ch ", "ego", "go ", " po", " pr", "rze",
        "prz", "ość", "ci ", "ać ", "ych", "owa", "wie", " w ", "na ",
        " na", "że ", " że", "ej ", "ia ", " za", "ani", "cze", "dzi",
        "ak ", "ów ", "ski", " je", "jes", "em ", "ede", " do",
    ],
    "cs": [
        " je", "je ", "ní ", "ch ", " po", " pr", "pro", "ou ", "na ",
        " na", "ho ", "ně ", "ení", "ter", "kte", " kt", "se ", " se",
        "sta", "ost", "pře", " př", "ře ", " ve", "ého", " do", "la ",
        "ce ", "en ", " ne", "by ", " by", "to ", " to", "ají",
    ],
    "ro": [
        " de", "de ", "ul ", "în ", " în", "re ", "are", " ca", "ea ",
        "le ", "și ", " și", "lor", "ui ", "ato", "tor", " pe", "ste",
        "est", " es", "at ", "ate", "ele", "ntr", "tru", "rea", "or ",
        "ilo", "ii ", "car", "tat", "pen", "ent", " co", "con",
    ],
    "hu": [
        " a ", "az ", " az", "ek ", "et ", "en ", "gy ", " me", "nek",
        "ség", "tt ", "ett", "sze", " sz", "ele", "nak", "ban", "an ",
        "hog", "ogy", "egy", " eg", "át ", "ás ", "ére", "ény", " fe",
        "tel", "és ", " és", "ere", "min", " mi", "ben", "lom",
    ],
    "tr": [
        "ir ", "bir", " bi", "lar", "ler", "an ", "in ", "ın ", "da ",
        "de ", "ve ", " ve", "eri", "ara", "nda", "ile", " il", "mek",
        "lik", "dır", " ka", " ya", "ında"[:3], "ini", "nın", "arı",
        "er ", "ek ", "iği", " ol", "ola", "yor", "uş ", "ası",
    ],
    "id": [
        "an ", "ang", "ng ", " me", "men", "kan", " ke", "ada", " ad",
        "dan", " da", "ah ", "nya", "ya ", " pe", "per", "ber", " be",
        "ata", "ini", " in", "di ", " di", "eng", "gan", "yan", " ya",
        "ter", " te", "ara", "ala", "aan", "ia ", "asi", "eri",
    ],
    "vi": [
        "ng ", " ng", "nh ", " th", " ch", " nh", "ông", "ười", " để",
        " tr", " cá", "các", "ác ", "ại ", "ủa ", "của", " củ", "iện",
        " về", "hôn", " à ", " là", "là ", "một", " mộ", "ột ", "ợc ",
        "ược", "đượ", " đư", "ến ", " vi", "việ", "ệc ", "ời ",
    ],
}

# orthography markers: char -> languages it points to (additive
# bonus, split across the candidates when shared)
DISTINCTIVE_CHARS: dict[str, tuple[str, ...]] = {
    "ã": ("pt",), "õ": ("pt",),
    "ñ": ("es",), "¿": ("es",), "¡": ("es",),
    "ß": ("de",),
    "ę": ("pl",), "ą": ("pl",), "ł": ("pl",), "ż": ("pl",),
    "ź": ("pl",), "ś": ("pl",),
    "ř": ("cs",), "ě": ("cs",), "ů": ("cs",),
    "ș": ("ro",), "ț": ("ro",), "ă": ("ro",),
    "ő": ("hu",), "ű": ("hu",),
    "ğ": ("tr",), "ş": ("tr",), "ı": ("tr",), "i\u0307": ("tr",),
    "ơ": ("vi",), "ư": ("vi",), "đ": ("vi",), "ạ": ("vi",),
    "ả": ("vi",), "ế": ("vi",), "ề": ("vi",), "ộ": ("vi",),
    "ợ": ("vi",), "ữ": ("vi",), "ị": ("vi",), "ọ": ("vi",),
    # shared Nordic / umlaut markers — weaker, but decisive against
    # unaccented languages (en/nl)
    "å": ("sv", "no", "da"),
    "ø": ("no", "da"),
    "æ": ("no", "da"),
    "ä": ("sv", "fi", "de"),
    "ö": ("sv", "fi", "de", "tr", "hu"),
    "ü": ("de", "tr", "hu"),
    "ç": ("fr", "pt", "tr"),
    "è": ("fr", "it"),
    "ê": ("fr", "pt"),
    "à": ("fr", "it", "pt"),
    "ì": ("it",),
    "ò": ("it",),
    "í": ("es", "pt", "cs", "hu"),
    "á": ("es", "pt", "cs", "hu"),
    "ý": ("cs",),
}

# Unicode-script decisions (checked before any trigram work).
# ORDER MATTERS: kana/hangul outrank CJK ideographs — Japanese and
# Korean text freely mixes them in (kanji/hanja), so the presence of
# kana anywhere means ja even if the string STARTS with ideographs.
SCRIPT_RANGES: list[tuple[int, int, str]] = [
    (0x3040, 0x30FF, "ja"),   # hiragana + katakana
    (0xAC00, 0xD7AF, "ko"),   # hangul syllables
    (0x4E00, 0x9FFF, "zh"),   # CJK unified ideographs
    (0x0600, 0x06FF, "ar"),   # arabic
    (0x0590, 0x05FF, "he"),   # hebrew
    (0x0370, 0x03FF, "el"),   # greek
    (0x0E00, 0x0E7F, "th"),   # thai
    (0x0900, 0x097F, "hi"),   # devanagari
    (0x0400, 0x04FF, "ru"),   # cyrillic (ru/uk split by chars below)
]

# cyrillic split: ukrainian-only vs russian-only letters
UK_CHARS = set("іїєґ")
RU_CHARS = set("ыэъё")

# high-frequency function/marker words per Latin-script language —
# word-level evidence that separates close relatives (fr/it, no/da,
# es/pt) where character trigrams overlap heavily. Chosen to be
# distinctive: shared forms (no/da 'ikke', 'mens') are omitted or
# listed for every language that uses them ('av' -> sv+no, 'af' ->
# da) so a hit never favors the wrong sibling.
FUNCTION_WORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "are", "was", "this", "that",
           "with", "should", "from", "while", "at", "after", "all",
           "will", "has", "have"),
    "es": ("el", "los", "las", "una", "por", "para", "con", "del",
           "es", "está", "sobre", "mientras"),
    "fr": ("le", "la", "les", "des", "du", "est", "et", "dans",
           "pour", "que", "une", "devrait", "nous", "ceci", "au",
           "aux", "avec", "pas", "ne", "se", "elle", "mais", "plus",
           "sur", "avant", "après"),
    "de": ("der", "die", "das", "und", "ist", "mit", "für", "von",
           "den", "ein", "eine", "über", "während", "zu", "nach",
           "dass", "nicht", "auch"),
    "it": ("il", "lo", "gli", "della", "nella", "per", "che",
           "è", "sono", "questo", "mentre", "sopra", "dal", "di",
           "al", "si", "non", "più", "anche", "dopo", "molto"),
    "pt": ("o", "os", "as", "uma", "do", "da", "dos", "para",
           "com", "em", "não", "é", "enquanto", "sobre"),
    "nl": ("de", "het", "een", "van", "en", "is", "voor", "met",
           "aan", "zijn", "te", "terwijl", "naar"),
    "sv": ("och", "att", "det", "som", "för", "på", "av", "är",
           "med", "en", "ett", "till", "medan", "från", "inte",
           "jag", "upp", "ska", "finns", "mycket", "när", "han",
           "hon", "efter", "vara", "den", "har"),
    "no": ("og", "det", "som", "på", "av", "er", "med", "en", "et",
           "til", "etter", "hva", "ikke", "å", "opp", "når", "mye",
           "noen", "skal", "være", "han", "hun", "om", "ut", "bare",
           "den", "har", "mens", "fra", "gutt", "jente", "veldig",
           "noe"),
    "da": ("og", "det", "som", "på", "af", "er", "med", "en", "et",
           "til", "efter", "hvad", "ikke", "at", "op", "når",
           "meget", "nogle", "skal", "være", "han", "hun", "om",
           "ud", "kun", "godt", "den", "har", "mens", "fra", "der",
           "dreng", "pige", "kigger", "noget"),
    "fi": ("ja", "on", "että", "oli", "mutta", "hän", "se", "tämä",
           "kun", "yli", "sen"),
    "pl": ("i", "w", "na", "się", "nie", "jest", "że", "do", "z",
           "dla", "gdy"),
    "cs": ("a", "v", "na", "se", "je", "že", "do", "s", "pro",
           "přes", "aby"),
    "ro": ("și", "în", "la", "de", "cu", "este", "pentru", "care",
           "sunt", "peste", "timp"),
    "hu": ("a", "az", "és", "hogy", "nem", "is", "egy", "van",
           "meg", "el", "kell"),
    "tr": ("ve", "bir", "bu", "için", "ile", "çok", "gibi", "daha",
           "olan", "üzerinden"),
    "id": ("yang", "dan", "di", "untuk", "dengan", "ini", "itu",
           "akan", "dari", "adalah", "para"),
    "vi": ("và", "của", "là", "không", "có", "được", "cho", "trong",
           "người", "đang", "một"),
}
