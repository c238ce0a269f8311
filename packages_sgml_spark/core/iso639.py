"""ISO 639 language-code tables (reference: iso_639.pl lookup
predicates — iso_639/2 mapping codes to language names).

Authored from the public ISO 639-1 standard (language codes are
public-domain facts); covers all 2-letter codes plus the common
3-letter (639-2/T) aliases used in web crawl metadata."""

ISO_639_1 = {
    "aa": "afar", "ab": "abkhazian", "af": "afrikaans", "ak": "akan",
    "am": "amharic", "an": "aragonese", "ar": "arabic", "as": "assamese",
    "av": "avaric", "ay": "aymara", "az": "azerbaijani", "ba": "bashkir",
    "be": "belarusian", "bg": "bulgarian", "bh": "bihari", "bi": "bislama",
    "bm": "bambara", "bn": "bengali", "bo": "tibetan", "br": "breton",
    "bs": "bosnian", "ca": "catalan", "ce": "chechen", "ch": "chamorro",
    "co": "corsican", "cr": "cree", "cs": "czech", "cu": "church slavic",
    "cv": "chuvash", "cy": "welsh", "da": "danish", "de": "german",
    "dv": "divehi", "dz": "dzongkha", "ee": "ewe", "el": "greek",
    "en": "english", "eo": "esperanto", "es": "spanish", "et": "estonian",
    "eu": "basque", "fa": "persian", "ff": "fulah", "fi": "finnish",
    "fj": "fijian", "fo": "faroese", "fr": "french", "fy": "frisian",
    "ga": "irish", "gd": "scottish gaelic", "gl": "galician",
    "gn": "guarani", "gu": "gujarati", "gv": "manx", "ha": "hausa",
    "he": "hebrew", "hi": "hindi", "ho": "hiri motu", "hr": "croatian",
    "ht": "haitian", "hu": "hungarian", "hy": "armenian", "hz": "herero",
    "ia": "interlingua", "id": "indonesian", "ie": "interlingue",
    "ig": "igbo", "ii": "sichuan yi", "ik": "inupiaq", "io": "ido",
    "is": "icelandic", "it": "italian", "iu": "inuktitut",
    "ja": "japanese", "jv": "javanese", "ka": "georgian", "kg": "kongo",
    "ki": "kikuyu", "kj": "kuanyama", "kk": "kazakh", "kl": "kalaallisut",
    "km": "khmer", "kn": "kannada", "ko": "korean", "kr": "kanuri",
    "ks": "kashmiri", "ku": "kurdish", "kv": "komi", "kw": "cornish",
    "ky": "kirghiz", "la": "latin", "lb": "luxembourgish", "lg": "ganda",
    "li": "limburgan", "ln": "lingala", "lo": "lao", "lt": "lithuanian",
    "lu": "luba-katanga", "lv": "latvian", "mg": "malagasy",
    "mh": "marshallese", "mi": "maori", "mk": "macedonian",
    "ml": "malayalam", "mn": "mongolian", "mr": "marathi", "ms": "malay",
    "mt": "maltese", "my": "burmese", "na": "nauru", "nb": "norwegian bokmal",
    "nd": "north ndebele", "ne": "nepali", "ng": "ndonga", "nl": "dutch",
    "nn": "norwegian nynorsk", "no": "norwegian", "nr": "south ndebele",
    "nv": "navajo", "ny": "chichewa", "oc": "occitan", "oj": "ojibwa",
    "om": "oromo", "or": "oriya", "os": "ossetian", "pa": "panjabi",
    "pi": "pali", "pl": "polish", "ps": "pushto", "pt": "portuguese",
    "qu": "quechua", "rm": "romansh", "rn": "rundi", "ro": "romanian",
    "ru": "russian", "rw": "kinyarwanda", "sa": "sanskrit",
    "sc": "sardinian", "sd": "sindhi", "se": "northern sami",
    "sg": "sango", "si": "sinhala", "sk": "slovak", "sl": "slovenian",
    "sm": "samoan", "sn": "shona", "so": "somali", "sq": "albanian",
    "sr": "serbian", "ss": "swati", "st": "southern sotho",
    "su": "sundanese", "sv": "swedish", "sw": "swahili", "ta": "tamil",
    "te": "telugu", "tg": "tajik", "th": "thai", "ti": "tigrinya",
    "tk": "turkmen", "tl": "tagalog", "tn": "tswana", "to": "tonga",
    "tr": "turkish", "ts": "tsonga", "tt": "tatar", "tw": "twi",
    "ty": "tahitian", "ug": "uighur", "uk": "ukrainian", "ur": "urdu",
    "uz": "uzbek", "ve": "venda", "vi": "vietnamese", "vo": "volapuk",
    "wa": "walloon", "wo": "wolof", "xh": "xhosa", "yi": "yiddish",
    "yo": "yoruba", "za": "zhuang", "zh": "chinese", "zu": "zulu",
}

ISO_639_2T = {
    "eng": "en", "deu": "de", "fra": "fr", "spa": "es", "por": "pt",
    "nld": "nl", "rus": "ru", "zho": "zh", "jpn": "ja", "kor": "ko",
    "ita": "it", "pol": "pl", "tur": "tr", "ara": "ar", "hin": "hi",
    "ben": "bn", "vie": "vi", "tha": "th", "swe": "sv", "dan": "da",
    "nor": "no", "fin": "fi", "ces": "cs", "ell": "el", "heb": "he",
    "hun": "hu", "ron": "ro", "ukr": "uk", "ind": "id", "msa": "ms",
}


def language_name(code):
    """iso_639/2 analog: 2- or 3-letter code -> lowercase English
    name, or None."""
    if code is None:
        return None
    c = code.lower()
    if len(c) == 2:
        return ISO_639_1.get(c)
    if len(c) == 3:
        two = ISO_639_2T.get(c)
        return ISO_639_1.get(two) if two else None
    return None
