"""Lovins stemmer (Lovins 1968, "Development of a stemming algorithm").

Reference surface: contrib/Snowball/SF/Snowball/Ext/LovinsStemmer.cs (the
snowball transcription of the published algorithm). Clean-room rewrite: the
ending/condition/transformation DATA below is the published Appendix A/B
material (extracted from the reference's among tables); the implementation
structure is original.

Three phases, no R-regions:
  1. remove the LONGEST matching ending whose context condition accepts the
     remaining stem (snowball among semantics: the longest textual match is
     chosen first and a failing condition does NOT fall back to shorter);
  2. undouble a final bb/dd/gg/ll/mm/nn/pp/rr/ss/tt;
  3. apply at most one respelling rule to the new ending (longest match;
     a few rules carry not-preceded-by guards).
"""

from __future__ import annotations

_ENDINGS = {  # ending -> condition letter (Lovins 1968 Appendix A)
    "alistically": "B", "arizability": "A", "izationally": "B", "antialness": "A",
    "arisations": "A", "arizations": "A", "entialness": "A", "allically": "C",
    "antaneous": "A", "antiality": "A", "arisation": "A", "arization": "A",
    "ationally": "B", "ativeness": "A", "eableness": "E", "entations": "A",
    "entiality": "A", "entialize": "A", "entiation": "A", "ionalness": "A",
    "istically": "A", "itousness": "A", "izability": "A", "izational": "A",
    "ableness": "A", "arizable": "A", "entation": "A", "entially": "A",
    "eousness": "A", "ibleness": "A", "icalness": "A", "ionalism": "A",
    "ionality": "A", "ionalize": "A", "iousness": "A", "izations": "A",
    "lessness": "A", "ability": "A", "aically": "A", "alistic": "B",
    "alities": "A", "ariness": "E", "aristic": "A", "arizing": "A",
    "ateness": "A", "atingly": "A", "ational": "B", "atively": "A",
    "ativism": "A", "elihood": "E", "encible": "A", "entally": "A",
    "entials": "A", "entiate": "A", "entness": "A", "fulness": "A",
    "ibility": "A", "icalism": "A", "icalist": "A", "icality": "A",
    "icalize": "A", "ication": "G", "icianry": "A", "ination": "A",
    "ingness": "A", "ionally": "A", "isation": "A", "ishness": "A",
    "istical": "A", "iteness": "A", "iveness": "A", "ivistic": "A",
    "ivities": "A", "ization": "F", "izement": "A", "oidally": "A",
    "ousness": "A", "aceous": "A", "acious": "B", "action": "G",
    "alness": "A", "ancial": "A", "ancies": "A", "ancing": "B",
    "ariser": "A", "arized": "A", "arizer": "A", "atable": "A",
    "ations": "B", "atives": "A", "eature": "Z", "efully": "A",
    "encies": "A", "encing": "A", "ential": "A", "enting": "C",
    "entist": "A", "eously": "A", "ialist": "A", "iality": "A",
    "ialize": "A", "ically": "A", "icance": "A", "icians": "A",
    "icists": "A", "ifully": "A", "ionals": "A", "ionate": "D",
    "ioning": "A", "ionist": "A", "iously": "A", "istics": "A",
    "izable": "E", "lessly": "A", "nesses": "A", "oidism": "A",
    "acies": "A", "acity": "A", "aging": "B", "aical": "A",
    "alism": "B", "alist": "A", "ality": "A", "alize": "A",
    "allic": "BB", "anced": "B", "ances": "B", "antic": "C",
    "arial": "A", "aries": "A", "arily": "A", "arity": "B",
    "arize": "A", "aroid": "A", "ately": "A", "ating": "I",
    "ation": "B", "ative": "A", "ators": "A", "atory": "A",
    "ature": "E", "early": "Y", "ehood": "A", "eless": "A",
    "elity": "A", "ement": "A", "enced": "A", "ences": "A",
    "eness": "E", "ening": "E", "ental": "A", "ented": "C",
    "ently": "A", "fully": "A", "ially": "A", "icant": "A",
    "ician": "A", "icide": "A", "icism": "A", "icist": "A",
    "icity": "A", "idine": "I", "iedly": "A", "ihood": "A",
    "inate": "A", "iness": "A", "ingly": "B", "inism": "J",
    "inity": "CC", "ional": "A", "ioned": "A", "ished": "A",
    "istic": "A", "ities": "A", "itous": "A", "ively": "A",
    "ivity": "A", "izers": "F", "izing": "F", "oidal": "A",
    "oides": "A", "otide": "A", "ously": "A", "able": "A",
    "ably": "A", "ages": "B", "ally": "B", "ance": "B",
    "ancy": "B", "ants": "B", "aric": "A", "arly": "K",
    "ated": "I", "ates": "A", "atic": "B", "ator": "A",
    "ealy": "Y", "edly": "E", "eful": "A", "eity": "A",
    "ence": "A", "ency": "A", "ened": "E", "enly": "E",
    "eous": "A", "hood": "A", "ials": "A", "ians": "A",
    "ible": "A", "ibly": "A", "ical": "A", "ides": "L",
    "iers": "A", "iful": "A", "ines": "M", "ings": "N",
    "ions": "B", "ious": "A", "isms": "B", "ists": "A",
    "itic": "H", "ized": "F", "izer": "F", "less": "A",
    "lily": "A", "ness": "A", "ogen": "A", "ward": "A",
    "wise": "A", "ying": "B", "yish": "A", "acy": "A",
    "age": "B", "aic": "A", "als": "BB", "ant": "B",
    "ars": "O", "ary": "F", "ata": "A", "ate": "A",
    "eal": "Y", "ear": "Y", "ely": "E", "ene": "E",
    "ent": "C", "ery": "E", "ese": "A", "ful": "A",
    "ial": "A", "ian": "A", "ics": "A", "ide": "L",
    "ied": "A", "ier": "A", "ies": "P", "ily": "A",
    "ine": "M", "ing": "N", "ion": "Q", "ish": "C",
    "ism": "B", "ist": "A", "ite": "AA", "ity": "A",
    "ium": "A", "ive": "A", "ize": "F", "oid": "A",
    "ous": "A", "'s": "A", "ae": "A", "al": "BB",
    "ar": "X", "as": "B", "ed": "E", "en": "F",
    "es": "E", "ia": "A", "ic": "A", "is": "A",
    "ly": "B", "on": "S", "or": "T", "s'": "A",
    "um": "U", "us": "V", "yl": "R", "a": "A",
    "e": "A", "i": "A", "o": "A", "s": "W",
    "y": "B",
}


_MIN = {"A": 2, "B": 3, "C": 4, "D": 5, "E": 2, "F": 3, "G": 3, "H": 2,
        "I": 2, "J": 2, "K": 3, "L": 2, "M": 2, "N": 3, "O": 2, "P": 2,
        "Q": 3, "R": 2, "S": 2, "T": 2, "U": 2, "V": 2, "W": 2, "X": 2,
        "Y": 2, "Z": 2, "AA": 2, "BB": 3, "CC": 2}

_AA_SET = ("ph", "th", "er", "or", "es", "d", "f", "l", "t")
_DOUBLES = ("bb", "dd", "gg", "ll", "mm", "nn", "pp", "rr", "ss", "tt")

# respell rules: old -> (new, forbidden-preceding-chars)
_RESPELL = (
    ("iev", "ief", ""), ("uct", "uc", ""), ("umpt", "um", ""),
    ("rpt", "rb", ""), ("urs", "ur", ""), ("istr", "ister", ""),
    ("metr", "meter", ""), ("olv", "olut", ""), ("ul", "l", "aio"),
    ("bex", "bic", ""), ("dex", "dic", ""), ("pex", "pic", ""),
    ("tex", "tic", ""), ("ax", "ac", ""), ("ex", "ec", ""), ("ix", "ic", ""),
    ("lux", "luc", ""), ("uad", "uas", ""), ("vad", "vas", ""),
    ("cid", "cis", ""), ("lid", "lis", ""), ("erid", "eris", ""),
    ("pand", "pans", ""), ("end", "ens", "s"), ("ond", "ons", ""),
    ("lud", "lus", ""), ("rud", "rus", ""), ("her", "hes", "pt"),
    ("mit", "mis", ""), ("ent", "ens", "m"), ("ert", "ers", ""),
    ("et", "es", "n"), ("yt", "ys", ""), ("yz", "ys", ""),
)


def _cond(stem: str, c: str) -> bool:
    n = len(stem)
    if n < _MIN[c]:
        return False
    if c in ("A", "B", "C", "D"):
        return True
    if c in ("E", "F"):
        return not stem.endswith("e")
    if c == "G":
        return stem.endswith("f")
    if c == "H":
        return stem.endswith("t") or stem.endswith("ll")
    if c == "I":
        return not stem.endswith(("o", "e"))
    if c == "J":
        return not stem.endswith(("a", "e"))
    if c in ("K", "X"):
        return (stem.endswith(("l", "i"))
                or (stem.endswith("e") and n >= 3 and stem[-3] == "u"))
    if c == "L":
        if stem.endswith(("u", "x")):
            return False
        return not (stem.endswith("s") and not stem.endswith("os"))
    if c == "M":
        return not stem.endswith(("a", "c", "e", "m"))
    if c == "N":  # min 3; if the 3rd-from-last char is s, min 4
        return n >= 4 or stem[-3] != "s"
    if c == "O":
        return stem.endswith(("l", "i"))
    if c == "P":
        return not stem.endswith("c")
    if c == "Q":
        return not stem.endswith(("l", "n"))
    if c == "R":
        return stem.endswith(("n", "r"))
    if c == "S":
        return stem.endswith("dr") or (stem.endswith("t") and not stem.endswith("tt"))
    if c == "T":
        return stem.endswith("s") or (stem.endswith("t") and not stem.endswith("ot"))
    if c == "U":
        return stem.endswith(("l", "m", "n", "r"))
    if c == "V":
        return stem.endswith("c")
    if c == "W":
        return not stem.endswith(("s", "u"))
    if c == "Y":
        return stem.endswith("in")
    if c == "Z":
        return not stem.endswith("f")
    if c == "AA":
        return stem.endswith(_AA_SET)
    if c == "BB":
        return not (stem.endswith("met") or stem.endswith("ryst"))
    if c == "CC":
        return stem.endswith("l")
    raise AssertionError(c)


_BY_LEN = sorted(_ENDINGS, key=len, reverse=True)


def lovins_stem(word: str) -> str:
    w = word
    # phase 1: longest ending, condition on the stem, no fallback
    for suf in _BY_LEN:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _cond(stem, _ENDINGS[suf]):
                w = stem
            break
    # phase 2: undouble
    if w.endswith(_DOUBLES):
        w = w[:-1]
    # phase 3: one respelling (longest old-ending match, guarded)
    best = None
    for old, new, forbid in _RESPELL:
        if w.endswith(old) and (best is None or len(old) > len(best[0])):
            best = (old, new, forbid)
    if best is not None:
        old, new, forbid = best
        prev = w[-len(old) - 1 : -len(old)] if len(w) > len(old) else ""
        if not forbid or prev == "" or prev not in forbid:
            w = w[: -len(old)] + new
    return w
