"""Greek stemmer + lowercase folding (Analysis/El analogs).

Semantics of the reference's GreekStemmer.cs:44 (Ntais' algorithm as shipped:
22 ordered rules over a char buffer with add-back exception lists) and
GreekLowerCaseFilter.cs (tonos/dialytika folding, final sigma). The C#'s
`&&`/`||` precedence in rule 8 (the length guard binds only the first
suffix test) is reproduced bug-compatibly, like the reference does from the
original Java. Exception lists are the algorithm's published data tables.
"""

from __future__ import annotations

from functools import lru_cache

_GR_FOLD = str.maketrans(
    {"ά": "α", "έ": "ε", "ή": "η", "ί": "ι", "ϊ": "ι", "ΐ": "ι",
     "ό": "ο", "ύ": "υ", "ϋ": "υ", "ΰ": "υ", "ώ": "ω", "ς": "σ"}
)


def greek_lowercase(w: str) -> str:
    return w.lower().translate(_GR_FOLD)


def _ew(s: list, l: int, suf: str) -> bool:
    n = len(suf)
    return l >= n and "".join(s[l - n : l]) == suf


def _stem_str(s: list, l: int) -> str:
    return "".join(s[:l])


_VOW = frozenset("αεηιουω")
_VOW_NO_Y = frozenset("αεηιοω")

exc4 = frozenset(["θ", "δ", "ελ", "γαλ", "ν", "π", "ιδ", "παρ"])
exc6 = frozenset(["αλ", "αδ", "ενδ", "αμαν", "αμμοχαλ", "ηθ", "ανηθ",
                  "αντιδ", "φυσ", "βρωμ", "γερ", "εξωδ", "καλπ", "καλλιν",
                  "καταδ", "μουλ", "μπαν", "μπαγιατ", "μπολ", "μποσ", "νιτ",
                  "ξικ", "συνομηλ", "πετσ", "πιτσ", "πικαντ", "πλιατσ",
                  "ποστελν", "πρωτοδ", "σερτ", "συναδ", "τσαμ", "υποδ",
                  "φιλον", "φυλοδ", "χασ"])
exc7 = frozenset(["αναπ", "αποθ", "αποκ", "αποστ", "βουβ", "ξεθ", "ουλ",
                  "πεθ", "πικρ", "ποτ", "σιχ", "χ"])
exc8a = frozenset(["τρ", "τσ"])
exc8b = frozenset(["βετερ", "βουλκ", "βραχμ", "γ", "δραδουμ", "θ", "καλπουζ",
                   "καστελ", "κορμορ", "λαοπλ", "μωαμεθ", "μ", "μουσουλμ",
                   "ν", "ουλ", "π", "πελεκ", "πλ", "πολισ", "πορτολ",
                   "σαρακατσ", "σουλτ", "τσαρλατ", "ορφ", "τσιγγ", "τσοπ",
                   "φωτοστεφ", "χ", "ψυχοπλ", "αγ", "γαλ", "γερ", "δεκ",
                   "διπλ", "αμερικαν", "ουρ", "πιθ", "πουριτ", "σ", "ζωντ",
                   "ικ", "καστ", "κοπ", "λιχ", "λουθηρ", "μαιντ", "μελ",
                   "σιγ", "σπ", "στεγ", "τραγ", "τσαγ", "φ", "ερ", "αδαπ",
                   "αθιγγ", "αμηχ", "ανικ", "ανοργ", "απηγ", "απιθ",
                   "ατσιγγ", "βασ", "βασκ", "βαθυγαλ", "βιομηχ", "βραχυκ",
                   "διατ", "διαφ", "ενοργ", "θυσ", "καπνοβιομηχ", "καταγαλ",
                   "κλιβ", "κοιλαρφ", "λιβ", "μεγλοβιομηχ", "μικροβιομηχ",
                   "νταβ", "ξηροκλιβ", "ολιγοδαμ", "ολογαλ", "πενταρφ",
                   "περηφ", "περιτρ", "πλατ", "πολυδαπ", "πολυμηχ", "στεφ",
                   "ταβ", "τετ", "υπερηφ", "υποκοπ", "χαμηλοδαπ", "ψηλοταβ"])
exc9 = frozenset(["αβαρ", "βεν", "εναρ", "αβρ", "αδ", "αθ", "αν", "απλ",
                  "βαρον", "ντρ", "σκ", "κοπ", "μπορ", "νιφ", "παγ",
                  "παρακαλ", "σερπ", "σκελ", "συρφ", "τοκ", "υ", "δ", "εμ",
                  "θαρρ", "θ"])
exc12a = frozenset(["π", "απ", "συμπ", "ασυμπ", "ακαταπ", "αμεταμφ"])
exc12b = frozenset(["αλ", "αρ", "εκτελ", "ζ", "μ", "ξ", "παρακαλ", "προ", "νισ"])
exc13 = frozenset(["διαθ", "θ", "παρακαταθ", "προσθ", "συνθ"])
exc14 = frozenset(["φαρμακ", "χαδ", "αγκ", "αναρρ", "βρομ", "εκλιπ",
                   "λαμπιδ", "λεχ", "μ", "πατ", "ρ", "λ", "μεδ", "μεσαζ",
                   "υποτειν", "αμ", "αιθ", "ανηκ", "δεσποζ", "ενδιαφερ",
                   "δε", "δευτερευ", "καθαρευ", "πλε", "τσα"])
exc15a = frozenset(["αβαστ", "πολυφ", "αδηφ", "παμφ", "ρ", "ασπ", "αφ",
                    "αμαλ", "αμαλλι", "ανυστ", "απερ", "ασπαρ", "αχαρ",
                    "δερβεν", "δροσοπ", "ξεφ", "νεοπ", "νομοτ", "ολοπ",
                    "ομοτ", "προστ", "προσωποπ", "συμπ", "συντ", "τ",
                    "υποτ", "χαρ", "αειπ", "αιμοστ", "ανυπ", "αποτ",
                    "αρτιπ", "διατ", "εν", "επιτ", "κροκαλοπ", "σιδηροπ",
                    "λ", "ναυ", "ουλαμ", "ουρ", "π", "τρ", "μ"])
exc15b = frozenset(["ψοφ", "ναυλοχ"])
exc16 = frozenset(["ν", "χερσον", "δωδεκαν", "ερημον", "μεγαλον", "επταν"])
exc17 = frozenset(["ασβ", "σβ", "αχρ", "χρ", "απλ", "αειμν", "δυσχρ",
                   "ευχρ", "κοινοχρ", "παλιμψ"])
exc18 = frozenset(["ν", "ρ", "σπι", "στραβομουτσ", "κακομουτσ", "εξων"])
exc19 = frozenset(["παρασουσ", "φ", "χ", "ωριοπλ", "αζ", "αλλοσουσ", "ασουσ"])


def _r0(s, l):
    if l > 9 and (_ew(s, l, "καθεστωτοσ") or _ew(s, l, "καθεστωτων")):
        return l - 4
    if l > 8 and (_ew(s, l, "γεγονοτοσ") or _ew(s, l, "γεγονοτων")):
        return l - 4
    if l > 8 and _ew(s, l, "καθεστωτα"):
        return l - 3
    if l > 7 and (_ew(s, l, "τατογιου") or _ew(s, l, "τατογιων")):
        return l - 4
    if l > 7 and _ew(s, l, "γεγονοτα"):
        return l - 3
    if l > 7 and _ew(s, l, "καθεστωσ"):
        return l - 2
    if l > 6 and (_ew(s, l, "σκαγιου")) or _ew(s, l, "σκαγιων") or \
            _ew(s, l, "ολογιου") or _ew(s, l, "ολογιων") or \
            _ew(s, l, "κρεατοσ") or _ew(s, l, "κρεατων") or \
            _ew(s, l, "περατοσ") or _ew(s, l, "περατων") or \
            _ew(s, l, "τερατοσ") or _ew(s, l, "τερατων"):
        return l - 4
    if l > 6 and _ew(s, l, "τατογια"):
        return l - 3
    if l > 6 and _ew(s, l, "γεγονοσ"):
        return l - 2
    if l > 5 and (_ew(s, l, "φαγιου") or _ew(s, l, "φαγιων") or
                  _ew(s, l, "σογιου") or _ew(s, l, "σογιων")):
        return l - 4
    if l > 5 and (_ew(s, l, "σκαγια") or _ew(s, l, "ολογια") or
                  _ew(s, l, "κρεατα") or _ew(s, l, "περατα") or _ew(s, l, "τερατα")):
        return l - 3
    if l > 4 and (_ew(s, l, "φαγια") or _ew(s, l, "σογια") or
                  _ew(s, l, "φωτοσ") or _ew(s, l, "φωτων")):
        return l - 3
    if l > 4 and (_ew(s, l, "κρεασ") or _ew(s, l, "περασ") or _ew(s, l, "τερασ")):
        return l - 2
    if l > 3 and _ew(s, l, "φωτα"):
        return l - 2
    if l > 2 and _ew(s, l, "φωσ"):
        return l - 1
    return l


def _r1(s, l):
    if l > 4 and (_ew(s, l, "αδεσ") or _ew(s, l, "αδων")):
        l -= 4
        if not (_ew(s, l, "οκ") or _ew(s, l, "μαμ") or _ew(s, l, "μαν") or
                _ew(s, l, "μπαμπ") or _ew(s, l, "πατερ") or _ew(s, l, "γιαγι") or
                _ew(s, l, "νταντ") or _ew(s, l, "κυρ") or _ew(s, l, "θει") or
                _ew(s, l, "πεθερ")):
            l += 2  # add back -αδ
    return l


def _r2(s, l):
    if l > 4 and (_ew(s, l, "εδεσ") or _ew(s, l, "εδων")):
        l -= 4
        if _ew(s, l, "οπ") or _ew(s, l, "ιπ") or _ew(s, l, "εμπ") or \
                _ew(s, l, "υπ") or _ew(s, l, "γηπ") or _ew(s, l, "δαπ") or \
                _ew(s, l, "κρασπ") or _ew(s, l, "μιλ"):
            l += 2  # add back -εδ
    return l


def _r3(s, l):
    if l > 5 and (_ew(s, l, "ουδεσ") or _ew(s, l, "ουδων")):
        l -= 5
        if _ew(s, l, "αρκ") or _ew(s, l, "καλιακ") or _ew(s, l, "πεταλ") or \
                _ew(s, l, "λιχ") or _ew(s, l, "πλεξ") or _ew(s, l, "σκ") or \
                _ew(s, l, "σ") or _ew(s, l, "φλ") or _ew(s, l, "φρ") or \
                _ew(s, l, "βελ") or _ew(s, l, "λουλ") or _ew(s, l, "χν") or \
                _ew(s, l, "σπ") or _ew(s, l, "τραγ") or _ew(s, l, "φε"):
            l += 3  # add back -ουδ
    return l


def _r4(s, l):
    if l > 3 and (_ew(s, l, "εωσ") or _ew(s, l, "εων")):
        l -= 3
        if _stem_str(s, l) in exc4:
            l += 1  # add back -ε
    return l


def _r5(s, l):
    if l > 2 and _ew(s, l, "ια"):
        l -= 2
        if l and s[l - 1] in _VOW:
            l += 1  # add back -ι
    elif l > 3 and (_ew(s, l, "ιου") or _ew(s, l, "ιων")):
        l -= 3
        if l and s[l - 1] in _VOW:
            l += 1
    return l


def _r6(s, l):
    removed = False
    if l > 3 and (_ew(s, l, "ικα") or _ew(s, l, "ικο")):
        l -= 3
        removed = True
    elif l > 4 and (_ew(s, l, "ικου") or _ew(s, l, "ικων")):
        l -= 4
        removed = True
    if removed and ((l and s[l - 1] in _VOW) or _stem_str(s, l) in exc6):
        l += 2  # add back -ικ
    return l


def _r7(s, l):
    if l == 5 and _ew(s, l, "αγαμε"):
        return l - 1
    if l > 7 and _ew(s, l, "ηθηκαμε"):
        l -= 7
    elif l > 6 and _ew(s, l, "ουσαμε"):
        l -= 6
    elif l > 5 and (_ew(s, l, "αγαμε") or _ew(s, l, "ησαμε") or _ew(s, l, "ηκαμε")):
        l -= 5
    if l > 3 and _ew(s, l, "αμε"):
        l -= 3
        if _stem_str(s, l) in exc7:
            l += 2  # add back -αμ
    return l


def _r8(s, l):
    removed = False
    # bug-compatible precedence: the length guard binds only the FIRST test
    if l > 8 and _ew(s, l, "ιουντανε"):
        l -= 8
        removed = True
    elif (l > 7 and _ew(s, l, "ιοντανε")) or _ew(s, l, "ουντανε") or _ew(s, l, "ηθηκανε"):
        l -= 7
        removed = True
    elif (l > 6 and _ew(s, l, "ιοτανε")) or _ew(s, l, "οντανε") or _ew(s, l, "ουσανε"):
        l -= 6
        removed = True
    elif (l > 5 and _ew(s, l, "αγανε")) or _ew(s, l, "ησανε") or _ew(s, l, "οτανε") or _ew(s, l, "ηκανε"):
        l -= 5
        removed = True
    if removed and _stem_str(s, l) in exc8a:
        l += 4
        s[l - 4 : l] = list("αγαν")
    if l > 3 and _ew(s, l, "ανε"):
        l -= 3
        if (l and s[l - 1] in _VOW_NO_Y) or _stem_str(s, l) in exc8b:
            l += 2  # add back -αν
    return l


def _r9(s, l):
    if l > 5 and _ew(s, l, "ησετε"):
        l -= 5
    if l > 3 and _ew(s, l, "ετε"):
        l -= 3
        if _stem_str(s, l) in exc9 or (l and s[l - 1] in _VOW_NO_Y) or \
                _ew(s, l, "οδ") or _ew(s, l, "αιρ") or _ew(s, l, "φορ") or \
                _ew(s, l, "ταθ") or _ew(s, l, "διαθ") or _ew(s, l, "σχ") or \
                _ew(s, l, "ενδ") or _ew(s, l, "ευρ") or _ew(s, l, "τιθ") or \
                _ew(s, l, "υπερθ") or _ew(s, l, "ραθ") or _ew(s, l, "ενθ") or \
                _ew(s, l, "ροθ") or _ew(s, l, "σθ") or _ew(s, l, "πυρ") or \
                _ew(s, l, "αιν") or _ew(s, l, "συνδ") or _ew(s, l, "συν") or \
                _ew(s, l, "συνθ") or _ew(s, l, "χωρ") or _ew(s, l, "πον") or \
                _ew(s, l, "βρ") or _ew(s, l, "καθ") or _ew(s, l, "ευθ") or \
                _ew(s, l, "εκθ") or _ew(s, l, "νετ") or _ew(s, l, "ρον") or \
                _ew(s, l, "αρκ") or _ew(s, l, "βαρ") or _ew(s, l, "βολ") or \
                _ew(s, l, "ωφελ"):
            l += 2  # add back -ετ
    return l


def _r10(s, l):
    if l > 5 and (_ew(s, l, "οντασ") or _ew(s, l, "ωντασ")):
        l -= 5
        if l == 3 and _ew(s, l, "αρχ"):
            l += 3
            s[l - 3] = "ο"
        if _ew(s, l, "κρε"):
            l += 3
            s[l - 3] = "ω"
    return l


def _r11(s, l):
    if l > 6 and _ew(s, l, "ομαστε"):
        l -= 6
        if l == 2 and _ew(s, l, "ον"):
            l += 5  # add back -ομαστ
    elif l > 7 and _ew(s, l, "ιομαστε"):
        l -= 7
        if l == 2 and _ew(s, l, "ον"):
            l += 5
            s[l - 5 : l] = list("ομαστ")
    return l


def _r12(s, l):
    if l > 5 and _ew(s, l, "ιεστε"):
        l -= 5
        if _stem_str(s, l) in exc12a:
            l += 4  # add back -ιεστ
    if l > 4 and _ew(s, l, "εστε"):
        l -= 4
        if _stem_str(s, l) in exc12b:
            l += 3  # add back -εστ
    return l


def _r13(s, l):
    if l > 6 and _ew(s, l, "ηθηκεσ"):
        l -= 6
    elif l > 5 and (_ew(s, l, "ηθηκα") or _ew(s, l, "ηθηκε")):
        l -= 5
    removed = False
    if l > 4 and _ew(s, l, "ηκεσ"):
        l -= 4
        removed = True
    elif l > 3 and (_ew(s, l, "ηκα") or _ew(s, l, "ηκε")):
        l -= 3
        removed = True
    if removed and (_stem_str(s, l) in exc13 or _ew(s, l, "σκωλ") or
                    _ew(s, l, "σκουλ") or _ew(s, l, "ναρθ") or _ew(s, l, "σφ") or
                    _ew(s, l, "οθ") or _ew(s, l, "πιθ")):
        l += 2  # add back -ηκ
    return l


def _r14(s, l):
    removed = False
    if l > 5 and _ew(s, l, "ουσεσ"):
        l -= 5
        removed = True
    elif l > 4 and (_ew(s, l, "ουσα") or _ew(s, l, "ουσε")):
        l -= 4
        removed = True
    if removed and (_stem_str(s, l) in exc14 or (l and s[l - 1] in _VOW) or
                    _ew(s, l, "ποδαρ") or _ew(s, l, "βλεπ") or
                    _ew(s, l, "πανταχ") or _ew(s, l, "φρυδ") or
                    _ew(s, l, "μαντιλ") or _ew(s, l, "μαλλ") or
                    _ew(s, l, "κυματ") or _ew(s, l, "λαχ") or _ew(s, l, "ληγ") or
                    _ew(s, l, "φαγ") or _ew(s, l, "ομ") or _ew(s, l, "πρωτ")):
        l += 3  # add back -ουσ
    return l


def _r15(s, l):
    removed = False
    if l > 4 and _ew(s, l, "αγεσ"):
        l -= 4
        removed = True
    elif l > 3 and (_ew(s, l, "αγα") or _ew(s, l, "αγε")):
        l -= 3
        removed = True
    if removed:
        cond1 = _stem_str(s, l) in exc15a or _ew(s, l, "οφ") or \
            _ew(s, l, "πελ") or _ew(s, l, "χορτ") or _ew(s, l, "λλ") or \
            _ew(s, l, "σφ") or _ew(s, l, "ρπ") or _ew(s, l, "φρ") or \
            _ew(s, l, "πρ") or _ew(s, l, "λοχ") or _ew(s, l, "σμην")
        cond2 = _stem_str(s, l) in exc15b or _ew(s, l, "κολλ")
        if cond1 and not cond2:
            l += 2  # add back -αγ
    return l


def _r16(s, l):
    removed = False
    if l > 4 and _ew(s, l, "ησου"):
        l -= 4
        removed = True
    elif l > 3 and (_ew(s, l, "ησε") or _ew(s, l, "ησα")):
        l -= 3
        removed = True
    if removed and _stem_str(s, l) in exc16:
        l += 2  # add back -ησ
    return l


def _r17(s, l):
    if l > 4 and _ew(s, l, "ηστε"):
        l -= 4
        if _stem_str(s, l) in exc17:
            l += 3  # add back -ηστ
    return l


def _r18(s, l):
    removed = False
    if l > 6 and (_ew(s, l, "ησουνε") or _ew(s, l, "ηθουνε")):
        l -= 6
        removed = True
    elif l > 4 and _ew(s, l, "ουνε"):
        l -= 4
        removed = True
    if removed and _stem_str(s, l) in exc18:
        l += 3
        s[l - 3 : l] = list("ουν")
    return l


def _r19(s, l):
    removed = False
    if l > 6 and (_ew(s, l, "ησουμε") or _ew(s, l, "ηθουμε")):
        l -= 6
        removed = True
    elif l > 4 and _ew(s, l, "ουμε"):
        l -= 4
        removed = True
    if removed and _stem_str(s, l) in exc19:
        l += 3
        s[l - 3 : l] = list("ουμ")
    return l


def _r20(s, l):
    if l > 5 and (_ew(s, l, "ματων") or _ew(s, l, "ματοσ")):
        l -= 3
    elif l > 4 and _ew(s, l, "ματα"):
        l -= 2
    return l


def _r21(s, l):
    if l > 9 and _ew(s, l, "ιοντουσαν"):
        return l - 9
    if l > 8 and (_ew(s, l, "ιομασταν") or _ew(s, l, "ιοσασταν") or
                  _ew(s, l, "ιουμαστε") or _ew(s, l, "οντουσαν")):
        return l - 8
    if l > 7 and (_ew(s, l, "ιεμαστε") or _ew(s, l, "ιεσαστε") or
                  _ew(s, l, "ιομουνα") or _ew(s, l, "ιοσαστε") or
                  _ew(s, l, "ιοσουνα") or _ew(s, l, "ιουνται") or
                  _ew(s, l, "ιουνταν") or _ew(s, l, "ηθηκατε") or
                  _ew(s, l, "ομασταν") or _ew(s, l, "οσασταν") or
                  _ew(s, l, "ουμαστε")):
        return l - 7
    if l > 6 and (_ew(s, l, "ιομουν") or _ew(s, l, "ιονταν") or
                  _ew(s, l, "ιοσουν") or _ew(s, l, "ηθειτε") or
                  _ew(s, l, "ηθηκαν") or _ew(s, l, "ομουνα") or
                  _ew(s, l, "οσαστε") or _ew(s, l, "οσουνα") or
                  _ew(s, l, "ουνται") or _ew(s, l, "ουνταν") or
                  _ew(s, l, "ουσατε")):
        return l - 6
    if l > 5 and (_ew(s, l, "αγατε") or _ew(s, l, "ιεμαι") or
                  _ew(s, l, "ιεται") or _ew(s, l, "ιεσαι") or
                  _ew(s, l, "ιοταν") or _ew(s, l, "ιουμα") or
                  _ew(s, l, "ηθεισ") or _ew(s, l, "ηθουν") or
                  _ew(s, l, "ηκατε") or _ew(s, l, "ησατε") or
                  _ew(s, l, "ησουν") or _ew(s, l, "ομουν") or
                  _ew(s, l, "ονται") or _ew(s, l, "ονταν") or
                  _ew(s, l, "οσουν") or _ew(s, l, "ουμαι") or
                  _ew(s, l, "ουσαν")):
        return l - 5
    if l > 4 and (_ew(s, l, "αγαν") or _ew(s, l, "αμαι") or
                  _ew(s, l, "ασαι") or _ew(s, l, "αται") or
                  _ew(s, l, "ειτε") or _ew(s, l, "εσαι") or
                  _ew(s, l, "εται") or _ew(s, l, "ηδεσ") or
                  _ew(s, l, "ηδων") or _ew(s, l, "ηθει") or
                  _ew(s, l, "ηκαν") or _ew(s, l, "ησαν") or
                  _ew(s, l, "ησει") or _ew(s, l, "ησεσ") or
                  _ew(s, l, "ομαι") or _ew(s, l, "οταν")):
        return l - 4
    if l > 3 and (_ew(s, l, "αει") or _ew(s, l, "εισ") or
                  _ew(s, l, "ηθω") or _ew(s, l, "ησω") or
                  _ew(s, l, "ουν") or _ew(s, l, "ουσ")):
        return l - 3
    if l > 2 and (_ew(s, l, "αν") or _ew(s, l, "ασ") or _ew(s, l, "αω") or
                  _ew(s, l, "ει") or _ew(s, l, "εσ") or _ew(s, l, "ησ") or
                  _ew(s, l, "οι") or _ew(s, l, "οσ") or _ew(s, l, "ου") or
                  _ew(s, l, "υσ") or _ew(s, l, "ων")):
        return l - 2
    if l > 1 and l and s[l - 1] in _VOW:
        return l - 1
    return l


def _r22(s, l):
    if _ew(s, l, "εστερ") or _ew(s, l, "εστατ"):
        return l - 5
    if _ew(s, l, "οτερ") or _ew(s, l, "οτατ") or _ew(s, l, "υτερ") or \
            _ew(s, l, "υτατ") or _ew(s, l, "ωτερ") or _ew(s, l, "ωτατ"):
        return l - 4
    return l


_RULES = (_r0, _r1, _r2, _r3, _r4, _r5, _r6, _r7, _r8, _r9, _r10, _r11,
          _r12, _r13, _r14, _r15, _r16, _r17, _r18, _r19, _r20)


@lru_cache(maxsize=200_000)
def greek_stem(word: str) -> str:
    w = greek_lowercase(word)
    if len(w) < 4:
        return w
    s = list(w)
    l = len(s)
    orig = l
    for rule in _RULES:
        l = rule(s, l)
    if l == orig:
        l = _r21(s, l)
    l = _r22(s, l)
    return _stem_str(s, l)
