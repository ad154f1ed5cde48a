"""Heuristic sentence-level CGN tagger for the raw-text path.

The reference gets POS/lemma/morphology from the Frog server
(src/tscan.cxx:3131-3231); when no annotation column is supplied the
engine approximates it with this deterministic rule tagger:

1. closed-class function-word tables (standard Dutch grammar: pronouns,
   articles, prepositions, conjunctions, auxiliaries/modals and the
   irregular high-frequency verb paradigms — CGN tag conventions per
   the published CGN/D-Coi tagset, observable in the reference's own
   golden fixtures),
2. a morphological guesser for open-class unknowns (derivational
   suffixes, participle circumfixes, plural/infinitive ``-en``),
3. sentence-context repair passes (article/pronoun ``het``,
   complementizer ``dat``, relative ``die``, possessive/copula
   ``zijn``/``haar``, subordinator ``toen``, verb-second finite-verb
   recovery, prenominal vs free participle position).

Output is one :class:`~tscan_ray.text.lexicons.PosInfo` decision per
token (plus a name flag), consumed by ``features.analyze_sentence``.
The annotated path (Frog/Alpino annotation column) bypasses all of
this and is golden-exact; this module only narrows the raw-text gap.
"""

from __future__ import annotations

from tscan_ray.text.lexicons import Lexicons, PosInfo
from tscan_ray.text.tokenize import is_punct

__all__ = ["tag_sentence", "Decision"]


class Decision:
    """Per-token tagger decision: either punctuation (info None,
    is_punct True), a name (is_name True), or a PosInfo."""

    __slots__ = ("info", "is_name", "punct")

    def __init__(self, info: PosInfo | None, is_name: bool = False,
                 punct: bool = False):
        self.info = info
        self.is_name = is_name
        self.punct = punct

    def key(self):
        return (self.info, self.is_name, self.punct)


def _pi(tag, lemma, morphs=None, **feats):
    return PosInfo(tag, lemma, tuple(morphs or (lemma,)),
                   tuple(sorted(feats.items())))


# ---------------------------------------------------------------------------
# Closed-class tables (standard Dutch function words, CGN conventions)
# ---------------------------------------------------------------------------

def _closed_entries() -> dict[str, PosInfo]:
    e: dict[str, PosInfo] = {}

    def add(words, tag, **feats):
        for w in words.split():
            e[w] = _pi(tag, w, **feats)

    # --- pronouns -----------------------------------------------------
    for w, p in [("ik", "1"), ("'k", "1"), ("mij", "1"), ("me", "1"),
                 ("wij", "1"), ("we", "1"), ("jij", "2"), ("je", "2"),
                 ("jou", "2"), ("u", "2"), ("gij", "2"), ("ge", "2"),
                 ("jullie", "2"), ("hij", "3"), ("hem", "3"), ("zij", "3"),
                 ("ze", "3"), ("het", "3"), ("'t", "3"), ("hen", "3"),
                 ("hun", "3"), ("men", "3"), ("ie", "3"), ("'m", "3")]:
        e[w] = _pi("VNW", w, vwtype="pers", persoon=p)
    for w, p in [("mijn", "1"), ("m'n", "1"), ("jouw", "2"), ("uw", "2"),
                 ("zijn", "3"), ("z'n", "3"), ("haar", "3"), ("d'r", "3"),
                 ("ons", "1"), ("onze", "1")]:
        e[w + "\x00bez"] = _pi("VNW", w, vwtype="bez", persoon=p)
    for w, p in [("zich", "3"), ("zichzelf", "3"), ("mezelf", "1"),
                 ("mijzelf", "1"), ("jezelf", "2"), ("uzelf", "2"),
                 ("onszelf", "1"), ("hemzelf", "3"), ("haarzelf", "3")]:
        e[w] = _pi("VNW", w, vwtype="refl", persoon=p)
    for w in ("elkaar", "elkaars", "mekaar"):
        e[w] = _pi("VNW", "elkaar", vwtype="recip", persoon="3")
    for w in ("deze", "dit", "die", "dat", "zulke", "zulk", "zo'n",
              "datgene", "diegene", "degene", "dergelijke", "gene"):
        e.setdefault(w, _pi("VNW", w, vwtype="aanw"))
    # R-pronouns: CGN tags bare er/hier/daar/waar VNW(adv-pron) (the
    # reference's fixtures show Frog doing the same; golden connective
    # counts depend on them NOT passing the VG/VZ/BW gate)
    for w in ("er", "hier", "daar"):
        e[w] = _pi("VNW", w, vwtype="aanw")
    e["waar"] = _pi("VNW", "waar", vwtype="vb")
    for w in ("ergens", "nergens", "overal"):
        e[w] = _pi("VNW", w, vwtype="onbep")
    for w in ("wie", "wat", "welke", "welk"):
        e.setdefault(w, _pi("VNW", w, vwtype="vb",
                            **({"persoon": "3"} if w == "wie" else {})))
    for w in ("iemand", "niemand", "iets", "niets", "alles", "iedereen",
              "ieder", "iedere", "elk", "elke", "enkele", "sommige",
              "sommigen", "beide", "beiden", "geen", "allemaal", "veel",
              "meer", "meest", "minder", "minst", "weinig", "meerdere",
              "zoveel", "evenveel", "menig", "alle", "allen", "velen"):
        e.setdefault(w, _pi("VNW", w, vwtype="onbep"))

    # --- articles (der/des: archaic genitive/dative case) --------------
    e.setdefault("de", _pi("LID", "de"))
    e.setdefault("'n", _pi("LID", "een"))
    e["der"] = _pi("LID", "de", naamval="gen")
    e["des"] = _pi("LID", "de", naamval="gen")
    e["den"] = _pi("LID", "de", naamval="dat")

    # --- prepositions ---------------------------------------------------
    add("aan achter af beneden behalve bij binnen boven buiten dankzij "
        "door gedurende in jegens krachtens langs met middels na naar "
        "naast nabij namens om omstreeks omtrent ondanks onder op over "
        "per rond rondom sinds sedert te tegen tegenover tijdens tot "
        "tussen uit van vanaf vanuit vanwege via volgens voor voorbij "
        "wegens zonder mee toe heen", "VZ")

    # --- conjunctions ---------------------------------------------------
    for w in ("en", "maar", "of", "want", "doch", "noch", "alsmede",
              "alsook", "oftewel", "ofwel", "hetzij", "evenals"):
        e.setdefault(w, _pi("VG", w, conjtype="neven"))
    for w in ("omdat", "doordat", "zodat", "opdat", "voordat", "nadat",
              "totdat", "terwijl", "hoewel", "alhoewel", "ofschoon",
              "tenzij", "mits", "indien", "wanneer", "zodra", "zolang",
              "zoals", "aangezien", "alsof", "naarmate", "voordat",
              "zowel"):
        e.setdefault(w, _pi("VG", w, conjtype="onder"))

    # --- interjections ----------------------------------------------------
    add("ja nee nou oké ach oh o jawel hoor hé hè tja", "TSW")

    # --- adverbs ----------------------------------------------------------
    add("wel nog reeds steeds vaak soms zelden weer opnieuw telkens "
        "meestal dikwijls bijna ongeveer ruim vrijwel haast amper "
        "nauwelijks liever liefst zelf eveneens tevens bovendien "
        "voorts echter evenwel desondanks niettemin immers aldus "
        "daarom eerst aanvankelijk vervolgens tenslotte uiteindelijk "
        "eindelijk inmiddels intussen ondertussen straks zometeen "
        "onmiddellijk vanavond vanmorgen vanmiddag vannacht vanochtend "
        "vanday overmorgen eergisteren buitenshuis binnenkort onlangs "
        "weleens misschien wellicht waarschijnlijk uiterst terug "
        "vooruit achteruit omhoog omlaag omver opzij andersom hoe "
        "waarom vanzelf bijeen alvast allang alweer zopas zonet nochtans "
        "trouwens overigens hooguit minstens hoogstens slechts alleen "
        "destijds daarnet zojuist ooit toentertijd vroeger allereerst "
        "bijvoorbeeld namelijk helemaal pas ongetwijfeld overheen even "
        "eromheen daarvandaan zowat tamelijk enigszins geleidelijk "
        "zogenaamd bijgevolg kortom bovenal immer niettegenstaande "
        "desalniettemin daarentegen veelal doorgaans gewoonlijk "
        "soms nochtans vanwaar waarheen daarheen hierheen ginds "
        "elders senang weliswaar überhaupt sowieso helaas achterin "
        "voorin bovenin onderin middenin tussendoor tussenin ok "
        "überigens nogmaals evengoed hoezo daarmede alsnog", "BW")
    # pronominal-adverb compounds are plain BW in CGN
    for r in ("er", "daar", "hier", "waar"):
        for p in ("op", "in", "aan", "bij", "mee", "van", "uit", "over",
                  "onder", "tussen", "tegen", "achter", "voor", "na",
                  "door", "om", "toe", "naast", "heen", "mede", "langs",
                  "tegenover", "boven", "af", "binnen", "buiten", "rond"):
            e.setdefault(r + p, _pi("BW", r + p))

    # adjectives commonly mistaken for adverbs (CGN: ADJ(vrij))
    for w in ("erg", "echt", "gewoon", "bijzonder", "alleen", "heel",
              "gauw", "prima", "vaker"):
        e.setdefault(w, _pi("ADJ", w))
    e.setdefault("allerlei", _pi("ADJ", "allerlei"))

    # --- numerals ---------------------------------------------------------
    add("één twee drie vier vijf zes zeven acht negen tien elf twaalf "
        "dertien veertien vijftien zestien zeventien achttien negentien "
        "twintig dertig veertig vijftig zestig zeventig tachtig negentig "
        "honderd duizend miljoen miljard hoeveel", "TW")
    for w in ("eerste", "tweede", "derde", "vierde", "vijfde", "zesde",
              "zevende", "achtste", "negende", "tiende", "elfde",
              "twaalfde", "twintigste", "dertigste", "honderdste"):
        e.setdefault(w, _pi("TW", w))

    # --- irregular / high-frequency verb paradigms -----------------------
    # (textbook Dutch strong/irregular verbs; CGN wvorm/pvtijd)
    verb_paradigms = [
        # lemma, present forms, past forms, participle
        ("zijn", ["ben", "bent", "is"], ["was", "waren"], "geweest"),
        ("hebben", ["heb", "hebt", "heeft", "hebben"], ["had", "hadden"],
         "gehad"),
        ("worden", ["word", "wordt", "worden"], ["werd", "werden"],
         "geworden"),
        ("zullen", ["zal", "zult", "zullen"], ["zou", "zouden"], None),
        ("kunnen", ["kan", "kun", "kunt", "kunnen"], ["kon", "konden"],
         "gekund"),
        ("moeten", ["moet", "moeten"], ["moest", "moesten"], "gemoeten"),
        ("mogen", ["mag", "mogen"], ["mocht", "mochten"], "gemogen"),
        ("willen", ["wil", "wilt", "willen"], ["wilde", "wilden", "wou",
                                               "wouden"], "gewild"),
        ("gaan", ["ga", "gaat", "gaan"], ["ging", "gingen"], "gegaan"),
        ("komen", ["kom", "komt", "komen"], ["kwam", "kwamen"], "gekomen"),
        ("doen", ["doe", "doet", "doen"], ["deed", "deden"], "gedaan"),
        ("laten", ["laat", "laten"], ["liet", "lieten"], "gelaten"),
        ("blijven", ["blijf", "blijft", "blijven"], ["bleef", "bleven"],
         "gebleven"),
        ("zien", ["zie", "ziet", "zien"], ["zag", "zagen"], "gezien"),
        ("staan", ["sta", "staat", "staan"], ["stond", "stonden"],
         "gestaan"),
        ("liggen", ["lig", "ligt", "liggen"], ["lag", "lagen"], "gelegen"),
        ("zitten", ["zit", "zitten"], ["zat", "zaten"], "gezeten"),
        ("lopen", ["loop", "loopt", "lopen"], ["liep", "liepen"],
         "gelopen"),
        ("weten", ["weet", "weten"], ["wist", "wisten"], "geweten"),
        ("vinden", ["vind", "vindt", "vinden"], ["vond", "vonden"],
         "gevonden"),
        ("krijgen", ["krijg", "krijgt", "krijgen"], ["kreeg", "kregen"],
         "gekregen"),
        ("zeggen", ["zeg", "zegt", "zeggen"], ["zei", "zeiden"], "gezegd"),
        ("denken", ["denk", "denkt", "denken"], ["dacht", "dachten"],
         "gedacht"),
        ("houden", ["houd", "houdt", "houden"], ["hield", "hielden"],
         "gehouden"),
        ("brengen", ["breng", "brengt", "brengen"], ["bracht", "brachten"],
         "gebracht"),
        ("nemen", ["neem", "neemt", "nemen"], ["nam", "namen"], "genomen"),
        ("geven", ["geef", "geeft", "geven"], ["gaf", "gaven"], "gegeven"),
        ("helpen", ["help", "helpt", "helpen"], ["hielp", "hielpen"],
         "geholpen"),
        ("lijken", ["lijk", "lijkt", "lijken"], ["leek", "leken"],
         "geleken"),
        ("heten", ["heet", "heten"], ["heette", "heetten"], "geheten"),
        ("schijnen", ["schijn", "schijnt"], ["scheen", "schenen"],
         "geschenen"),
        ("hoeven", ["hoef", "hoeft", "hoeven"], ["hoefde", "hoefden"],
         "gehoeven"),
        ("durven", ["durf", "durft", "durven"], ["durfde", "dorst"],
         "gedurfd"),
        ("eten", ["eet", "eten"], ["at", "aten"], "gegeten"),
        ("lezen", ["lees", "leest", "lezen"], ["las", "lazen"], "gelezen"),
        ("rijden", ["rijd", "rijdt", "rijden"], ["reed", "reden"],
         "gereden"),
        ("schrijven", ["schrijf", "schrijft", "schrijven"],
         ["schreef", "schreven"], "geschreven"),
        ("spreken", ["spreek", "spreekt", "spreken"],
         ["sprak", "spraken"], "gesproken"),
        ("vallen", ["val", "valt", "vallen"], ["viel", "vielen"],
         "gevallen"),
        ("vragen", ["vraag", "vraagt", "vragen"], ["vroeg", "vroegen"],
         "gevraagd"),
        ("dragen", ["draag", "draagt", "dragen"], ["droeg", "droegen"],
         "gedragen"),
        ("slapen", ["slaap", "slaapt", "slapen"], ["sliep", "sliepen"],
         "geslapen"),
        ("kopen", ["koop", "koopt", "kopen"], ["kocht", "kochten"],
         "gekocht"),
        ("zoeken", ["zoek", "zoekt", "zoeken"], ["zocht", "zochten"],
         "gezocht"),
        ("beginnen", ["begin", "begint", "beginnen"],
         ["begon", "begonnen"], "begonnen"),
        ("begrijpen", ["begrijp", "begrijpt", "begrijpen"],
         ["begreep", "begrepen"], "begrepen"),
        ("spelen", ["speel", "speelt", "spelen"],
         ["speelde", "speelden"], "gespeeld"),
        ("horen", ["hoor", "hoort", "horen"], ["hoorde", "hoorden"],
         "gehoord"),
        ("voelen", ["voel", "voelt", "voelen"], ["voelde", "voelden"],
         "gevoeld"),
        ("winnen", ["win", "wint", "winnen"], ["won", "wonnen"],
         "gewonnen"),
        ("verliezen", ["verlies", "verliest", "verliezen"],
         ["verloor", "verloren"], "verloren"),
        ("vertellen", ["vertel", "vertelt", "vertellen"],
         ["vertelde", "vertelden"], "verteld"),
        ("sterven", ["sterf", "sterft", "sterven"],
         ["stierf", "stierven"], "gestorven"),
        ("trekken", ["trek", "trekt", "trekken"], ["trok", "trokken"],
         "getrokken"),
        ("vliegen", ["vlieg", "vliegt", "vliegen"],
         ["vloog", "vlogen"], "gevlogen"),
        ("varen", ["vaar", "vaart", "varen"], ["voer", "voeren"],
         "gevaren"),
        ("slaan", ["sla", "slaat", "slaan"], ["sloeg", "sloegen"],
         "geslagen"),
        ("vangen", ["vang", "vangt", "vangen"], ["ving", "vingen"],
         "gevangen"),
        ("hangen", ["hang", "hangt", "hangen"], ["hing", "hingen"],
         "gehangen"),
        ("springen", ["spring", "springt", "springen"],
         ["sprong", "sprongen"], "gesprongen"),
        ("drinken", ["drink", "drinkt", "drinken"],
         ["dronk", "dronken"], "gedronken"),
        ("spijten", ["spijt"], ["speet"], "gespeten"),
        ("kijken", ["kijk", "kijkt", "kijken"], ["keek", "keken"],
         "gekeken"),
        ("roepen", ["roep", "roept", "roepen"], ["riep", "riepen"],
         "geroepen"),
        ("vergeten", ["vergeet", "vergeten"], ["vergat", "vergaten"],
         "vergeten"),
    ]
    for lemma, pres, past, part in verb_paradigms:
        stem = _verb_stem(lemma)
        for w in pres:
            e.setdefault(w, _pi("WW", lemma, (stem, "t") if w == stem + "t"
                                else (stem, "en") if w == lemma else (w,),
                                wvorm="pv", pvtijd="tgw"))
        for w in past:
            e.setdefault(w, _pi("WW", lemma,
                                (stem, w[len(stem):]) if w.startswith(stem)
                                and len(w) > len(stem) else (w,),
                                wvorm="pv", pvtijd="verl"))
        if part:
            m = (("ge", part[2:-2], "en") if part.startswith("ge")
                 and part.endswith("en") and len(part) > 5
                 else ("ge", part[2:-1], part[-1]) if part.startswith("ge")
                 else (part,))
            e.setdefault(part, _pi("WW", lemma, m, wvorm="vd"))

    return e


# Frog's verb-morpheme scheme (observed across the reference's golden
# FoLiA): every form segments as (present-stem, suffix-letters) — the
# stem is the LEMMA's present stem even for ablaut preterites ("liep" ->
# ("loop",), "dacht" -> ("denk","t")); a final d/t that the stem itself
# ends in belongs to the stem ("vond" -> ("vind",)); suppletive zijn
# forms are the bare lemma.
_IRREG_STEM = {"kunnen": "kan", "zullen": "zal", "mogen": "mag",
               "hebben": "heb", "zijn": "zijn", "gaan": "ga",
               "doen": "doe", "staan": "sta", "zien": "zie",
               "slaan": "sla"}
_WW_MORPH_EXC = {
    "geworden": ("ge", "worden"), "geweest": ("ge", "wees", "t"),
    "ging": ("gaan",), "gingen": ("gaan", "en"),
    "zeggen": ("zeg", "e", "n"), "leggen": ("leg", "e", "n"),
    "gegaan": ("ge", "ga"), "gedaan": ("ge", "doe"),
    "gestaan": ("ge", "sta"), "geslagen": ("ge", "sla", "en"),
}


def _split_stem(stem: str) -> tuple[str, ...]:
    """Derivational-prefix split inside the stem (Frog: "betekent" ->
    (be, teken, t), "verspillen" -> (ver, spil, en)); ge- initial
    lemmas stay whole ("gebruikt" -> (gebruik, t))."""
    for pre in ("ver", "be", "ont", "her"):
        if stem.startswith(pre) and len(stem) > len(pre) + 2:
            return (pre, stem[len(pre):])
    return (stem,)


def _ww_morphemes(surface: str, lemma: str) -> tuple[str, ...]:
    exc = _WW_MORPH_EXC.get(surface)
    if exc is not None:
        return exc
    if lemma == "zijn":
        return ("zijn",)
    stem = _IRREG_STEM.get(lemma) or _verb_stem(lemma)
    if surface.startswith("ge") and not lemma.startswith("ge") \
            and surface != stem and not stem.startswith("ge"):
        # participle circumfix: (ge, present-stem[, ending])
        if surface.endswith("en"):
            return ("ge", stem, "en")
        if surface.endswith("n"):
            return ("ge", stem, "n")
        if surface[-1] in "dt":
            if stem[-1] == surface[-1]:
                return ("ge", stem)
            return ("ge", stem, surface[-1])
        return ("ge", stem)
    parts = _split_stem(stem)
    if surface == stem:
        return parts
    if surface.endswith(("de", "te")) and len(surface) > 3:
        return parts + (surface[-2:],)
    if surface.endswith(("den", "ten")) and surface != lemma \
            and len(surface) > 4:
        return parts + (surface[-3:],)
    if surface.endswith("en"):
        return parts + ("en",)
    if surface.endswith("n") and surface == lemma:
        return parts + ("n",)
    if surface[-1] in "dt":
        if stem[-1] == surface[-1]:
            return parts
        return parts + (surface[-1],)
    return parts


def _verb_stem(lemma: str) -> str:
    """Infinitive -> written stem (standard Dutch spelling rules:
    undouble the open-syllable vowel, devoice v/z)."""
    if lemma.endswith("en") and len(lemma) > 3:
        stem = lemma[:-2]
    elif lemma.endswith("n"):
        stem = lemma[:-1]
    else:
        return lemma
    if len(stem) >= 2 and stem[-1] == stem[-2] and stem[-1] not in "aeiou":
        stem = stem[:-1]  # zetten -> zet
    elif (len(stem) >= 2 and stem[-1] not in "aeiou"
          and stem[-2] in "aeou"
          and (len(stem) < 3 or stem[-3] not in "aeiou")):
        stem = stem[:-1] + stem[-2] + stem[-1]  # maken -> maak
    if stem.endswith("v"):
        stem = stem[:-1] + "f"  # schrijven -> schrijf
    elif stem.endswith("z"):
        stem = stem[:-1] + "s"  # reizen -> reis
    return stem


_CLOSED = _closed_entries()

# words whose tag is context-dependent (resolved in the repair passes) —
# the plain closed/lexicon entry is only the default reading
_AMBIG = frozenset({"het", "dat", "die", "zijn", "haar", "toen", "een"})

# month / weekday names: Frog tags these SPEC(deeleigen) (name-like)
_SPEC_WORDS = frozenset({
    "januari", "februari", "maart", "april", "mei", "juni", "juli",
    "augustus", "september", "oktober", "november", "december",
    "maandag", "dinsdag", "woensdag", "donderdag", "vrijdag",
    "zaterdag", "zondag"})

# copula / linking verb lemmas (predicative-ADJ context cue)
_COPULA_LEMMAS = frozenset({"zijn", "worden", "blijven", "lijken",
                            "blijken", "schijnen", "heten", "voelen"})
# degree words whose complement is an adjective ("heel gek", "te laat")
_DEGREE_WORDS = frozenset({"heel", "erg", "zo", "te", "zeer", "vrij",
                           "nogal", "best", "hartstikke", "ontzettend"})
# separable-verb particles (standard Dutch separable prefixes)
_PARTICLES = ("af", "aan", "bij", "binnen", "door", "in", "klaar",
              "langs", "mee", "na", "neer", "om", "onder", "op", "open",
              "over", "rond", "samen", "terug", "toe", "uit", "vast",
              "voor", "weg")


def _lookup(lword: str, lex: Lexicons) -> PosInfo | None:
    """Lexicon + closed-class lookup.  The hand-curated lexicon entries
    (they carry CGN feats) win; the AUTO-derived POS entries the lexicon
    builder folds in from the published semtype/connective lists (bare,
    featless — e.g. "zit" as a noun lemma) yield to the closed-class
    function-word/paradigm table, which is CGN-grounded."""
    info = lex.pos.get(lword)
    closed = _CLOSED.get(lword)
    if closed is not None and (
            info is None
            or (info.feat("auto") == "1" and info.tag != closed.tag)):
        return closed
    return info

# ---------------------------------------------------------------------------
# Morphological guesser
# ---------------------------------------------------------------------------

# (inflected form, lemma-recovery strip) pairs ordered longest-first:
# bare derivational suffixes plus their -e inflections with Dutch
# spelling changes (baar+e -> bare, loos+e -> loze, zaam+e -> zame)
_ADJ_SUFFIXES = ("achtige", "waardige", "ische", "lijke", "matige",
                 "achtig", "waardig", "bare", "zame", "loze", "volle",
                 "ige", "isch", "lijk", "baar", "zaam", "loos", "matig",
                 "vol", "ig")
_ADJ_INFLECTED = frozenset({"achtige", "waardige", "ische", "lijke",
                            "matige", "bare", "zame", "loze", "volle",
                            "ige"})
_N_SUFFIXES = ("heid", "ing", "tie", "sie", "schap", "sel", "iteit",
               "isme", "eur", "erij", "age", "theek", "ment", "nis",
               "aar", "ier", "dom", "um", "ist")
# derivational prefixes that form ge--less participles (verteld, beloofd)
_VERB_PREFIXES = ("ver", "be", "ont", "her", "ge", "er")

_SUBJ_PRONOUNS = frozenset({
    "ik", "jij", "je", "hij", "zij", "ze", "wij", "we", "u", "men",
    "jullie", "het", "dat", "die", "dit", "deze", "iedereen", "iemand",
    "niemand", "alles", "er", "wie", "ie"})


def _noun_lemma(lword: str) -> tuple[str, tuple[str, ...]]:
    """Plural -en/-s noun -> (lemma, morphemes) via inverse spelling rules."""
    if lword.endswith("'s"):
        return lword[:-2], (lword[:-2], "s")
    if lword.endswith("s") and len(lword) > 4 and lword[-2] not in "aeiou'":
        return lword[:-1], (lword[:-1], "s")
    if lword.endswith("eren") and len(lword) > 5:  # kinderen -> kind
        return lword[:-4], (lword[:-4], "en")
    if lword.endswith("en") and len(lword) > 4:
        stem = lword[:-2]
        if stem[-1] == stem[-2]:
            lemma = stem[:-1]  # katten -> kat
        elif stem.endswith("v"):
            lemma = stem[:-1] + "f"  # brieven -> brief
            lemma = _redouble(lemma)
        elif stem.endswith("z"):
            lemma = stem[:-1] + "s"
            lemma = _redouble(lemma)
        else:
            lemma = _redouble(stem)
        return lemma, (lemma, "en")
    return lword, (lword,)


def _deinflect_e(lword: str) -> str:
    """Inflected adjective/noun -e form -> base with spelling undone
    (bare -> baar, loze -> loos, volle -> vol, dikke -> dik)."""
    base = lword[:-1]
    if len(base) >= 2 and base[-1] == base[-2] and base[-1] not in "aeiou":
        return base[:-1]
    if base.endswith("z"):
        base = base[:-1] + "s"
    elif base.endswith("v"):
        base = base[:-1] + "f"
    return _redouble(base)


def _redouble(stem: str) -> str:
    """Open-syllable vowel restoration: og -> oog, hus -> huus (only
    single a/e/o/u before the final consonant)."""
    if (len(stem) >= 2 and stem[-1] not in "aeiou" and stem[-2] in "aeou"
            and (len(stem) < 3 or stem[-3] not in "aeiou")):
        return stem[:-1] + stem[-2] + stem[-1]
    return stem


def _finite_lemma(lword: str, strip: int) -> tuple[str, tuple[str, ...]]:
    """Finite form minus its ending -> (infinitive lemma, morphemes)."""
    stem = lword[:-strip] if strip else lword
    suffix = lword[len(stem):]
    # stem+en with spelling rules: maak+en -> maken, zet+en -> zetten
    s = stem
    if s.endswith("f") and len(s) > 2:
        inf_stem = s[:-1] + "v"
    elif s.endswith("s") and len(s) > 2 and s[-2] not in "st":
        inf_stem = s[:-1] + "z"
    else:
        inf_stem = s
    if (len(inf_stem) >= 3 and inf_stem[-1] not in "aeiou"
            and inf_stem[-2] in "aeou" and inf_stem[-3] == inf_stem[-2]):
        lemma = inf_stem[:-2] + inf_stem[-1] + "en"  # maak -> maken
    elif (len(inf_stem) >= 2 and inf_stem[-1] not in "aeiouwy"
          and inf_stem[-2] in "aeiou"
          and (len(inf_stem) < 3 or inf_stem[-3] not in "aeiou")):
        lemma = inf_stem + inf_stem[-1] + "en"  # zet -> zetten
    else:
        lemma = inf_stem + "en"
    return lemma, (stem, suffix) if suffix else (stem,)


def _guess_participle(lword: str, lex: Lexicons) -> PosInfo | None:
    """Past-participle morphology (checked BEFORE the semtype lexicons:
    Frog tags lexicalized participles like "gewenst"/"gebouwd" WW(vd)
    even when an adjective reading exists — the engine's hidden-adj rule
    recovers the ADJ semtype separately)."""
    # participle circumfix ge-X-d/t/en (stem >= 3 to dodge geld/gezicht
    # false positives), incl. the inflected -de/-te/-e prenominal forms
    if lword.startswith("ge") and len(lword) >= 7:
        if lword.endswith("en"):
            stem = lword[2:-2]
            lemma, _m = _finite_lemma(stem, 0)
            return _pi("WW", lemma, ("ge", stem, "en"), wvorm="vd")
        if lword[-1] in "dt" and lword[-2] not in "dt":
            stem = lword[2:-1]
            lemma, _m = _finite_lemma(stem, 0)
            return _pi("WW", lemma, ("ge", stem, lword[-1]), wvorm="vd")
        if (lword[-1] == "e" and lword[-2] in "dt"
                and len(lword) >= 8):  # gewenste, geordende
            stem = lword[2:-2]
            lemma, _m = _finite_lemma(stem, 0)
            return _pi("WW", lemma, ("ge", stem, lword[-2:]), wvorm="vd",
                       positie="prenom")
    # separable-verb participles: op-ge-stuurd, mee-ge-nomen
    for part in _PARTICLES:
        if (lword.startswith(part + "ge") and len(lword) > len(part) + 5
                and (lword[-1] in "dte" or lword.endswith("en"))):
            g = _guess_participle(lword[len(part):], lex)
            if g is not None:
                return _pi("WW", part + g.lemma, (part,) + g.morphemes,
                           wvorm="vd", positie=g.feat("positie") or "vrij")
    # prefixed ge-less participles: verteld, beloofd, ontdekt, herkend
    # (-dt can only be a finite 2/3sg form — besteedt, verandert niet)
    for pre in ("ver", "be", "ont", "her"):
        if (lword.startswith(pre) and lword[-1] in "dt"
                and not lword.endswith(("de", "te", "heid", "dt"))
                and len(lword) > len(pre) + 3):
            lemma, _m = _finite_lemma(lword[:-1], 0) if lword[-1] == "d" \
                else _finite_lemma(lword, 1)
            return _pi("WW", lemma, (pre, lword[len(pre):]), wvorm="vd")
    return None


def _guess_open(lword: str, lex: Lexicons) -> PosInfo | None:
    """Context-free open-class guess; None = undecided (noun default
    applied later so context passes can still promote)."""
    part = _guess_participle(lword, lex)
    if part is not None:
        return part

    # published semtype lexicons double as POS evidence
    if lword in lex.verb_sem and lword.endswith("n"):
        stem = _verb_stem(lword)
        return _pi("WW", lword, (stem, "en"), wvorm="inf")
    if lword in lex.adj_sem:
        return _pi("ADJ", lword)
    if lword in lex.noun_sem:
        return _pi("N", lword)
    if lword in lex.adverbs:
        return _pi("BW", lword)
    if lword in lex.afkos:
        return _pi("SPEC", lword)

    # negative-prefix adjectives: on- + a known/derivable adjective
    if lword.startswith("on") and len(lword) > 5:
        rest = lword[2:]
        if (rest in lex.adj_sem or rest in _CLOSED and
                _CLOSED[rest].tag == "ADJ"):
            return _pi("ADJ", lword, ("on", rest))

    # adjective derivational suffixes (incl. inflected -e variants)
    for sfx in _ADJ_SUFFIXES:
        if lword.endswith(sfx) and len(lword) > len(sfx) + 2:
            if sfx in _ADJ_INFLECTED:
                base = _deinflect_e(lword)
                return _pi("ADJ", base, (base, "e"))
            return _pi("ADJ", lword)
    if lword.startswith("on") and len(lword) > 5:
        inner = _guess_open(lword[2:], lex)
        if inner is not None and inner.tag == "ADJ":
            return _pi("ADJ", lword, ("on",) + inner.morphemes)

    # present participle -end(e): CGN tags these WW(od)
    if lword.endswith("ende") and len(lword) > 6:
        lemma, _m = _finite_lemma(lword[:-4], 0)
        return _pi("WW", lemma, (lword[:-1], "e"), wvorm="od",
                   positie="prenom")
    if lword.endswith("end") and len(lword) > 5:
        lemma, _m = _finite_lemma(lword[:-3], 0)
        return _pi("WW", lemma, (lword,), wvorm="od", positie="vrij")

    # noun derivational suffixes
    for sfx in _N_SUFFIXES:
        if lword.endswith(sfx) and len(lword) > len(sfx) + 2:
            stem = lword[: -len(sfx)]
            pre = next((p for p in ("ver", "be", "ont", "her", "ge")
                        if stem.startswith(p) and len(stem) > len(p) + 2),
                       None)
            morphs = (pre, stem[len(pre):], sfx) if pre else (stem, sfx)
            return _pi("N", lword, morphs)
    # diminutives
    for sfx in ("tje", "pje", "kje", "je"):
        if lword.endswith(sfx) and len(lword) > len(sfx) + 2:
            return _pi("N", lword, (lword[: -len(sfx)], sfx))
    return None


# ---------------------------------------------------------------------------
# The tagger
# ---------------------------------------------------------------------------

def tag_sentence(tokens: list[str], lex: Lexicons) -> list[Decision]:
    """Tag one sentence: per-token lexicon/closed-class/guess decisions
    followed by sentence-context repair passes."""
    n = len(tokens)
    ds: list[Decision] = []
    for i, tok in enumerate(tokens):
        lword = tok.lower()
        if is_punct(tok):
            ds.append(Decision(None, punct=True))
            continue
        info = _lookup(lword, lex)
        # bare auto-lexicon ADJ/N entries (semtype lemma lists) yield to
        # participle morphology: Frog tags "gebouwd"/"verwend" WW(vd)
        # even though the adjective lexicons list them (the hidden-adj
        # rule recovers their ADJ semtype)
        if info is not None and info.feat("auto") == "1" \
                and info.tag in ("ADJ", "N"):
            part = _guess_participle(lword, lex)
            if part is not None:
                info = part
        # clause-initial-like position: sentence start or right after
        # punctuation (colon/quote/comma) — capitalization there is not
        # name evidence for known words
        initial = i == 0 or ds[i - 1].punct
        # all-caps emphasis of a known word is not a name either
        shouty = tok.isupper() and len(tok) > 1 and info is not None
        is_name = (tok[0].isupper() and not shouty
                   and (not initial or info is None)
                   and lword not in _SPEC_WORDS)
        if is_name:
            ds.append(Decision(None, is_name=True))
            continue
        if lword in _SPEC_WORDS and (info is None or not info.feats):
            # months/weekdays: SPEC names in Frog's tagging
            ds.append(Decision(None, is_name=True))
            continue
        if info is None:
            if (lword in lex.afkos or lword.rstrip(".") in lex.afkos
                    # unknown dotted token mid-sentence = abbreviation
                    # (Frog tags these SPEC(afk))
                    or ("." in lword.rstrip(".") or
                        (lword.endswith(".") and i + 1 < n
                         and 2 <= len(lword) <= 8))):
                info = _pi("SPEC", lword)
            else:
                head = lword.rstrip("-.,")
                if head and head.replace(".", "").replace(",", "") \
                        .replace(":", "").isdigit():
                    info = _pi("TW", lword)
                elif head and head[0].isdigit() and head[-1].isalpha():
                    info = _pi("ADJ", lword)
                else:
                    info = _guess_open(lword, lex)
        ds.append(Decision(info))

    _context_passes(tokens, ds, lex, n)

    # anything still undecided -> noun; plural-shaped unknowns get the
    # plural lemma/morphemes (Frog's N(soort,mv) reading)
    for i, d in enumerate(ds):
        if d.info is None and not d.punct and not d.is_name:
            lword = tokens[i].lower()
            if lword.endswith(("en", "s")) and len(lword) > 4 \
                    and _prev_tag(ds, i) in ("LID", "VNW", "ADJ", "TW"):
                lemma, morphs = _noun_lemma(lword)
                d.info = _pi("N", lemma, morphs)
            else:
                d.info = _pi("N", lword)

    # final morphology normalization (Frog's segmentation conventions)
    for i, d in enumerate(ds):
        if d.punct or d.is_name or d.info is None:
            continue
        info = d.info
        m = info.morphemes
        if info.tag == "WW":
            if m and len(m) >= 2 and (m[0] in _PARTICLES
                                      or m[0] in ("ver", "be", "ont",
                                                  "her")):
                continue  # guessed prefixed participle keeps structure
            new = _ww_morphemes(tokens[i].lower(), info.lemma)
        elif info.tag == "N" and len(m) == 1:
            lw = tokens[i].lower()
            comp = lex.compounds.get(info.lemma)
            stem_parts = None
            if comp is not None and comp[2] >= 2 and comp[1]:
                stem_parts = (comp[1], comp[0])  # (satellite, head)
            if lw != info.lemma and lw.endswith(("en", "s")) \
                    and len(lw) > 4:
                # real plural: (lemma-stem[, compound-split], plural sfx)
                sfx = "en" if lw.endswith("en") else "s"
                new = (stem_parts or (info.lemma,)) + (sfx,)
            elif stem_parts is not None:
                new = stem_parts
            elif (lw.endswith("en") and len(lw) > 4
                  and _noun_lemma(lw)[0] in lex.noun_sem):
                new = (_noun_lemma(lw)[0], "en")
            else:
                continue
        elif info.tag == "BW" and len(m) == 1:
            lw = tokens[i].lower()
            new = _BW_MORPHS.get(lw)
            if new is None:
                for r in ("daar", "hier", "waar", "er"):
                    if lw.startswith(r) and len(lw) > len(r) + 1:
                        new = (r, lw[len(r):])  # pronominal adverb
                        break
            if new is None:
                continue
        elif info.tag == "TW" and len(m) == 1:
            new = _TW_MORPHS.get(tokens[i].lower())
            if new is None:
                continue
        elif info.tag == "ADJ" and len(m) == 1:
            lw = tokens[i].lower()
            new = None
            for sfx in _ADJ_SUFFIXES:
                if sfx in _ADJ_INFLECTED:
                    continue
                if lw.endswith(sfx) and len(lw) > len(sfx) + 2:
                    # derivational split ("eigenlijk" -> (eigen, lijk),
                    # "hartelijk" -> (hart, elijk): e belongs to suffix)
                    stem = lw[: -len(sfx)]
                    if stem.endswith("e") and sfx in ("lijk", "loos"):
                        stem = stem[:-1]
                        sfx = "e" + sfx
                    new = (stem, sfx)
                    break
            if new is None:
                continue
        else:
            continue
        if new != m:
            d.info = PosInfo(info.tag, info.lemma, new, info.feats)
    return ds


# Frog morpheme splits for closed-class items
_BW_MORPHS = {"eens": ("een", "s"), "misschien": ("misschien",),
              "vandaag": ("van", "daag"), "vanavond": ("van", "avond"),
              "vanmorgen": ("van", "morgen"),
              "vanmiddag": ("van", "middag"),
              "vannacht": ("van", "nacht"), "zelfs": ("zelf", "s"),
              "thuis": ("te", "huis"), "bovendien": ("boven", "dien"),
              "daarom": ("daar", "om"), "daarna": ("daar", "na"),
              "daardoor": ("daar", "door")}
_TW_MORPHS = {"eerste": ("een", "ste"), "tweede": ("twee", "de"),
              "derde": ("drie", "de"), "vierde": ("vier", "de"),
              "vijfde": ("vijf", "de"), "zesde": ("zes", "de"),
              "zevende": ("zeven", "de"), "achtste": ("acht", "ste"),
              "negende": ("negen", "de"), "tiende": ("tien", "de"),
              "twintig": ("twee", "tig"), "dertig": ("drie", "tig"),
              "veertig": ("vier", "tig"), "vijftig": ("vijf", "tig"),
              "zestig": ("zes", "tig"), "zeventig": ("zeven", "tig"),
              "tachtig": ("acht", "tig"), "negentig": ("negen", "tig"),
              "vijfduizend": ("vijf", "duizend"),
              "vijftien": ("vijf", "tien"), "veertien": ("vier", "tien"),
              "dertien": ("drie", "tien"), "zestien": ("zes", "tien"),
              "zeventien": ("zeven", "tien"), "achttien": ("acht", "tien"),
              "negentien": ("negen", "tien")}


def _prev_tag(ds: list[Decision], i: int) -> str:
    for j in range(i - 1, -1, -1):
        if ds[j].punct:
            return "LET"
        if ds[j].is_name:
            return "SPEC"
        if ds[j].info is not None:
            return ds[j].info.tag
        return ""
    return ""


def _next_idx(ds: list[Decision], i: int) -> int:
    for j in range(i + 1, len(ds)):
        if not ds[j].punct:
            return j
    return -1


def _nounish_ahead(tokens, ds, i, lex, max_hops=3) -> bool:
    """Is an NP head plausibly starting at position i (N / name /
    undecided-unknown, optionally after ADJ/TW modifiers)?"""
    hops = 0
    j = i
    while 0 <= j < len(ds) and hops < max_hops:
        d = ds[j]
        if d.punct:
            return False
        if d.is_name:
            return True
        if d.info is None:
            return True  # unknown open-class: noun-biased
        t = d.info.tag
        if t == "N":
            return True
        if t in ("ADJ", "TW") or (t == "WW" and
                                  d.info.feat("wvorm") in ("vd", "od")):
            j = _next_idx(ds, j)
            hops += 1
            continue
        return False
    return False


def _context_passes(tokens, ds, lex, n):
    lowers = [t.lower() for t in tokens]

    # -- ambiguous function words ---------------------------------------
    for i, d in enumerate(ds):
        lw = lowers[i]
        if d.punct or d.is_name or lw not in _AMBIG:
            continue
        nx = _next_idx(ds, i)
        if lw == "het":
            # article before an NP head OR a substantivized adjective
            # ("het weinige dat ...", reference tests/d6)
            if nx >= 0 and (_nounish_ahead(tokens, ds, nx, lex)
                            or (ds[nx].info is not None
                                and (ds[nx].info.tag == "ADJ"
                                     # nominalized infinitive ("het
                                     # lopen is leuk")
                                     or (ds[nx].info.tag == "WW"
                                         and ds[nx].info.feat("wvorm")
                                         == "inf")))):
                d.info = _pi("LID", "het")
            else:
                d.info = _pi("VNW", "het", vwtype="pers", persoon="3")
        elif lw == "een":
            d.info = _pi("LID", "een")
        elif lw in ("die", "dat"):
            pass  # resolved below (needs neighbors' final tags)
        elif lw == "zijn":
            pv = _prev_tag(ds, i)
            prev_lw = lowers[i - 1] if i else ""
            if nx >= 0 and _nounish_ahead(tokens, ds, nx, lex):
                d.info = _CLOSED["zijn\x00bez"]
            elif prev_lw == "te" or (pv == "WW"):
                d.info = _pi("WW", "zijn", ("zijn",), wvorm="inf")
            else:
                d.info = _pi("WW", "zijn", ("ben", "en"), wvorm="pv",
                             pvtijd="tgw")
        elif lw == "haar":
            if nx >= 0 and _nounish_ahead(tokens, ds, nx, lex):
                d.info = _CLOSED["haar\x00bez"]
            else:
                d.info = _pi("VNW", "haar", vwtype="pers", persoon="3")
        elif lw == "toen":
            nxt = ds[nx] if nx >= 0 else None
            if (nxt is not None and nxt.info is not None
                    and nxt.info.tag == "WW"
                    and nxt.info.feat("wvorm") == "pv"):
                d.info = _pi("BW", "toen")
            else:
                d.info = _pi("VG", "toen", conjtype="onder")

    # -- die/dat: determiner / relative / demonstrative / complementizer
    for i, d in enumerate(ds):
        lw = lowers[i]
        if d.punct or d.is_name or lw not in ("die", "dat"):
            continue
        if d.info is not None and d.info.tag == "VG" and lw == "dat":
            continue  # lexicon already says VG; leave it
        nx = _next_idx(ds, i)
        pv = _prev_tag(ds, i)
        if nx >= 0 and _nounish_ahead(tokens, ds, nx, lex):
            d.info = _pi("VNW", lw, vwtype="aanw")  # prenominal determiner
            continue
        if pv in ("N", "SPEC"):
            if lw == "dat":
                # saturated embedded clause -> complementizer; else the
                # reference's Frog run keeps aanw,pron (cp vs rel is the
                # parser's job — see features dat-pass provenance)
                args = 0
                for j in range(i + 1, n):
                    dj = ds[j]
                    if dj.punct:
                        continue
                    ij = dj.info
                    if ij is not None and ij.tag == "WW" \
                            and ij.feat("wvorm") == "pv":
                        break
                    if (dj.is_name or ij is None or ij.tag == "N"
                            or (ij.tag == "VNW"
                                and ij.feat("vwtype") in ("pers", "pr",
                                                          "refl"))
                            or lowers[j] == "er"):
                        args += 1
                if args >= 2:
                    d.info = _pi("VG", "dat", conjtype="onder")
                else:
                    d.info = _pi("VNW", lw, vwtype="aanw")
            else:
                d.info = _pi("VNW", lw, vwtype="betr")
        elif pv == "WW" and lw == "dat":
            d.info = _pi("VG", "dat", conjtype="onder")
        elif d.info is None or d.info.tag != "VG":
            d.info = _pi("VNW", lw, vwtype="aanw")

    # -- "als": prepositional unless a finite clause follows -------------
    for i, d in enumerate(ds):
        if d.punct or d.is_name or lowers[i] != "als":
            continue
        if d.info is None or d.info.tag != "VG":
            continue
        has_fin = False
        for j in range(i + 1, n):
            dj = ds[j]
            if dj.punct or dj.info is None:
                continue
            if dj.info.tag == "VG":
                break
            if dj.info.tag == "WW" and dj.info.feat("wvorm") == "pv":
                has_fin = True
                break
        if not has_fin:
            d.info = _pi("VZ", "als")

    # -- auto-lexicon overrides: the semtype-derived POS entries are
    # lemma lists, not taggers — strong local context beats them --------
    for i, d in enumerate(ds):
        if d.punct or d.is_name or d.info is None:
            continue
        lw = lowers[i]
        pv = _prev_tag(ds, i)
        prev_lw = lowers[i - 1] if i else ""
        # bare auto-N after a copula/degree word and no determiner:
        # predicative adjective ("is gek", "te laat")
        if d.info.tag == "N" and d.info.feat("auto") == "1":
            prev_cop = (pv == "WW" and i and ds[i - 1].info is not None
                        and ds[i - 1].info.lemma in _COPULA_LEMMAS)
            if (prev_cop or prev_lw in _DEGREE_WORDS) \
                    and not lw.endswith(("en", "s")):
                if lw in lex.adj_sem or not _nounish_ahead(
                        tokens, ds, _next_idx(ds, i), lex):
                    d.info = _pi("ADJ", lw)
                    continue
            # noun-lemma homograph adjacent to a personal subject
            # pronoun ("ik merk", "stuur ik", "ze snikt"): finite verb
            nx2 = _next_idx(ds, i)
            next_lw = lowers[nx2] if nx2 >= 0 else ""
            if not lw.endswith("en") and (
                    prev_lw in ("ik", "jij", "je", "u", "wij", "we")
                    or (next_lw in ("ik", "jij", "je", "u", "wij", "we")
                        and pv not in ("LID", "ADJ", "TW", "VZ"))
                    or (lw.endswith("t")
                        and prev_lw in ("hij", "zij", "ze", "men"))):
                lemma, morphs = _finite_lemma(
                    lw, 1 if lw.endswith("t") else 0)
                d.info = _pi("WW", lemma, morphs, wvorm="pv", pvtijd="tgw")
                continue
        # verb-lemma homograph after a plural determiner/numeral
        # ("de punten", "twee dingen"): plural noun, not infinitive —
        # "het" + inf stays verbal (nominalized infinitive, WW in CGN)
        if (d.info.tag == "WW" and d.info.feat("wvorm") == "inf"
                and lw.endswith("en")
                and (prev_lw in ("de", "deze", "die", "alle", "sommige",
                                 "veel", "weinig", "mijn", "zijn", "hun")
                     or pv in ("ADJ", "TW")
                     # bare "met/zonder punten": nominal, infinitives
                     # under a preposition need "te"
                     or (pv == "VZ" and d.info.feat("auto") == "1"
                         and prev_lw not in ("te", "om")))):
            lemma, morphs = _noun_lemma(lw)
            d.info = _pi("N", lemma, morphs)
            continue
        # bare auto-ADJ right after a determiner with no NP head ahead:
        # substantivized/plural noun reading ("de stenen waren ...")
        if (d.info.tag == "ADJ" and d.info.feat("auto") == "1"
                and pv in ("LID", "VNW") and lw.endswith("en")):
            nx2 = _next_idx(ds, i)
            if nx2 < 0 or not _nounish_ahead(tokens, ds, nx2, lex):
                lemma, morphs = _noun_lemma(lw)
                d.info = _pi("N", lemma, morphs)
                continue
        # degree "te" before an adjective/adverb is BW; infinitival
        # "te" stays VZ
        if lw == "te" and d.info.tag == "VZ":
            nx = _next_idx(ds, i)
            if nx >= 0 and not ds[nx].punct and not ds[nx].is_name:
                ni = ds[nx].info
                if (ni is not None and ni.tag in ("ADJ", "BW")) or (
                        ni is None and not lowers[nx].endswith("en")):
                    d.info = _pi("BW", "te")

    # -- undecided open-class words with strong local cues ----------------
    for i, d in enumerate(ds):
        if d.punct or d.is_name or d.info is not None:
            continue
        lw = lowers[i]
        pv = _prev_tag(ds, i)
        prev_lw = lowers[i - 1] if i else ""
        nx = _next_idx(ds, i)
        # predicative adjective: right after a copula or a degree word
        # ("is gek", "heel gauw", "te laat")
        prev_cop = (pv == "WW" and i and ds[i - 1].info is not None
                    and ds[i - 1].info.lemma in _COPULA_LEMMAS)
        if (prev_cop or prev_lw in _DEGREE_WORDS) and not lw.endswith("en"):
            d.info = _pi("ADJ", lw)
            continue
        # prenominal inflected adjective: -e between determiner and noun
        # ("de leuke kat", "een betere oplossing")
        if (lw.endswith("e") and len(lw) > 3 and pv in ("LID", "VNW", "TW")
                and nx >= 0 and _nounish_ahead(tokens, ds, nx, lex)
                and not ds[nx].punct):
            lemma = _deinflect_e(lw)
            d.info = _pi("ADJ", lemma, (lemma, "e"))
            continue
        # finite verb adjacent to a 1st/2nd-person subject pronoun
        # ("ik stuur", "stuur ik", "dank u"): bare-stem present form
        nbr = ((prev_lw in ("ik", "jij", "je", "u", "wij", "we"))
               or (nx >= 0 and lowers[nx] in ("ik", "jij", "je", "u",
                                              "wij", "we")))
        if nbr and not lw.endswith(("e", "en")) and pv not in (
                "LID", "ADJ", "TW", "VZ"):
            lemma, morphs = _finite_lemma(lw, 1 if lw.endswith("t") else 0)
            d.info = _pi("WW", lemma, morphs, wvorm="pv", pvtijd="tgw")
            continue

    # -- -en unknowns: infinitive vs plural noun -------------------------
    for i, d in enumerate(ds):
        if d.punct or d.is_name or d.info is not None:
            continue
        lw = lowers[i]
        if not lw.endswith("en") or len(lw) < 5:
            continue
        pv = _prev_tag(ds, i)
        prev_lw = lowers[i - 1] if i else ""
        if pv in ("LID", "ADJ", "TW") or (pv == "VNW" and prev_lw not in
                                          _SUBJ_PRONOUNS):
            continue  # determined NP -> noun default later
        # te/om..te/modal context, or clause-final after an earlier finite
        # verb -> infinitive
        aux_before = any(
            not dj.punct and dj.info is not None and dj.info.tag == "WW"
            and dj.info.feat("wvorm") == "pv" for dj in ds[:i])
        te_before = prev_lw == "te" or (i >= 2 and lowers[i - 2] == "te")
        at_clause_end = _next_idx(ds, i) < 0 or all(
            ds[j].punct or (ds[j].info is not None
                            and ds[j].info.tag in ("VZ", "BW", "LET"))
            for j in range(i + 1, n))
        pre = next((p for p in ("ver", "be", "ont", "her")
                    if lw.startswith(p)), None)
        if pre and aux_before and pv not in ("LID", "ADJ", "TW", "VZ"):
            # strong prefix participle after an auxiliary ("ligt ...
            # verscholen", "zijn ... vergaan")
            d.info = _pi("WW", lw, (pre, lw[len(pre):]), wvorm="vd")
        elif te_before or (aux_before and at_clause_end):
            stem = _verb_stem(lw)
            d.info = _pi("WW", lw, (stem, "en"), wvorm="inf")
        elif pv == "VNW" and prev_lw in _SUBJ_PRONOUNS and aux_before is False:
            # "wij werken": plural finite present
            lemma, _m = _finite_lemma(lw, 0)
            stem = _verb_stem(lw)
            d.info = _pi("WW", lw, (stem, "en"), wvorm="pv", pvtijd="tgw")

    # -- verb-second recovery: a main clause needs a finite verb ---------
    has_finite = any(
        not d.punct and d.info is not None and d.info.tag == "WW"
        and d.info.feat("wvorm") == "pv" for d in ds)
    if not has_finite and n >= 2:
        # candidate: first undecided token ending in a finite-looking
        # suffix after an initial subject-ish constituent
        for i in range(1, min(n, 6)):
            d = ds[i]
            if d.punct or d.is_name or d.info is not None:
                continue
            lw = lowers[i]
            pv = _prev_tag(ds, i)
            if pv in ("LID", "VZ", "TW"):
                continue
            if pv == "ADJ" and i >= 2 and _prev_tag(ds, i - 1) in (
                    "LID", "VNW"):
                continue  # inside an NP ("de grote X") — not the V2 slot
            if lw.endswith(("de", "te")) and len(lw) > 4:
                lemma, morphs = _finite_lemma(lw, 2)
                d.info = _pi("WW", lemma, morphs, wvorm="pv", pvtijd="verl")
                break
            if lw.endswith(("den", "ten")) and len(lw) > 5:
                lemma, morphs = _finite_lemma(lw, 3)
                d.info = _pi("WW", lemma, morphs, wvorm="pv", pvtijd="verl")
                break
            if lw.endswith("t") and len(lw) > 3:
                lemma, morphs = _finite_lemma(lw, 1)
                d.info = _pi("WW", lemma, morphs, wvorm="pv", pvtijd="tgw")
                break

    # -- participle / adjective position (prenom before an NP head) ------
    for i, d in enumerate(ds):
        if d.punct or d.is_name or d.info is None:
            continue
        if d.info.tag == "WW" and d.info.feat("wvorm") in ("vd", "od"):
            nx = _next_idx(ds, i)
            pos = "prenom" if (nx >= 0 and _nounish_ahead(tokens, ds, nx,
                                                          lex)) else "vrij"
            if d.info.feat("positie") != pos:
                feats = dict(d.info.feats)
                feats["positie"] = pos
                d.info = PosInfo(d.info.tag, d.info.lemma, d.info.morphemes,
                                 tuple(sorted(feats.items())))
