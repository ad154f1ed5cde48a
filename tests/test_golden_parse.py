"""Golden parse fixtures ported from the reference test corpus.

Sentences and expected values come from the reference's own golden tests
(reference tests/d0..d7.example + .ok for the D-level ladder,
reference tests/depdist{1,2,3,4,6,7,10,16,17,18,22}.example + .ok for
dependency distances).  The expected numbers below are the per-sentence
``<metric>`` values from the ``.ok`` FoLiA files (d_level,
sub_verb_dist .. verb_noun_dist, deplen, max_deplen), hand-transcribed;
the engine's reduced parser must reproduce them exactly.

Metric-name -> DD-type mapping per reference src/structstats.cxx:1342-1364.
Distance math: src/Alpino.cxx:274-292 (punctuation-corrected span).
"""

import math

import pytest

from tscan_ray.config import DEFAULT_CONFIG
from tscan_ray.text.features import analyze_sentence, featurize_document
from tscan_ray.text.lexicons import default_lexicons

LEX = default_lexicons()


def _sent_parse(text: str):
    fold = analyze_sentence(text.split(), None, LEX, DEFAULT_CONFIG)
    return fold.parses[0]


# (case, sentence from <name>.example, d_level from <name>.example.ok)
D_LEVEL_CASES = [
    ("d0s1", "Ze dienden als begraafplaats .", 0),
    ("d0s2", "Dat soort stenen begraafplaatsen was in die tijd niet ongewoon .", 0),
    ("d1s1", "Frans dacht te kunnen scoren met die goedkope songtekstjes van 'm .", 1),
    ("d1s2", "Piet vergat zijn haar te kammen .", 1),
    ("d2s2", "Maar in de provincie Drenthe liggen hun resten gewoon boven de grond .", 2),
    ("d2s5", "Die waren alleen te vinden in Drenthe , Denemarken en Noord-Duitsland .", 2),
    ("d3s1", "Men denkt dat zij daar tijdens een van de ijstijden , zo'n 150.000 jaar "
             "geleden , terecht zijn gekomen .", 3),
    ("d4s1", "Pietje is groter dan Jantje .", 4),
    ("d5s2", "Ook toen de wereld vijfduizend jaar jonger was , woonden er mensen in "
             "de Lage Landen .", 5),
    ("d6s1", "Het weinige dat zij hebben nagelaten , ligt meestal verscholen in de grond .", 6),
    ("d7s1", "Als de stenen op hun plek lagen , werd de grond eronder weggehaald , "
             "zodat er een grafkamer gemaakt wordt .", 7),
]


@pytest.mark.parametrize("name,text,want", D_LEVEL_CASES,
                         ids=[c[0] for c in D_LEVEL_CASES])
def test_d_level_golden(name, text, want):
    assert int(featurize_document(text)["D_level"]) == want


# (case, sentence, {metric: golden mean}, deplen, max_deplen); "NA" metrics
# (no edge of that type) are asserted absent
DEPDIST_CASES = [
    ("depdist1", "Jan gaat naar huis .",
     {"SUB_VERB": 0, "VERB_PP": 0, "PREP_OBJ1": 0}, 0.0, 0),
    ("depdist2", "De man met de pet gaat naar huis .",
     {"SUB_VERB": 3, "VERB_PP": 0, "NOUN_DET": 0, "PREP_OBJ1": 0.5},
     0.666667, 3),
    ("depdist3", "Jan en Piet gaan naar huis .",
     {"SUB_VERB": 2, "VERB_PP": 0, "PREP_OBJ1": 0, "CRD_CNJ": 0}, 0.4, 2),
    ("depdist5", "De man , met de pet op , gaat naar huis en zet een "
                 "bakje koffie .",
     {"CRD_CNJ": 1, "NOUN_DET": 0, "OBJ1_VERB": 1, "PREP_OBJ1": 0.5,
      "SUB_VERB": 6.5, "VERB_PP": 0}, 1.54545, 9),
    ("depdist8", "Ik zie de man met de pet daar staan .",
     {"NOUN_DET": 0, "OBJ1_VERB": 1, "PREP_OBJ1": 1, "SUB_VERB": 2.5,
      "VERB_VC": 6}, 1.85714, 6),
    ("depdist9", "Ik zie Jan en Piet daar staan .",
     {"CRD_CNJ": 0, "OBJ1_VERB": 0, "SUB_VERB": 1.5, "VERB_VC": 4},
     1.16667, 4),
    ("depdist11", "ik geef de man met de pet een boek .",
     {"NOUN_DET": 0, "OBJ2_VERB": 1, "OBJ1_VERB": 6, "PREP_OBJ1": 1,
      "SUB_VERB": 0}, 1.14286, 6),
    ("depdist12", "Ik geef Jan en Piet een boek .",
     {"CRD_CNJ": 0, "NOUN_DET": 0, "OBJ2_VERB": 0, "OBJ1_VERB": 4,
      "SUB_VERB": 0}, 0.66667, 4),
    ("depdist13", "Ik waardeer en bewonder hem .",
     {"CRD_CNJ": 0, "OBJ1_VERB": 1, "SUB_VERB": 1}, 0.66667, 2),
    ("depdist14", "Ik zie met eigen ogen de man met de pet daar staan .",
     {"NOUN_DET": 0, "OBJ1_VERB": 4, "PREP_OBJ1": 1, "SUB_VERB": 2.5,
      "VERB_PP": 0, "VERB_VC": 9}, 2.22222, 9),
    ("depdist15", "De grote boze wolf at na oma Roodkapje op als toetje .",
     {"NOUN_DET": 2, "PREP_OBJ1": 0, "SUB_VERB": 0, "VERB_COMP": 4,
      "VERB_PP": 0, "VERB_SVP": 3}, 1.5, 4),
    ("depdist20", "Hij maakte er mooie plaatjes bij , zodat Ko het beter "
                  "kon zien .",
     {"COMP_BODY": 3, "OBJ1_VERB": 2, "SUB_VERB": 1.66667, "VERB_MOD_A": 1,
      "VERB_MOD_BW": 0, "VERB_VC": 0}, 1.44444, 3),
    ("depdist4", "Jan gaat naar huis en zet een bakje koffie .",
     {"SUB_VERB": 2, "OBJ1_VERB": 1, "VERB_PP": 0, "NOUN_DET": 0,
      "PREP_OBJ1": 0, "CRD_CNJ": 1}, 0.875, 4),
    ("depdist6", "jan en Piet gaan naar huis en zetten een bakje koffie .",
     {"SUB_VERB": 4, "OBJ1_VERB": 1, "VERB_PP": 0, "NOUN_DET": 0,
      "PREP_OBJ1": 0, "CRD_CNJ": 0.5}, 1.1, 6),
    ("depdist7", "Ik zie hem daar staan .",
     {"SUB_VERB": 0.5, "OBJ1_VERB": 0, "VERB_VC": 2}, 0.75, 2),
    ("depdist10", "Ik geef hem een boek .",
     {"SUB_VERB": 0, "OBJ1_VERB": 2, "OBJ2_VERB": 0, "NOUN_DET": 0}, 0.5, 2),
    ("depdist16", "De man met de pet gaat naar huis .",
     {"SUB_VERB": 3, "VERB_PP": 0, "NOUN_DET": 0, "PREP_OBJ1": 0.5},
     0.666667, 3),
    ("depdist17", "Hij heeft de man met de pet gezien .",
     {"SUB_VERB": 3, "OBJ1_VERB": 3, "NOUN_DET": 0, "PREP_OBJ1": 1,
      "VERB_VC": 5}, 2.14286, 6),
    ("depdist18", "Hij ging naar huis omdat ie moe was .",
     {"SUB_VERB": 0.5, "VERB_PP": 0, "PREP_OBJ1": 0, "COMP_BODY": 2,
      "VERB_COMP": 2, "VERB_PREDC_A": 0}, 0.714286, 2),
    ("depdist19", "Jan en de man met de pet liepen naar huis .",
     {"SUB_VERB": 4.5, "VERB_PP": 0, "NOUN_DET": 0, "PREP_OBJ1": 0.5,
      "CRD_CNJ": 0.5}, 1.22222, 6),
    ("depdist21", "De kans dat hij Piet ziet is vrij klein .",
     {"SUB_VERB": 2.5, "OBJ1_VERB": 0, "NOUN_DET": 0, "COMP_BODY": 2,
      "NOUN_VC": 3, "VERB_PREDC_A": 1}, 1.57143, 4),
    # mod_bw / mod_adv / noun-adv goldens (reference tests/*.example.ok):
    # intensifier-below-AP, NP/advp-internal adverbs, temporal-noun
    # adjuncts, topicalized subject + fronted AP modifier
    ("mod_bw_s1", "Hij las het boek snel .",
     {"SUB_VERB": 0, "OBJ1_VERB": 1, "NOUN_DET": 0, "VERB_MOD_A": 2},
     0.75, 2),
    ("mod_bw_s2", "Hij las het boek erg vlug .",
     {"SUB_VERB": 0, "OBJ1_VERB": 1, "NOUN_DET": 0, "VERB_MOD_A": 3},
     1.0, 3),
    ("mod_adv_s1", "Erg geloofwaardig opereert hij als woordvoerder niet .",
     {"SUB_VERB": 0, "VERB_COMP": 1, "VERB_MOD_BW": 3, "VERB_MOD_A": 0},
     1.0, 3),
    ("mod_adv_s2", "Hij liep een halve marathon in een half uur gisteren .",
     {"SUB_VERB": 0, "OBJ1_VERB": 2, "NOUN_DET": 1, "PREP_OBJ1": 2,
      "VERB_MOD_BW": 7}, 2.16667, 7),
    ("mod_adv_s3", "Hij leest al jaren niet meer .",
     {"SUB_VERB": 0, "VERB_MOD_BW": 2, "VERB_NOUN": 1}, 1.0, 2),
    ("noun_adv_s1", "Hij loopt eeuwen achter .",
     {"SUB_VERB": 0, "VERB_SVP": 1, "VERB_NOUN": 0}, 0.333333, 1),
    ("noun_adv_s2", "hij is jaren niet thuis geweest .",
     {"SUB_VERB": 2, "VERB_VC": 3, "VERB_MOD_BW": 1, "VERB_NOUN": 2},
     2.0, 4),
    ("noun_adv_s3", "hij tennist al jaren niet meer .",
     {"SUB_VERB": 0, "VERB_MOD_BW": 2, "VERB_NOUN": 1}, 1.0, 2),
    ("depdist22s1", "Peter is al naar huis gegaan .",
     {"SUB_VERB": 2, "VERB_PP": 1, "PREP_OBJ1": 0, "VERB_VC": 3,
      "VERB_MOD_BW": 2}, 1.66667, 4),
    ("depdist22s3", "Peter heeft mijn fiets gestolen .",
     {"SUB_VERB": 1.5, "OBJ1_VERB": 0, "NOUN_DET": 0, "VERB_VC": 2},
     1.0, 3),
]

# DD types whose golden metric for the case is "NA": every type not named
# in the expected dict must have no stored edges
_ALL_TYPES = (
    "SUB_VERB", "OBJ1_VERB", "OBJ2_VERB", "VERB_PP", "VERB_VC",
    "VERB_COMP", "NOUN_DET", "PREP_OBJ1", "CRD_CNJ", "COMP_BODY",
    "NOUN_VC", "VERB_SVP", "VERB_PREDC_N", "VERB_PREDC_A",
    "VERB_MOD_BW", "VERB_MOD_A", "VERB_NOUN",
)


@pytest.mark.parametrize("name,text,want,deplen,maxdep", DEPDIST_CASES,
                         ids=[c[0] for c in DEPDIST_CASES])
def test_depdist_golden(name, text, want, deplen, maxdep):
    p = _sent_parse(text)
    for typ, mean in want.items():
        got = p.distances.get(typ)
        assert got, f"{typ}: no edges stored (want mean {mean})"
        assert math.isclose(sum(got) / len(got), mean, abs_tol=1e-4), \
            f"{typ}: want {mean}, got {got}"
    for typ in _ALL_TYPES:
        if typ not in want:
            assert typ not in p.distances, \
                f"{typ}: golden NA but engine stored {p.distances[typ]}"
    assert math.isclose(p.al_gem, deplen, abs_tol=1e-4)
    assert p.al_max == maxdep


def test_semicolon_golden():
    """Reference tests/semicolon.example + .ok: ### line comments and
    <<< ... >>> bracket comments are stripped by the reader; the
    remaining semicolon-joined line stays ONE sentence with 9 words
    (word_count 9, sentence_count 1 in the .ok metrics)."""
    from tscan_ray.text.tokenize import normalize_text

    raw = ("### een semicolon test\n"
           "<<< Met commentaar\n"
           "   en meer\n"
           ">>> ook dit is nog commentaar\n"
           "\n"
           "Dit zijn twee zinnen; althans, zo zien we dat.\n")
    f = featurize_document(normalize_text(raw))
    assert f["wordCnt"] == 9
    assert f["sentCnt"] == 1


REL_CLAUSE_CASES = [
    # (sentence from reference tests/relativeclauses.example, golden
    # per-sentence rel_count from the .ok metrics — resolveRelativeClauses
    # src/sentstats.cxx:544-620: whrel modifiers count, argument-position
    # free relatives and noun complements do not)
    ("Hij kwam omdat ik hem gevraagd had.", 0),
    ("Ik ga weg omdat ik moe ben en omdat ik naar bed wil.", 0),
    ("Zie je hem niet staan, ga dan meteen naar huis.", 0),
    ("Als je hem niet ziet staan, ga dan meteen naar huis.", 0),
    ("Wat u doet, is onaanvaardbaar.", 0),
    ("Wie te laat komt, laten we niet meer binnen.", 0),
    ("Wie het niet begrijpt, zal ik het nog eens uitleggen.", 1),
    ("Waar ik vandaan kom, houden ze juist van dat soort humor.", 1),
    ("Hij heeft over het touw gelopen zonder dat hij viel.", 0),
    ("De verwachting dat er een einde aan zou komen, werd niet "
     "bewaarheid.", 0),
    ("Hij is zo blind dat hij dat niet ziet.", 0),
]


@pytest.mark.parametrize("text,want", REL_CLAUSE_CASES,
                         ids=[f"rel{i}" for i in range(len(REL_CLAUSE_CASES))])
def test_relativeclauses_golden(text, want):
    from tscan_ray.text.tokenize import tokenize

    fold = analyze_sentence(tokenize(text), None, LEX, DEFAULT_CONFIG)
    assert fold.parses[0].betr_cnt == want


@pytest.mark.parametrize("text,np,npmod,adjmod,det", [
    # reference tests/npmod.example + .ok: np_count / np_modifier_count /
    # adj_np_modifier_count / noun_det_dist — numerals modify NPs but
    # are not ADJ mods, det skips the mod chain, quantifier pronouns
    # ("Alle") determine
    ("Een tweede huis .", 1, 1, 0, [1]),
    ("Alle boeken .", 1, 0, 0, [0]),
    ("De meeste boeken .", 1, 1, 1, [1]),
    ("Blaffende honden .", 1, 1, 1, None),
    ("De geasfalteerde wegen .", 1, 1, 1, [1]),
], ids=["np_tw", "np_alle", "np_meeste", "np_part", "np_geasf"])
def test_npmod_golden(text, np, npmod, adjmod, det):
    p = _sent_parse(text)
    assert (p.np_cnt, p.np_mod_cnt, p.adj_np_mod_cnt) == (np, npmod, adjmod)
    assert p.distances.get("NOUN_DET") == det


@pytest.mark.parametrize("text,want", [
    # reference tests/svp.example + .ok: verb_svp_dist per sentence —
    # the separable particle edge spans intervening clauses/PPs, and a
    # NOUN-shaped particle ("deel" of deelnemen) still attaches as svp
    ("Hij scheldt iedereen die langskomt uit .", 3),
    ("Hij roept met zijn optreden veel weerstand op .", 5),
    ("Ik neem graag aan wedstrijden deel .", 3),
], ids=["svp_uit", "svp_op", "svp_deel"])
def test_svp_golden(text, want):
    p = _sent_parse(text)
    assert p.distances.get("VERB_SVP") == [want]


CONNECTIVE_CASES = [
    # (text from reference tests/connective{1..6}.example, golden
    # doc-level counts from the .ok: allConn, causal, comparative,
    # contrastive, temporal, propNeg).  Exercises checkAls
    # (sentstats.cxx:366-424), the VG/VZ/BW connective gate (locative
    # "daar" is VNW and never counts), multiword connectives and the
    # long-negative list.
    ("Ik vertrek naar Ede aangezien het 5 uur is.\n"
     "Als het goed is ben ik om 18:30 daar.", 2, 2, 0, 0, 0, 0),
    ("Jan is net als Piet een nietroker.", 2, 0, 2, 0, 0, 0),
    ("Met behulp van Rogier komt Ko er wel uit, alhoewel het niet "
     "a la minute zal zijn!", 3, 1, 0, 1, 1, 1),
    ("Jan is evenmin een roker als Piet.", 2, 0, 2, 0, 0, 1),
    ("Jan is zomin een roker als Piet dat is.", 2, 0, 2, 0, 0, 0),
    ("Ondanks het slechte weer was het een mooie dag.", 1, 0, 0, 1, 0, 0),
]


@pytest.mark.parametrize(
    "text,all_,caus,comp,contrast,temp,prop_neg", CONNECTIVE_CASES,
    ids=[f"connective{i+1}" for i in range(len(CONNECTIVE_CASES))])
def test_connective_golden(text, all_, caus, comp, contrast, temp, prop_neg):
    from tscan_ray.text.tokenize import normalize_text

    f = featurize_document(normalize_text(text))
    assert f["allConnCnt"] == all_
    assert f["causeConnCnt"] == caus
    assert f["comparConnCnt"] == comp
    assert f["contrastConnCnt"] == contrast
    assert f["tempConnCnt"] == temp
    assert f["propNegCnt"] == prop_neg


@pytest.mark.parametrize("text,broad,strict", [
    # reference tests/gebeuren_abstr + gebeuren_conc .ok: the compound
    # splitter inherits the HEAD's semtype (zwerftocht -> tocht =
    # dynamic_abstr does NOT count broad; autorit -> rit = dynamic_conc
    # counts both), hebben = abstract state (abstract_ww 1), and no
    # adjectives (abstract_adj 0; "gekocht" is WW(vd), not the
    # adjs_semtype ADJ entry)
    ("Na een zwerftocht door de stad heb ik een pan gekocht .", 2, 1),
    ("Na een autorit door de stad heb ik een pan gekocht .", 3, 2),
], ids=["gebeuren_abstr", "gebeuren_conc"])
def test_gebeuren_golden(text, broad, strict):
    f = featurize_document(text)
    assert f["broadNounCnt"] == broad
    assert f["strictNounCnt"] == strict
    assert f["abstractWwCnt"] == 1
    assert f["abstractAdjCnt"] == 0
    assert f["undefinedNounCnt"] == 0
    # NOTE: undefined_ww diverges from the .ok (0 there): the engine's
    # synthetic semtype assignment covers verbs the golden lexicon
    # lacks ("kopen"), where the reference reports UNFOUND (uncounted).


def test_numstring_golden():
    """Reference tests/numstring.example + .ok: digit tokens keep their
    word status (word_count 15 — the default stoplist is empty),
    "A-2"/"A50" are names (name_count 2), and digit-prefixed derivations
    ("35jarige", "20-jarige") tag ADJ, so noun_count stays 2."""
    from tscan_ray.text.tokenize import normalize_text

    raw = ("De 35jarige bestuurder reed over de A-2 en de A50 samen met "
           "de 20-jarige liftster.")
    f = featurize_document(normalize_text(raw))
    assert f["wordCnt"] == 15
    assert f["nameCnt"] == 2
    assert f["nounCnt"] == 2
    assert f["sentCnt"] == 1


class TestGoldenConcreteness:
    """Concreteness golden cases (reference tests/concreet1..3.example +
    .ok) over the vendored golden semtype lexicons
    (tests/{nouns,adjs,verbs}_semtype.data).  Expected values are the
    doc-level counts from the .ok FoLiA metrics."""

    def test_concreet1(self):
        # "De dashond snuffelde aan de klaproos ." — dashond=nonhuman
        # (covered), klaproos not in the lexicon (uncovered)
        f = featurize_document("De dashond snuffelde aan de klaproos .")
        assert f["nounCnt"] == 2
        covered = f["nounCnt"] + f["nameCnt"] - f["uncoveredNounCnt"]
        assert covered == 1 and f["uncoveredNounCnt"] == 1
        assert f["nonHumanCnt"] == 1
        assert f["strictNounCnt"] == 1 and f["broadNounCnt"] == 1

    def test_concreet2(self):
        # "Ik drink een glas bourgogne uit het noorden van de Bourgogne ."
        # glas=artefact, noorden=place, lowercase bourgogne uncovered;
        # the NAME Bourgogne matches its capitalized entry (voed_verz)
        # via the case-sensitive raw-word lookup
        f = featurize_document(
            "Ik drink een glas bourgogne uit het noorden van de Bourgogne .")
        assert f["nounCnt"] == 3 and f["nameCnt"] == 1
        covered = f["nounCnt"] + f["nameCnt"] - f["uncoveredNounCnt"]
        assert covered == 3 and f["uncoveredNounCnt"] == 1
        assert f["artefactCnt"] == 1 and f["placeCnt"] == 1
        assert f["foodcareCnt"] == 1
        assert f["strictNounCnt"] == 2 and f["broadNounCnt"] == 3
        # drink -> drinken = concrete action (concrete_ww 1)
        assert f["concreteWwCnt"] == 1

    def test_concreet3(self):
        # "Ik ruik de geur van aangebrand vlees ." — geur=concrother
        # (covered), vlees uncovered; aangebrand=undefined ADJ, prenominal
        # (adj_np_modifier 1); ruik -> ruiken = concrete undefined
        f = featurize_document("Ik ruik de geur van aangebrand vlees .")
        assert f["nounCnt"] == 2
        covered = f["nounCnt"] + f["nameCnt"] - f["uncoveredNounCnt"]
        assert covered == 1 and f["uncoveredNounCnt"] == 1
        assert f["concrotherCnt"] == 1
        assert f["strictNounCnt"] == 1 and f["broadNounCnt"] == 1
        assert f["undefinedAdjCnt"] == 1
        assert f["concreteWwCnt"] == 1
