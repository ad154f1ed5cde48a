"""Reference display-string vocabulary for word-level output.

The reference renders its internal enums as Dutch display strings in
both the word CSV and the FoLiA ``<metric>`` elements; the engine
stores compact internal labels.  These maps are the exact ``toString``
tables:

* prop      — CGN::toString(Prop)        (reference src/cgn.cxx:65-96)
* semtype   — SEM::toString(Type)        (reference src/sem.cxx:7-108)
* connective— Conn::toString(Type)       (reference src/conn.cxx:6-23)
* situation — Situation::toString(Type)  (reference src/situation.cxx:6-27)
"""

from __future__ import annotations

PROP_NL = {
    "ISNAME": "naam",
    "ISLET": "punctuatie",
    "ISVD": "voltooid_deelw",
    "ISOD": "onvoltooid_deelw",
    "ISINF": "infinitief",
    "ISPVTGW": "tegenwoordige_tijd",
    "ISPVVERL": "verleden_tijd",
    "ISSUBJ": "subjonctive",
    "ISPPRON1": "voornaamwoord_1",
    "ISPPRON2": "voornaamwoord_2",
    "ISPPRON3": "voornaamwoord_3",
    "ISAANW": "aanwijzend",
}

CONN_NL = {
    "TEMPOREEL": "temporeel",
    "OPSOMMEND_WG": "opsommend_wg",
    "OPSOMMEND_ZIN": "opsommend_zin",
    "CONTRASTIEF": "contrastief",
    "COMPARATIEF": "comparatief",
    "CAUSAAL": "causaal",
}

# Formal::toString (reference src/formal.cxx:7-44)
FORMAL_NL = {
    "BVNW": "adjectief",
    "BW": "bijwoord",
    "VGW": "voegwoord",
    "VNW": "voornaamwoord",
    "VZ": "voorzetsel",
    "VZG": "voorzetselgroep",
    "WW": "werkwoord",
    "ZNW": "zelfstandig naamwoord",
}

# Afk::toString (reference src/afk.cxx:7-28): engine internal labels
# (loaders._AFK_DOMAINS) -> canonical display
AFK_NL = {
    "generiek": "Generiek", "internationaal": "Internationaal",
    "juridisch": "Juridisch", "media": "Media", "onderwijs": "Onderwijs",
    "overheid": "Overheid_Politiek", "overige": "Overig", "zorg": "Zorg",
}

# WWform toString (reference src/Alpino.cxx:616-636)
WWFORM_NL = {
    "HEAD_VERB": "hoofdww",
    "PASSIVE_VERB": "passiefww",
    "MODAL_VERB": "modaalww",
    "TIME_VERB": "tijdww",
    "COPULA": "koppelww",
}

SIT_NL = {
    "TIME_SIT": "tijd",
    "SPACE_SIT": "ruimte",
    "CAUSAL_SIT": "causaliteit",
    "EMO_SIT": "emotie",
}

_NOUN_SEM_NL = {
    "undefined": "ongedefinieerd",
    "concrother": "concreet-overig",
    "institut": "organisatie",
    "substance_conc": "concrete-substantie",
    "artefact": "gebruiksvoorwerp",
    "nonhuman": "plant-dier",
    "human": "persoon",
    "voed_verz": "voeding-verzorging",
    "dynamic_conc": "concreet-gebeuren",
    "substance_abstr": "abstracte-substantie",
    "dynamic_abstr": "abstract-gebeuren",
    "nondynamic": "abstract-overig",
    "place": "plaats",
    "time": "tijd",
    "measure": "maat",
    "UNFOUND_NOUN": "niet-gevonden",
}

_ADJ_SEM_NL = {
    "undefined": "ongedefinieerd",
    "human": "mens-waarneembaar",
    "emo": "emoties-sociaal",
    "shape": "ding-vorm-omvang",
    "color": "ding-kleur",
    "matter": "ding-stof",
    "sound": "ding-geluid",
    "nonhuman_other": "ding-overig",
    "tech": "niet-waarneembaar",
    "time": "tijd",
    "place": "plaats",
    "spec_pos": "spec-positief",
    "spec_neg": "spec-negatief",
    "pos": "alg-positief",
    "neg": "alg-negatief",
    "evaluative": "alg-evaluatief",
    "epi_pos": "epist-pos",
    "epi_neg": "epist-neg",
    "abstract": "abstract",
    "UNFOUND_ADJ": "niet-gevonden",
}

_VERB_SEM_NL = {
    "undefined": "ongedefinieerd",
    "abstract_undefined": "abstract-ongedefinieerd",
    "concrete_undefined": "concreet-ongedefinieerd",
    "abstract_state": "abstract-toestand",
    "concrete_state": "concreet-toestand",
    "undefined_state": "ongedefinieerd-toestand",
    "abstract_action": "abstract-actie",
    "concrete_action": "concreet-actie",
    "undefined_action": "ongedefinieerd-actie",
    "abstract_process": "abstract-proces",
    "concrete_process": "concreet-proces",
    "undefined_process": "ongedefinieerd-proces",
    "UNFOUND_VERB": "niet-gevonden",
}


def semtype_nl(sem_type: str, tag: str) -> str:
    """SEM::toString for the engine's internal sem label; the engine
    vocabulary is tag-scoped ('human' noun = persoon, 'human' adj =
    mens-waarneembaar), so the word's CGN head tag disambiguates.
    Empty label (non-N/ADJ/WW words: NO_SEMTYPE) renders empty — the
    reference emits no semtype metric for those."""
    if not sem_type:
        return ""
    if tag == "N" or sem_type == "UNFOUND_NOUN":
        return _NOUN_SEM_NL.get(sem_type, "")
    if tag == "ADJ" or sem_type == "UNFOUND_ADJ":
        return _ADJ_SEM_NL.get(sem_type, "")
    if tag == "WW" or sem_type == "UNFOUND_VERB":
        # a WW word may carry an ADJ label via the 'hidden adj' rule
        # (prenominal participle, src/tscan.cxx:1437-1448)
        if sem_type in _VERB_SEM_NL:
            return _VERB_SEM_NL[sem_type]
        return _ADJ_SEM_NL.get(sem_type, "")
    # NER-derived semtypes on SPEC names follow the noun table
    return _NOUN_SEM_NL.get(sem_type, "")


def prop_nl(prop: str) -> str:
    """CGN::toString(Prop); JUSTAWORD (empty) renders empty."""
    return PROP_NL.get(prop, "")


def conn_nl(conn_type: str) -> str:
    return CONN_NL.get(conn_type, "")


def sit_nl(sit_type: str) -> str:
    return SIT_NL.get(sit_type, "")


def wwform_nl(wwform: str) -> str:
    return WWFORM_NL.get(wwform, "")


def formal_nl(formal_type: str) -> str:
    return FORMAL_NL.get(formal_type, "")


def afk_nl(afk_type: str) -> str:
    return AFK_NL.get(afk_type, "")


__all__ = ["PROP_NL", "CONN_NL", "SIT_NL", "WWFORM_NL", "FORMAL_NL", "AFK_NL",
           "semtype_nl", "prop_nl", "conn_nl", "sit_nl", "wwform_nl", "afk_nl",
           "formal_nl"]
