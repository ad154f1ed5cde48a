"""Reference FoLiA ``<metric>`` name maps.

The reference decorates its output FoLiA with one ``<metric
class=... value=...>`` per computed value (sentStats/structStats
``addMetrics``, reference src/structstats.cxx:1051-1372; wordStats
src/wordstats.cxx:691-800).  These tables map the metric class names to
the engine's internal records so the FoLiA writer emits — and the
golden conformance tests consume — the exact reference vocabulary.
"""

from __future__ import annotations

# sentence metric class -> DD type key in SentParse.distances
# (structstats.cxx:1342-1364)
DIST_METRICS = {
    "sub_verb_dist": "SUB_VERB", "obj_verb_dist": "OBJ1_VERB",
    "lijdend_verb_dist": "OBJ2_VERB", "verb_pp_dist": "VERB_PP",
    "noun_det_dist": "NOUN_DET", "prep_obj_dist": "PREP_OBJ1",
    "verb_vc_dist": "VERB_VC", "comp_body_dist": "COMP_BODY",
    "crd_cnj_dist": "CRD_CNJ", "verb_comp_dist": "VERB_COMP",
    "noun_vc_dist": "NOUN_VC", "verb_svp_dist": "VERB_SVP",
    "verb_cop_dist": "VERB_PREDC_N", "verb_adj_dist": "VERB_PREDC_A",
    "verb_bw_mod_dist": "VERB_MOD_BW", "verb_adv_mod_dist": "VERB_MOD_A",
    "verb_noun_dist": "VERB_NOUN",
}

# sentence metric class -> SentParse attribute
PARSE_METRICS = {
    "smain_count": "smain_cnt", "ssub_count": "ssub_cnt",
    "sv1_count": "sv1_cnt", "smain_cnj_count": "smain_cnj_cnt",
    "ssub_cnj_count": "ssub_cnj_cnt", "sv1_cnj_count": "sv1_cnj_cnt",
    "rel_count": "betr_cnt", "vc_modifier_count": "vc_mod_cnt",
    "vc_modifier_single_count": "vc_mod_single_cnt",
    "adj_np_modifier_count": "adj_np_mod_cnt",
    "np_modifier_count": "np_mod_cnt", "d_level": "d_level",
}

# sentence metric class -> engine fold counter key (setCommonCounts names)
COUNTER_METRICS = {
    "word_count": "wordCnt", "let_count": "letCnt", "name_count": "nameCnt",
    "noun_count": "nounCnt", "verb_count": "verbCnt", "adj_count": "adjCnt",
    "content_count": "contentCnt",
    "content_strict_count": "contentStrictCnt",
    "past_verb_count": "pastCnt", "present_verb_count": "presentCnt",
    "subjonct_count": "subjonctCnt",
    "pers_pron_1_count": "pron1Cnt", "pers_pron_2_count": "pron2Cnt",
    "pers_pron_3_count": "pron3Cnt",
    "bv_vd_count": "vdBvCnt", "nw_vd_count": "vdNwCnt",
    "vrij_vd_count": "vdVrijCnt", "bv_od_count": "odBvCnt",
    "nw_od_count": "odNwCnt", "vrij_od_count": "odVrijCnt",
    "bv_inf_count": "infBvCnt", "nw_inf_count": "infNwCnt",
    "vrij_inf_count": "infVrijCnt",
    "vg_count": "vgCnt", "tsw_count": "tswCnt", "spec_count": "specCnt",
    "bw_count": "bwCnt", "vnw_count": "vnwCnt", "lid_count": "lidCnt",
    "tw_count": "twCnt", "vz_count": "vzCnt",
    "passive_count": "passiveCnt", "modal_count": "modalCnt",
    "time_count": "timeVCnt", "koppel_count": "koppelCnt",
    "prop_neg_count": "propNegCnt", "morph_neg_count": "morphNegCnt",
    "pers_ref_count": "persRefCnt", "pron_ref_count": "pronRefCnt",
    "archaic_count": "archaicsCnt",
    "word_overlap_count": "wordOverlapCnt",
    "lemma_overlap_count": "lemmaOverlapCnt",
    "general_adverb_count": "generalAdverbCnt",
    "specific_adverb_count": "specificAdverbCnt",
    "intens_count": "intensCnt", "formal_count": "formalCnt",
    "nominal_count": "nominalCnt", "character_count": "charCnt",
    "morpheme_count": "morphCnt",
    "all_connector_count": "allConnCnt",
    "temporal_connector_count": "tempConnCnt",
    "reeks_wg_connector_count": "opsomWgConnCnt",
    "reeks_zin_connector_count": "opsomZinConnCnt",
    "contrast_connector_count": "contrastConnCnt",
    "comparatief_connector_count": "comparConnCnt",
    "causaal_connector_count": "causeConnCnt",
    "time_situation_count": "timeSitCnt",
    "space_situation_count": "spaceSitCnt",
    "cause_situation_count": "causalSitCnt",
    "emotion_situation_count": "emoSitCnt",
    "human_nouns_count": "humanCnt",
    "voorzetsel_expression_count": "prepExprCnt",
}

__all__ = ["DIST_METRICS", "PARSE_METRICS", "COUNTER_METRICS"]
