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

# the remaining counter-backed metric classes (structstats.cxx
# addMetrics:1051-1372) — everything except the frequency/prevalence/
# staphorsius/LM families, whose data files the reference repo does not
# ship.  Same fold-counter convention as COUNTER_METRICS.
COUNTER_METRICS_EXT = {
    "word_count_incl_stopwords": "wordInclCnt",
    "personal_name_count": "nerPERCnt",
    "location_name_count": "nerLOCCnt",
    "organization_name_count": "nerORGCnt",
    "product_name_count": "nerPROCnt",
    "event_name_count": "nerEVECnt",
    "multiple_neg_count": "multiNegCnt",
    "character_count_min_names": "charCntExNames",
    "morpheme_count_min_names": "morphCntExNames",
    # adjective semtype taxonomy (src/tscan.cxx:2402-2607 count switch)
    "broad_adj": "broadAdjCnt", "strict_adj": "strictAdjCnt",
    "human_adj_count": "humanAdjCnt", "emo_adj_count": "emoAdjCnt",
    "nonhuman_adj_count": "nonhumanAdjCnt",
    "shape_adj_count": "shapeAdjCnt", "color_adj_count": "colorAdjCnt",
    "matter_adj_count": "matterAdjCnt", "sound_adj_count": "soundAdjCnt",
    "other_nonhuman_adj_count": "nonhumanOtherAdjCnt",
    "techn_adj_count": "techAdjCnt", "time_adj_count": "timeAdjCnt",
    "place_adj_count": "placeAdjCnt",
    "pos_spec_adj_count": "specPosAdjCnt",
    "neg_spec_adj_count": "specNegAdjCnt",
    "pos_adj_count": "posAdjCnt", "neg_adj_count": "negAdjCnt",
    "evaluative_adj_count": "evaluativeAdjCnt",
    "pos_epi_adj_count": "epiPosAdjCnt",
    "neg_epi_adj_count": "epiNegAdjCnt",
    "abstract_adj": "abstractAdjCnt",
    "undefined_adj_count": "undefinedAdjCnt",
    "uncovered_adj_count": "uncoveredAdjCnt",
    # intensifiers / formal classes
    "intens_bvnw_count": "intensBvnwCnt",
    "intens_bvbw_count": "intensBvbwCnt",
    "intens_bw_count": "intensBwCnt",
    "intens_combi_count": "intensCombiCnt",
    "intens_nw_count": "intensNwCnt",
    "intens_tuss_count": "intensTussCnt",
    "intens_ww_count": "intensWwCnt",
    "formal_bvnw_count": "formalBvnwCnt", "formal_bw_count": "formalBwCnt",
    "formal_vgw_count": "formalVgwCnt", "formal_vnw_count": "formalVnwCnt",
    "formal_vz_count": "formalVzCnt", "formal_vzg_count": "formalVzgCnt",
    "formal_ww_count": "formalWwCnt", "formal_znw_count": "formalZnwCnt",
    # general nouns / verbs
    "general_noun_count": "generalNounCnt",
    "general_noun_sep_count": "generalNounSepCnt",
    "general_noun_rel_count": "generalNounRelCnt",
    "general_noun_act_count": "generalNounActCnt",
    "general_noun_know_count": "generalNounKnowCnt",
    "general_noun_disc_count": "generalNounDiscCnt",
    "general_noun_deve_count": "generalNounDeveCnt",
    "general_verb_count": "generalVerbCnt",
    "general_verb_sep_count": "generalVerbSepCnt",
    "general_verb_rel_count": "generalVerbRelCnt",
    "general_verb_act_count": "generalVerbActCnt",
    "general_verb_know_count": "generalVerbKnowCnt",
    "general_verb_disc_count": "generalVerbDiscCnt",
    "general_verb_deve_count": "generalVerbDeveCnt",
    # noun semtype taxonomy
    "broad_noun": "broadNounCnt", "strict_noun": "strictNounCnt",
    "nonhuman_nouns_count": "nonHumanCnt",
    "artefact_nouns_count": "artefactCnt",
    "concrother_nouns_count": "concrotherCnt",
    "substance_conc_nouns_count": "substanceConcCnt",
    "foodcare_nouns_count": "foodcareCnt",
    "time_nouns_count": "timeCnt", "place_nouns_count": "placeCnt",
    "measure_nouns_count": "measureCnt",
    "dynamic_conc_nouns_count": "dynamicConcCnt",
    "substance_abstr_nouns_count": "substanceAbstrCnt",
    "dynamic_abstr_nouns_count": "dynamicAbstrCnt",
    "nondynamic_nouns_count": "nonDynamicCnt",
    "institut_nouns_count": "institutCnt",
    "undefined_nouns_count": "undefinedNounCnt",
    "uncovered_nouns_count": "uncoveredNounCnt",
    # verb semtype taxonomy
    "abstract_ww": "abstractWwCnt", "concrete_ww": "concreteWwCnt",
    "undefined_ww": "undefinedWwCnt", "undefined_ATP": "undefinedATPCnt",
    "state_count": "stateCnt", "action_count": "actionCnt",
    "process_count": "processCnt",
    "uncovered_verb_count": "uncoveredVerbCnt",
    # NP stats
    "np_count": "npCnt", "indef_np_count": "indefNpCnt",
    "np_size": "npSizeSum",
    # conditionally emitted (value > 0 only, structstats.cxx:1086-1342)
    "d_level_gt4": "dLevelGt4Cnt",
    "question_count": "questCnt",
    "imperative_count": "impCnt",
    "overheid_afk_count": "afk_overheidCnt",
    "juridisch_afk_count": "afk_juridischCnt",
    "onderwijs_afk_count": "afk_onderwijsCnt",
    "media_afk_count": "afk_mediaCnt",
    "generiek_afk_count": "afk_generiekCnt",
    "overige_afk_count": "afk_overigeCnt",
    "internationaal_afk_count": "afk_internationaalCnt",
    "zorg_afk_count": "afk_zorgCnt",
}

# emitted only when the value is non-zero
CONDITIONAL_METRICS = frozenset({
    "d_level_gt4", "question_count", "imperative_count",
    "overheid_afk_count", "juridisch_afk_count", "onderwijs_afk_count",
    "media_afk_count", "generiek_afk_count", "overige_afk_count",
    "internationaal_afk_count", "zorg_afk_count",
})

# metric class -> fn(counters) for reference-side arithmetic
# (structstats.cxx:1250,1308,1318)
COMPUTED_METRICS = {
    "covered_nouns_count":
        lambda c: c.get("nounCnt", 0) + c.get("nameCnt", 0)
        - c.get("uncoveredNounCnt", 0),
    "covered_adj_count":
        lambda c: c.get("adjCnt", 0) - c.get("uncoveredAdjCnt", 0),
    "covered_verb_count":
        lambda c: c.get("verbCnt", 0) - c.get("uncoveredVerbCnt", 0),
}

__all__ = ["DIST_METRICS", "PARSE_METRICS", "COUNTER_METRICS",
           "COUNTER_METRICS_EXT", "CONDITIONAL_METRICS",
           "COMPUTED_METRICS"]
