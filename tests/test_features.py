"""Featurizer conformance tests: hand-checked documents against the
reference semantics (SURVEY.md §2.2-2.4; golden values derived by hand
from the cited formulas)."""

import math

import pytest

from tscan_ray.text.features import analyze_word, feature_names, featurize_document
from tscan_ray.text.lexicons import default_lexicons
from tscan_ray.text.tokenize import segment, split_sentences, tokenize


LEX = default_lexicons()


class TestTokenize:
    def test_tokens_and_punct(self):
        assert tokenize("De kat loopt.") == ["De", "kat", "loopt", "."]

    def test_sentence_split(self):
        s = split_sentences(tokenize("De kat loopt. De man ziet!"))
        assert len(s) == 2
        assert s[0][-1] == "."

    def test_paragraphs(self):
        paras = segment("De kat loopt.\n\nDe man ziet.")
        assert len(paras) == 2

    def test_no_terminal_punct_is_one_sentence(self):
        assert len(split_sentences(tokenize("de kat loopt"))) == 1


class TestAnalyzeWord:
    def test_punct(self):
        assert analyze_word(".", False, LEX).prop == "ISLET"

    def test_known_noun(self):
        a = analyze_word("katten", False, LEX)
        assert a.tag == "N" and a.lemma == "kat" and a.morph_cnt == 2

    def test_name_detection_mid_sentence(self):
        a = analyze_word("Jan", False, LEX)
        assert a.prop == "ISNAME" and a.ner == "PER" and a.is_pers_ref

    def test_sentence_initial_known_word_not_name(self):
        a = analyze_word("De", True, LEX)
        assert a.tag == "LID" and a.prop != "ISNAME"

    def test_verb_tense(self):
        assert analyze_word("loopt", False, LEX).prop == "ISPVTGW"
        assert analyze_word("liep", False, LEX).prop == "ISPVVERL"
        assert analyze_word("gelopen", False, LEX).prop == "ISVD"

    def test_pronoun_person(self):
        assert analyze_word("ik", False, LEX).prop == "ISPPRON1"
        assert analyze_word("jij", False, LEX).prop == "ISPPRON2"
        assert analyze_word("hij", False, LEX).prop == "ISPPRON3"
        # men is excluded from pronoun props (src/wordstats.cxx:216-219)
        assert analyze_word("men", False, LEX).prop == ""

    def test_negation(self):
        assert analyze_word("niet", False, LEX).is_prop_neg
        assert analyze_word("onmogelijk", False, LEX).is_morph_neg
        assert not analyze_word("kat", False, LEX).is_prop_neg

    def test_content_words(self):
        assert analyze_word("kat", False, LEX).is_content
        assert analyze_word("loopt", False, LEX).is_content  # HEAD_VERB
        assert not analyze_word("is", False, LEX).is_content  # COPULA
        # adverbs: broad content yes, strict only MANNER
        snel = analyze_word("samen", False, LEX)
        assert snel.is_content and snel.is_content_strict
        mss = analyze_word("misschien", False, LEX)
        assert mss.is_content and not mss.is_content_strict

    def test_nominalization(self):
        assert analyze_word("werking", False, LEX).is_nominal
        assert not analyze_word("kat", False, LEX).is_nominal
        # tail rule for unanalyzed words: 'organisatie' ends in 'tie'
        assert analyze_word("relatie", False, LEX).is_nominal

    def test_freq_log_matches_kernel(self):
        from tscan_ray.text.kernels import freq_log

        a = analyze_word("kat", False, LEX)
        assert a.word_freq_log == pytest.approx(
            freq_log(LEX.word_freq["kat"], LEX.word_total)
        )


class TestFeaturizeDocument:
    def test_simple_counts(self):
        f = featurize_document("De kat loopt .")
        # 'de' is on the stoplist -> wordCnt excludes it; letCnt counts '.'
        assert f["wordCnt"] == 2
        assert f["letCnt"] == 1
        assert f["stoplistCnt"] == 1
        assert f["wordInclCnt"] == 3
        assert f["sentCnt"] == 1
        assert f["Wrd_per_zin"] == 2.0

    def test_char_morph_proportions(self):
        f = featurize_document("kat loopt")
        # chars: kat=3, loopt=5 -> 8/2
        assert f["Let_per_wrd"] == pytest.approx(4.0)

    def test_ttr_and_mtld(self):
        f = featurize_document("kat kat kat kat")
        assert f["TTR_wrd"] == pytest.approx(0.25)
        assert f["MTLD_wrd"] == pytest.approx(2.0)  # same as kernel hand-calc

    def test_question(self):
        assert featurize_document("Loopt de kat ?")["questCnt"] == 1
        assert featurize_document("De kat loopt .")["questCnt"] == 0

    def test_multi_negation(self):
        f = featurize_document("De kat loopt niet zonder reden .")
        assert f["propNegCnt"] == 2
        assert f["multiNegCnt"] == 1

    def test_connectives(self):
        f = featurize_document("De kat loopt omdat de man ziet .")
        assert f["causeConnCnt"] == 1

    def test_multiword_connective(self):
        f = featurize_document("Ten slotte loopt de kat .")
        assert f["opsomZinConnCnt"] == 1

    def test_prev_sentence_overlap(self):
        # 'kat' (noun, overlap candidate) repeats in the next sentence
        f = featurize_document("De kat loopt . De kat ziet .")
        assert f["Wrd_overlap_sent"] == 1
        assert f["Lem_overlap_sent"] == 1
        # pronoun equivalence across sentences: ik ... mijn
        f2 = featurize_document("Ik loopt . Mijn kat ziet .")
        assert f2["Wrd_overlap_sent"] >= 1

    def test_overlap_resets_across_paragraphs(self):
        cont = featurize_document("De kat loopt . De kat ziet .")
        split = featurize_document("De kat loopt .\n\nDe kat ziet .")
        assert cont["Wrd_overlap_sent"] == 1
        assert split["Wrd_overlap_sent"] == 0

    def test_doc_overlap_requires_window(self):
        # fewer than overlap_size words -> 0 by construction
        f = featurize_document("De kat loopt .")
        assert f["Wrd_overlap_doc"] == 0
        # 60 identical words -> overlaps counted after the 50-word buffer fills
        text = " ".join(["kat"] * 60)
        f2 = featurize_document(text)
        assert f2["Wrd_overlap_doc"] == 10

    def test_freq_rollup_mean_of_sums(self):
        # doc-level Wrd_freq_log = sum(word_freq_log over content)/contentCnt
        from tscan_ray.text.kernels import freq_log

        f = featurize_document("kat loopt")
        expected = (
            freq_log(LEX.word_freq["kat"], LEX.word_total)
            + freq_log(LEX.word_freq["loopt"], LEX.word_total)
        ) / 2
        assert f["Wrd_freq_log"] == pytest.approx(expected)

    def test_empty_document(self):
        f = featurize_document("")
        assert f["wordCnt"] == 0
        assert math.isnan(f["Wrd_per_zin"])
        assert f["MTLD_wrd"] == 0.0

    def test_schema_stable(self):
        names = feature_names()
        f1 = featurize_document("De kat .")
        f2 = featurize_document("")
        assert list(f1.keys()) == names == list(f2.keys())

    def test_rarity(self):
        # 1 rare lemma out of 2 unique (kat appears 5x, loopt 1x; level=4)
        text = "kat kat kat kat kat loopt"
        f = featurize_document(text)
        assert f["Rar_index"] == pytest.approx(0.5)

    def test_intensifier_and_formal(self):
        f = featurize_document("De kat is heel erg groot .")
        assert f["intensCnt"] >= 2
        f2 = featurize_document("De kat loopt reeds .")
        assert f2["formalCnt"] == 1

    def test_prep_expr(self):
        f = featurize_document("De kat loopt op grond van de reden .")
        assert f["prepExprCnt"] == 1
