"""Unit tests for the conformance-critical numeric kernels (SURVEY.md §5.2.1).

Hand-computed expected values mirror the reference formulas cited in
tscan_ray/text/kernels.py.
"""

import math

import pytest

from tscan_ray.text import kernels as K


class TestProportionDensity:
    def test_basic(self):
        assert K.proportion(1, 2) == 0.5
        assert K.density(1, 2) == 500.0

    def test_nan_rules(self):
        # reference include/tscan/utils.h:79-97: NaN if b==0 or either NaN
        assert math.isnan(K.proportion(1, 0))
        assert math.isnan(K.proportion(float("nan"), 2))
        assert math.isnan(K.proportion(1, float("nan")))
        assert math.isnan(K.density(5, 0))
        # 0/b is 0, not NaN
        assert K.proportion(0, 5) == 0.0


class TestFreqLog:
    def test_formula(self):
        # log10(((f+1)/total)*1e9)
        assert K.freq_log(0, 1_000_000_000) == pytest.approx(0.0)
        assert K.freq_log(99, 1_000_000) == pytest.approx(math.log10(100 * 1000))

    def test_zero_freq_laplace(self):
        # f=0 still defined (Laplace +1)
        assert K.freq_log(0, 10) == pytest.approx(8.0)


class TestMTLD:
    def test_empty(self):
        assert K.calculate_mtld([]) == 0.0
        assert K.average_mtld([]) == 0.0

    def test_all_same_token(self):
        # each repeated token after the first drives ttr <= 0.72 -> resets:
        # t1: ttr 1.0 (no factor); t2: 1/2=0.5 <= .72 factor=1 reset; t3: 1/1=1;
        # t4: 1/2=0.5 factor=2 reset  => factor 2, mtld = 4/2 = 2
        assert K.calculate_mtld(["a", "a", "a", "a"]) == pytest.approx(2.0)

    def test_all_unique_partial_only(self):
        # ttr stays 1.0; last token adds partial (1-1)/(1-.72)=0 -> factor 0 -> 1
        toks = ["a", "b", "c", "d"]
        assert K.calculate_mtld(toks) == pytest.approx(4.0)

    def test_partial_remainder(self):
        # a b a: t1 ttr=1, t2 ttr=1, t3 ttr=2/3=0.667<=0.72 -> factor=1
        assert K.calculate_mtld(["a", "b", "a"]) == pytest.approx(3.0)
        # a b c a: last ttr=3/4=0.75 > 0.72 -> partial=(1-.75)/(.28)
        expected = 4 / ((1 - 0.75) / (1 - 0.72))
        assert K.calculate_mtld(["a", "b", "c", "a"]) == pytest.approx(expected)

    def test_bidirectional_average(self):
        toks = ["a", "b", "c", "a", "b", "a"]
        fwd = K.calculate_mtld(toks)
        bwd = K.calculate_mtld(toks[::-1])
        assert K.average_mtld(toks) == pytest.approx((fwd + bwd) / 2)

    def test_factor_zero_forced_to_one(self):
        assert K.calculate_mtld(["a"]) == pytest.approx(1.0)


class TestArgumentOverlap:
    def test_identity(self):
        assert K.argument_overlap_count("huis", ["de", "huis"]) == 1
        assert K.argument_overlap_count("huis", ["kat"]) == 0

    def test_pronoun_classes(self):
        # ik/mij/me/mijn are one equivalence class (src/utils.cxx:31-34)
        assert K.argument_overlap_count("ik", ["mijn"]) == 1
        assert K.argument_overlap_count("jij", ["jouw"]) == 1
        # 3rd person fem vs 3rd plural share "ze"/"zij"
        assert K.argument_overlap_count("haar", ["zij"]) == 1
        assert K.argument_overlap_count("ik", ["jij"]) == 0

    def test_at_most_one_hit(self):
        # reference breaks after first match
        assert K.argument_overlap_count("x", ["x", "x", "x"]) == 1

    def test_empty_buffer(self):
        assert K.argument_overlap_count("x", []) == 0


class TestFindInflected:
    def test_direct(self):
        assert K.find_inflected({"groot": 1}, "groot") == 1

    def test_strip_suffix(self):
        assert K.find_inflected({"groot": 1}, "grote") is None  # 'grote'-'e'='grot'
        assert K.find_inflected({"grot": 2}, "grote") == 2
        assert K.find_inflected({"kat": 3}, "katten") is None
        assert K.find_inflected({"katt": 4}, "katten") == 4

    def test_add_suffix(self):
        # word doesn't end with suffix -> try adding it
        assert K.find_inflected({"huisen": 5}, "huis") == 5


class TestRarity:
    def test_rarity(self):
        counts = {"a": 1, "b": 2, "c": 10}
        # level 4: a,b rare -> 2/3
        assert K.rarity(counts, 4) == pytest.approx(2 / 3)
        assert math.isnan(K.rarity({}, 4))


class TestLint:
    def test_formula(self):
        s1, l1, s2, l2 = K.lint_scores(2.0, 0.5, 10.0, 3.0, 1.0, 0.2)
        raw1 = 100 - (-14.857 + 19.487 * 2.0 - 5.965 * 0.5 - 0.093 * 10.0 - 0.995 * 3.0)
        assert s1 == pytest.approx(max(0.0, min(100.0, raw1)))
        assert l1 in (1, 2, 3, 4)
        raw2 = 100 - (3.204 + 15.845 * 2.0 - 1.331 * 3.0 - 3.829 * 1.0 + 13.096 * 0.2)
        assert s2 == pytest.approx(max(0.0, min(100.0, raw2)))

    def test_nan_collapses_to_zero(self):
        # C++ std::max(0.0, NaN) == 0.0 -> score 0, level 1
        s1, l1, s2, l2 = K.lint_scores(float("nan"), 0, 0, float("nan"), 0, 0)
        assert s1 == 0.0 and l1 == 1 and s2 == 0.0 and l2 == 1

    def test_levels(self):
        assert K.lint_scores(10.0, 0, 0, 10.0, 0, 0)[1] in (1, 2, 3, 4)


class TestStringKernels:
    def test_match_tail(self):
        assert K.match_tail("werking", "ing")
        assert not K.match_tail("x", "ing")

    def test_form_for_head(self):
        assert K.form_for_head("boekenkast", "kast") == "kast"
        assert K.form_for_head("Boekenkasten", "kast") == "kasten"
