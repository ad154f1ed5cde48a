"""Property-based tests (hypothesis) for the pure numeric kernels the
distributed operators are built from — no Ray session needed."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def ts_values(draw, max_n=60):
    n = draw(st.integers(0, max_n))
    ts = sorted(draw(st.lists(st.integers(0, 10_000), min_size=n, max_size=n)))
    vals = draw(st.lists(st.floats(-100, 100, allow_nan=False),
                         min_size=n, max_size=n))
    return np.asarray(ts, dtype=np.int64), np.asarray(vals, dtype=np.float64)


class TestTimeRollingKernel:
    @given(ts_values(), st.integers(1, 5000))
    @settings(max_examples=200, deadline=None)
    def test_matches_brute_force(self, tv, window):
        from tscan_ray.ops.window import _seg_bounds, _time_rolling_kernel

        ts, vals = tv
        if len(ts) == 0:
            return
        bounds = np.asarray([0, len(ts)])
        s, n, nn = _time_rolling_kernel(ts, vals, bounds, window)
        for i in range(len(ts)):
            mask = (ts >= ts[i] - window) & (ts <= ts[i])
            assert n[i] == mask.sum()
            assert np.isclose(s[i], vals[mask].sum(), atol=1e-9)

    @given(ts_values())
    @settings(max_examples=100, deadline=None)
    def test_segments_are_independent(self, tv):
        """Two entities concatenated give the same per-entity answers as
        each entity alone (bucket-UDF composability)."""
        from tscan_ray.ops.window import _time_rolling_kernel

        ts, vals = tv
        if len(ts) < 2:
            return
        cut = len(ts) // 2
        both_s, both_n, _ = _time_rolling_kernel(
            np.concatenate([ts[:cut], ts[cut:]]),
            np.concatenate([vals[:cut], vals[cut:]]),
            np.asarray([0, cut, len(ts)]), 100)
        a_s, a_n, _ = _time_rolling_kernel(ts[:cut], vals[:cut],
                                           np.asarray([0, cut]), 100)
        b_s, b_n, _ = _time_rolling_kernel(ts[cut:], vals[cut:],
                                           np.asarray([0, len(ts) - cut]), 100)
        assert (both_n == np.concatenate([a_n, b_n])).all()
        assert np.allclose(both_s, np.concatenate([a_s, b_s]))


class TestBucketOf:
    @given(st.lists(st.integers(-2**31, 2**31), min_size=1, max_size=50),
           st.integers(1, 64))
    @settings(max_examples=100, deadline=None)
    def test_deterministic_and_in_range(self, keys, nb):
        from tscan_ray.ops.keyed import bucket_of

        a = bucket_of(np.asarray(keys, dtype=np.int64), nb)
        b = bucket_of(np.asarray(keys, dtype=np.int64), nb)
        assert (a == b).all()
        assert ((a >= 0) & (a < nb)).all()

    @given(st.lists(st.text(max_size=8), min_size=1, max_size=30),
           st.integers(1, 16))
    @settings(max_examples=50, deadline=None)
    def test_string_keys(self, keys, nb):
        from tscan_ray.ops.keyed import bucket_of

        a = bucket_of(np.asarray(keys, dtype=object), nb)
        assert ((a >= 0) & (a < nb)).all()


class TestChecksum:
    @given(st.lists(st.tuples(st.integers(0, 100),
                              st.floats(-10, 10, allow_nan=False)),
                    min_size=1, max_size=40))
    @settings(max_examples=100, deadline=None)
    def test_order_independent(self, rows):
        from tscan_ray.state.manifest import value_checksum

        df = pd.DataFrame(rows, columns=["a", "b"])
        shuffled = df.sample(frac=1.0, random_state=7)
        assert value_checksum(df) == value_checksum(shuffled)
        assert 0 <= value_checksum(df) < 2**63


class TestProportionDensity:
    @given(st.integers(0, 50), st.integers(0, 50))
    @settings(max_examples=100, deadline=None)
    def test_proportion_nan_rule(self, num, den):
        from tscan_ray.text.kernels import proportion

        p = proportion(num, den)
        if den == 0:
            assert np.isnan(p)
        else:
            assert p == num / den


class TestMtld:
    @given(st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=80))
    @settings(max_examples=100, deadline=None)
    def test_bounds(self, toks):
        """MTLD is 0.0 on empty input (reference src/tscan.cxx:1806-1855
        returns 0, not NaN), otherwise non-negative and finite (zero
        completed factors are forced to 1.0)."""
        from tscan_ray.text.kernels import average_mtld

        m = average_mtld(list(toks))
        if not toks:
            assert m == 0.0
        else:
            assert np.isfinite(m) and m >= 0


class TestAnnotationRoundTrip:
    def test_annotations_json_round_trip(self):
        """annotations_to_json / annotations_from_json is lossless for
        arbitrary token annotations (hypothesis)."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from tscan_ray.sources.folia import (annotations_from_json,
                                             annotations_to_json)
        from tscan_ray.text.features import TokenAnnotation

        text = st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)),
            max_size=12)
        tok = st.builds(
            TokenAnnotation,
            word=text, lemma=text, tag=st.sampled_from(["N", "WW", "ADJ"]),
            full_tag=text,
            feats=st.lists(st.tuples(text, text), max_size=3).map(tuple),
            morphemes=st.lists(text, max_size=4).map(tuple),
            ner=st.sampled_from(["", "PER", "LOC"]),
            ner_begin=st.booleans(),
        )
        paragraphs = st.lists(
            st.lists(st.lists(tok, min_size=1, max_size=4),
                     min_size=1, max_size=3),
            min_size=1, max_size=2)

        @settings(max_examples=50, deadline=None)
        @given(paragraphs)
        def check(paras):
            back, lookup = annotations_from_json(annotations_to_json(paras))
            assert lookup is None
            assert back == paras

        check()
