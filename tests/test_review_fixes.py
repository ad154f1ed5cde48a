"""Regression tests for the ops-layer review findings (round 2)."""

import numpy as np
import pandas as pd
import ray.data as rd


class TestSaltedTwoPhase:
    def test_salted_equals_unsalted(self):
        from tscan_ray.ops.agg import groupby_sum_2phase

        rng = np.random.default_rng(5)
        df = pd.DataFrame({"k": rng.integers(0, 3, 500),
                           "v": rng.random(500)})
        ds = rd.from_pandas(df).repartition(8)
        plain = groupby_sum_2phase(ds, ["k"], ["v"]).to_pandas()
        salted = groupby_sum_2phase(rd.from_pandas(df).repartition(8),
                                    ["k"], ["v"], salt=4).to_pandas()
        p = plain.sort_values("k").reset_index(drop=True)
        s = salted.sort_values("k").reset_index(drop=True)
        assert (p["k"] == s["k"]).all()
        assert (p["n"] == s["n"]).all()
        assert np.allclose(p["sum_v"], s["sum_v"])
        assert "__salt__" not in salted.columns
        assert "__skey__" not in salted.columns


class TestQuantileNulls:
    def test_nulls_ignored(self):
        import duckdb

        from tscan_ray.ops.quantile import quantiles_disc

        rng = np.random.default_rng(9)
        v = rng.random(1000) * 10
        v[rng.random(1000) < 0.1] = np.nan
        df = pd.DataFrame({"v": v})
        out = quantiles_disc(rd.from_pandas(df).repartition(8), "v",
                             [0.5, 0.95])
        got = dict(zip(out.column("q").to_pylist(),
                       out.column("v").to_pylist()))
        for q in (0.5, 0.95):
            want = duckdb.sql(
                f"select quantile_disc(v, {q}) from df").fetchone()[0]
            assert got[q] == want, (q, got[q], want)


class TestRankTableClamp:
    def test_k_beyond_last_band(self):
        from tscan_ray.ops.textops import frequency_rank_table

        docs = rd.from_pandas(pd.DataFrame(
            {"text": ["a b c d e f g h i j"] * 3}))
        out = frequency_rank_table(docs, "text", k=50,
                                   bands=(2, 4)).to_pandas()
        assert (out[out["rnk"] > 4]["band"] == 4).all()


class TestRobustStatsTz:
    def test_tz_aware_ts(self):
        from tscan_ray.ops.agg import groupby_stats_robust

        ts = pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-03"],
                            utc=True)
        df = pd.DataFrame({"k": [1, 1, 1], "v": [1.0, 2.0, 4.0], "ts": ts})
        out = groupby_stats_robust(rd.from_pandas(df), "k", "v",
                                   ts_col="ts").to_pandas()
        assert len(out) == 1
        assert out["med_value"].iloc[0] == 2.0
        assert 0.9 < out["corr_ts"].iloc[0] <= 1.0


class TestAnnEmptyBlocks:
    def test_topk_with_empty_filtered_blocks(self):
        from tscan_ray.ops.ann import topk_cosine

        rng = np.random.default_rng(2)
        emb = [list(map(float, rng.random(8))) for _ in range(40)]
        df = pd.DataFrame({"vec_id": range(40), "embedding": emb})
        # many tiny blocks -> some become empty through upstream filters
        ds = rd.from_pandas(df).repartition(16).filter(
            expr="vec_id < 5")
        out = topk_cosine(ds, np.asarray(emb[0]), k=3).to_pandas()
        assert len(out) == 3
        assert out["cosine"].iloc[0] == 1.0  # self-match first

    def test_tie_break_stable_across_partitioning(self):
        from tscan_ray.ops.ann import topk_cosine

        # 12 identical vectors: every cosine ties; top-5 must be the 5
        # smallest ids regardless of block layout
        df = pd.DataFrame({"vec_id": range(12),
                           "embedding": [[1.0, 0.0]] * 12})
        for parts in (1, 7):
            out = topk_cosine(rd.from_pandas(df).repartition(parts),
                              np.array([1.0, 0.0]), k=5).to_pandas()
            assert sorted(out["vec_id"]) == [0, 1, 2, 3, 4], parts
