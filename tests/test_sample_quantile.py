"""hash_split / hash_sample determinism + quantiles_disc correctness."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


class TestHashSplit:
    def test_deterministic_and_proportional(self):
        from tscan_ray.ops.sample import hash_split

        df = pd.DataFrame({"id": np.arange(20000)})
        a = hash_split(rd.from_pandas(df), "id",
                       {"train": 0.8, "val": 0.1, "test": 0.1}).to_pandas()
        b = hash_split(rd.from_pandas(df).repartition(7), "id",
                       {"train": 0.8, "val": 0.1, "test": 0.1}).to_pandas()
        # same assignment regardless of partitioning
        m = a.merge(b, on="id", suffixes=("_a", "_b"))
        assert (m["split_a"] == m["split_b"]).all()
        frac = a["split"].value_counts(normalize=True)
        assert abs(frac["train"] - 0.8) < 0.02
        assert abs(frac["val"] - 0.1) < 0.02

    def test_fractions_over_one_raise(self):
        from tscan_ray.ops.sample import hash_split

        with pytest.raises(ValueError):
            hash_split(rd.range(1), "id", {"a": 0.9, "b": 0.2})


class TestHashSample:
    def test_sample_nests_in_split(self):
        """A 5% sample is a subset of the 10% sample (threshold nesting)."""
        from tscan_ray.ops.sample import hash_sample

        df = pd.DataFrame({"id": np.arange(10000)})
        s5 = set(hash_sample(rd.from_pandas(df), "id", 0.05).to_pandas()["id"])
        s10 = set(hash_sample(rd.from_pandas(df), "id", 0.10).to_pandas()["id"])
        assert s5 <= s10
        assert abs(len(s10) / 10000 - 0.10) < 0.02


class TestQuantilesDisc:
    def test_matches_duckdb(self):
        import duckdb

        from tscan_ray.ops.quantile import quantiles_disc

        rng = np.random.default_rng(3)
        df = pd.DataFrame({"v": rng.random(5000) * 100})
        qs = [0.25, 0.5, 0.9]
        out = quantiles_disc(rd.from_pandas(df).repartition(16), "v", qs)
        got = dict(zip(out.column("q").to_pylist(), out.column("v").to_pylist()))
        for q in qs:
            want = duckdb.sql(
                f"select quantile_disc(v, {q}) from df").fetchone()[0]
            assert got[q] == want, (q, got[q], want)

    def test_empty_input(self):
        from tscan_ray.ops.quantile import quantiles_disc

        ds = rd.from_pandas(pd.DataFrame({"v": pd.Series([], dtype="float64")}))
        out = quantiles_disc(ds, "v", [0.5])
        assert out.column("v").null_count == 1
