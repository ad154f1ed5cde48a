"""Checkpoint-resumable partitioned output (state/manifest.py)."""

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from tscan_ray.state.manifest import (
    completed_partitions,
    read_manifests,
    resumable_write,
    value_checksum,
)


def _input_ds(n=200):
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame({
        "entity_id": [i % 17 for i in range(n)],
        "v": [float(i) for i in range(n)],
    }))


def _read_all(out_dir):
    parts = [f for f in os.listdir(out_dir) if f.endswith(".parquet")]
    return pd.concat(
        [pq.read_table(os.path.join(out_dir, f)).to_pandas() for f in parts],
        ignore_index=True,
    )


class TestResumableWrite:
    def test_full_write_and_manifests(self, ray_session, tmp_path):
        out = str(tmp_path / "out")
        summary = resumable_write(_input_ds(), out, key="entity_id", num_buckets=8)
        assert summary["rows"].sum() == 200
        manifests = read_manifests(out)
        assert len(manifests) == len(summary)
        assert sum(m["rows"] for m in manifests) == 200
        for m in manifests:
            assert m["lineage"]["key"] == "entity_id"
            assert m["checksum"] != 0
        got = _read_all(out)
        assert len(got) == 200
        assert sorted(got["v"]) == [float(i) for i in range(200)]

    def test_resume_skips_completed(self, ray_session, tmp_path):
        out = str(tmp_path / "out")
        resumable_write(_input_ds(), out, key="entity_id", num_buckets=8)
        done = completed_partitions(out)
        # simulate a crashed run: drop two partitions (data + manifest)
        victims = sorted(done)[:2]
        for k in victims:
            os.remove(os.path.join(out, f"part-{k:05d}.parquet"))
            os.remove(os.path.join(out, "_manifest", f"part-{k:05d}.json"))
        survivors = {
            k: os.path.getmtime(os.path.join(out, f"part-{k:05d}.parquet"))
            for k in sorted(done)[2:]
        }
        summary2 = resumable_write(_input_ds(), out, key="entity_id", num_buckets=8)
        # only the victims were rewritten
        assert sorted(summary2["partition"]) == victims
        for k, mtime in survivors.items():
            assert os.path.getmtime(os.path.join(out, f"part-{k:05d}.parquet")) == mtime
        assert len(_read_all(out)) == 200

    def test_second_run_is_noop(self, ray_session, tmp_path):
        out = str(tmp_path / "out")
        resumable_write(_input_ds(), out, key="entity_id", num_buckets=8)
        summary2 = resumable_write(_input_ds(), out, key="entity_id", num_buckets=8)
        assert len(summary2) == 0

    def test_checksum_order_independent(self):
        df1 = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
        df2 = df1.iloc[::-1].reset_index(drop=True)
        assert value_checksum(df1) == value_checksum(df2)
        assert value_checksum(df1) != value_checksum(
            pd.DataFrame({"a": [1, 2, 4], "b": ["x", "y", "z"]})
        )


class TestCliEntry:
    def test_run_module(self, ray_session, tmp_path):
        # in-process CLI call (Ray already initialized by the fixture)
        from tscan_ray.run import main

        out = str(tmp_path / "job")
        rc = main(["--sf-dir", "/root/testdata/sf0.001", "--out", out,
                   "--num-buckets", "8", "--concurrency", "2"])
        assert rc == 0
        manifests = read_manifests(out)
        assert manifests and sum(m["rows"] for m in manifests) > 0
