"""sources/io read seam: Lance-first dispatch contract + parquet path.

No pylance wheel ships in this container, so the Lance branch is proven
by CONTRACT: a mock ``ray.data.read_lance`` asserts the seam (a) detects
a Lance dataset layout, (b) passes the column-prune and filter kwargs
through verbatim, and (c) never falls back to parquet for it.  On a
cluster with pylance installed the same call sites run the real reader
unchanged (``read_table`` docstring).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _make_lance_layout(tmp_path) -> str:
    """A directory that LOOKS like a Lance dataset (``_versions/``)."""
    d = tmp_path / "imgs.lance"
    (d / "_versions").mkdir(parents=True)
    return str(d)


class TestLanceSeam:
    def test_lance_layout_detected_and_kwargs_forwarded(
            self, tmp_path, monkeypatch):
        import ray.data as rd

        from tscan_ray.sources import io

        calls = {}

        def fake_read_lance(path, columns=None, **kwargs):
            calls["path"] = path
            calls["columns"] = columns
            calls["kwargs"] = kwargs
            return rd.from_arrow(pa.table({"caption": ["x"],
                                           "phash": [1]}))

        monkeypatch.setattr(io, "lance_available", lambda: True)
        monkeypatch.setattr(rd, "read_lance", fake_read_lance,
                            raising=False)
        path = _make_lance_layout(tmp_path)
        ds = io.read_table(path, columns=["caption", "phash"],
                           filter="phash > 0")
        assert calls["path"] == path
        assert calls["columns"] == ["caption", "phash"]
        assert calls["kwargs"] == {"filter": "phash > 0"}
        assert ds.take_all() == [{"caption": "x", "phash": 1}]

    def test_lance_suffix_also_dispatches(self, tmp_path, monkeypatch):
        import ray.data as rd

        from tscan_ray.sources import io

        hit = []
        monkeypatch.setattr(io, "lance_available", lambda: True)
        monkeypatch.setattr(
            rd, "read_lance",
            lambda path, columns=None, **kw: hit.append(path)
            or rd.from_arrow(pa.table({"a": [1]})), raising=False)
        p = str(tmp_path / "plain.lance")
        os.makedirs(p)
        io.read_table(p)
        assert hit == [p]

    def test_missing_pylance_is_loud(self, tmp_path, monkeypatch):
        from tscan_ray.sources import io

        monkeypatch.setattr(io, "lance_available", lambda: False)
        with pytest.raises(ImportError, match="[Ll]ance"):
            io.read_table(_make_lance_layout(tmp_path))

    def test_parquet_fallback_prunes_and_strips_metadata(self, tmp_path):
        """The parquet branch prunes columns at the scan and its blocks
        carry NO pandas schema metadata (hashable schemas)."""
        import pandas as pd

        from tscan_ray.sources import io

        f = str(tmp_path / "t.parquet")
        pd.DataFrame({"a": [1, 2], "b": ["x", "y"],
                      "c": [0.5, 1.5]}).to_parquet(f)
        assert (pq.read_table(f).schema.metadata or {})  # pandas meta set
        ds = io.read_table(f, columns=["a", "b"])
        batches = list(ds.iter_batches(batch_format="pyarrow"))
        assert all(b.column_names == ["a", "b"] for b in batches)
        for b in batches:
            assert not (b.schema.metadata or {})
            hash(b.schema)  # must not raise

    def test_flagship_accepts_lance_images_path(self, tmp_path,
                                                monkeypatch):
        """flagship(images_path=...) reads the image table through the
        seam: a mocked Lance dataset flows into decode+featurize."""
        import ray.data as rd

        from tscan_ray.sources import io

        seen = {}

        def fake_read_lance(path, columns=None, **kwargs):
            seen["path"] = path
            seen["columns"] = columns
            from tscan_ray.sources.images import synth_images

            docs = rd.range(8).map_batches(
                lambda b: {"doc_id": b["id"],
                           "text": ["a small test caption"] * len(b["id"])},
                batch_format="numpy")
            ds = synth_images(docs, n_entities=2)
            return ds.select_columns(columns) if columns else ds

        monkeypatch.setattr(io, "lance_available", lambda: True)
        monkeypatch.setattr(rd, "read_lance", fake_read_lance,
                            raising=False)
        path = _make_lance_layout(tmp_path)
        img = io.read_table(path, columns=["image_id", "bytes", "w", "h",
                                           "fmt", "caption", "phash"])
        assert seen["path"] == path
        assert "caption" in seen["columns"]
        assert img.count() == 8
