"""Feature-group plugin registry (SURVEY §2.10): section map, skip
toggles, and user-registered groups — including through the distributed
featurizer actor pool (the driver-side registry must reach actors)."""

import pyarrow as pa
import pytest

import ray.data

from tscan_ray.config import DEFAULT_CONFIG, EngineConfig
from tscan_ray.text import features as F


@pytest.fixture(autouse=True)
def _clean_registry():
    yield
    for name in list(F._CUSTOM_GROUPS):
        F.unregister_feature_group(name)


class TestGroupMap:
    def test_groups_partition_schema(self):
        groups = F.feature_groups()
        names = F.feature_names()
        flat = [c for cols in groups.values() for c in cols]
        assert len(flat) == len(set(flat)), "groups overlap"
        assert set(flat) == set(names)

    def test_reference_section_names_present(self):
        groups = F.feature_groups()
        for g in ("topPredictors", "wordDifficulties", "compound",
                  "sentDifficulties", "infoDensity", "coherence",
                  "concreteness", "persoonlijkheid", "verb", "imperative",
                  "wordSort", "prepPhrase", "intensifiers", "formal",
                  "surprisal", "lint", "counts"):
            assert g in groups and groups[g], g

    def test_skip_group_removes_only_its_columns(self):
        cfg = EngineConfig(skip_groups=("surprisal",))
        full = set(F.feature_names())
        skipped = set(F.feature_names(cfg))
        gone = full - skipped
        assert gone == set(F.feature_groups()["surprisal"])
        assert not any("Log_prob" in c or "Perplexiteit" in c for c in skipped)

    def test_default_schema_unchanged_by_registry_machinery(self):
        f = F.featurize_document("De man gaat naar huis .")
        assert set(f) == set(F.feature_names())


class TestCustomGroups:
    def test_register_and_compute(self):
        F.register_feature_group(
            "caps", lambda doc, out, cfg: {
                "caps_cnt": sum(w.word[:1].isupper() for w in doc.words)})
        f = F.featurize_document("De Man ziet Amsterdam .")
        assert f["caps_cnt"] == 3
        assert "caps" in F.feature_groups()
        assert "caps_cnt" in F.feature_names()

    def test_plugin_may_read_builtins_not_overwrite(self):
        F.register_feature_group(
            "derived", lambda doc, out, cfg: {
                "word_per_sent": out["Wrd_per_zin"]})
        f = F.featurize_document("De man gaat naar huis .")
        assert f["word_per_sent"] == f["Wrd_per_zin"]
        F.register_feature_group(
            "clash", lambda doc, out, cfg: {"Wrd_per_zin": 0.0})
        with pytest.raises(ValueError, match="overwrites"):
            F.featurize_document("De man gaat naar huis .")

    def test_duplicate_name_rejected(self):
        with pytest.raises(ValueError, match="already exists"):
            F.register_feature_group("verb", lambda doc, out, cfg: {})

    def test_skip_applies_to_custom_group(self):
        F.register_feature_group(
            "caps", lambda doc, out, cfg: {"caps_cnt": 1})
        cfg = EngineConfig(skip_groups=("caps",))
        assert "caps_cnt" not in F.featurize_document("x .", cfg=cfg)


class TestDistributedPlugins:
    def test_custom_group_reaches_actor_pool(self):
        from tscan_ray.stages.featurizer import featurize

        # define the plugin as a closure: cloudpickle ships closures by
        # VALUE, while module-level functions in a test module would be
        # pickled by reference to a module the Ray worker cannot import
        def caps_group(doc, out, cfg):
            return {"caps_cnt":
                    float(sum(w.word[:1].isupper() for w in doc.words))}

        F.register_feature_group("caps", caps_group)
        ds = ray.data.from_arrow(pa.table({
            "caption": ["De Man ziet Amsterdam .", "de kat slaapt ."]}))
        out = featurize(ds, concurrency=1).to_pandas()
        assert list(out["caps_cnt"]) == [3.0, 0.0]

    def test_skip_groups_through_stage(self):
        from tscan_ray.stages.featurizer import featurize

        cfg = EngineConfig(skip_groups=("surprisal", "lint"))
        ds = ray.data.from_arrow(pa.table({"caption": ["de kat slaapt ."]}))
        out = featurize(ds, cfg=cfg, concurrency=1)
        cols = set(out.schema().names)
        assert "LiNT_score1" not in cols and "Log_prob_fwd" not in cols
        assert "Wrd_per_zin" in cols
