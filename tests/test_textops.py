"""Text-analysis operator tests (+ DuckDB oracles where expressible)."""

import duckdb
import numpy as np
import pytest
import ray.data as rd

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    return rd.read_parquet(f"{SF_DIR}/documents.parquet")


class TestTokenCounts:
    def test_matches_sql(self, docs):
        from tscan_ray.ops.textops import add_token_counts

        out = add_token_counts(docs, "text").to_pandas()
        con = duckdb.connect()
        oracle = con.execute(
            f"""
            select doc_id,
                   case when length(trim(text)) = 0 then 0
                        else len(regexp_split_to_array(trim(text), '\\s+')) end as n_ws
            from '{SF_DIR}/documents.parquet'
            """
        ).df()
        m = out.sort_values("doc_id")["n_tokens_ws"].to_numpy()
        o = oracle.sort_values("doc_id")["n_ws"].to_numpy()
        assert (m == o).all()

    def test_bpe_counts_symbols(self):
        from tscan_ray.ops.textops import _BPE_RE

        assert _BPE_RE.findall("hello, world! 42") == ["hello", ",", "world", "!", "42"]


class TestQuality:
    def test_scores_bounded(self, docs):
        from tscan_ray.ops.textops import add_quality_score

        out = add_quality_score(docs.limit(50), "text").to_pandas()
        assert ((out["quality_score"] >= 0) & (out["quality_score"] <= 1)).all()
        assert (out["n_chars"] > 0).all()

    def test_repetitive_text_scores_lower(self):
        import pandas as pd

        from tscan_ray.ops.textops import add_quality_score

        ds = rd.from_pandas(pd.DataFrame({
            "text": ["the cat sat on a warm mat while small birds sang over "
                     "distant green hills this quiet morning under pale light "
                     "and nobody noticed the gentle wind moving through trees",
                     "spam spam spam spam spam spam spam spam spam spam " * 5],
        }))
        out = add_quality_score(ds, "text").to_pandas()
        assert out["quality_score"][0] > out["quality_score"][1]


class TestLangId:
    def test_known_languages(self):
        import pandas as pd

        from tscan_ray.ops.textops import add_lang_id

        ds = rd.from_pandas(pd.DataFrame({
            "text": ["the cat is on the mat and it was good",
                     "de kat is op de mat en het was goed",
                     "der Hund ist auf und das war für mich",
                     "xyzzy qwerty"],
        }))
        out = add_lang_id(ds, "text").to_pandas()
        assert list(out["lang_pred"]) == ["en", "nl", "de", "und"]


class TestFingerprint:
    def test_deterministic_and_sensitive(self):
        from tscan_ray.ops.textops import rolling_fingerprint

        a = rolling_fingerprint("the quick brown fox jumps over the lazy dog")
        b = rolling_fingerprint("the quick brown fox jumps over the lazy dog")
        c = rolling_fingerprint("the quick brown fox jumps over the lazy cat")
        assert a == b
        assert a != c
        assert rolling_fingerprint("") == 0
        assert isinstance(rolling_fingerprint("ab"), int)

    def test_stage(self, docs):
        from tscan_ray.ops.textops import add_fingerprint

        out = add_fingerprint(docs.limit(10), "text").to_pandas()
        assert out["fingerprint"].notna().all()


class TestWordFreqTopk:
    def test_matches_sql(self, docs):
        from tscan_ray.ops.textops import word_frequency_topk

        out = word_frequency_topk(docs, "text", k=10).to_pandas()
        con = duckdb.connect()
        oracle = con.execute(
            f"""
            select tok as token, count(*) as n
            from (select unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) as tok
                  from '{SF_DIR}/documents.parquet')
            group by tok order by n desc, token limit 10
            """
        ).df()
        assert list(out["token"]) == list(oracle["token"])
        assert (out["n"].to_numpy() == oracle["n"].to_numpy()).all()


class TestChunkDocuments:
    def test_overlap_stride(self):
        import pandas as pd
        import ray.data as rd

        from tscan_ray.ops.textops import chunk_documents

        text = " ".join(str(i) for i in range(10))
        ds = rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": [text]}))
        out = chunk_documents(ds, "text", "doc_id", chunk_tokens=4,
                              overlap=2).to_pandas()
        # stride 2: chunks [0..3],[2..5],[4..7],[6..9] then stop
        assert out["chunk_text"].tolist() == [
            "0 1 2 3", "2 3 4 5", "4 5 6 7", "6 7 8 9"]
        assert out["chunk_id"].tolist() == [0, 1, 2, 3]

    def test_empty_and_null_skip(self):
        import pandas as pd
        import ray.data as rd

        from tscan_ray.ops.textops import chunk_documents

        ds = rd.from_pandas(pd.DataFrame(
            {"doc_id": [1, 2, 3], "text": [None, "", "a b"]}))
        out = chunk_documents(ds, "text", "doc_id", chunk_tokens=4).to_pandas()
        assert out["doc_id"].tolist() == [3]

    def test_all_empty_batch_keeps_schema(self):
        """A batch with zero chunk output must still type the id column
        (null-typed empty arrays break Ray schema unification)."""
        import pandas as pd
        import ray.data as rd

        from tscan_ray.ops.textops import chunk_documents

        ds = rd.from_pandas(pd.DataFrame(
            {"doc_id": [1, 2], "text": [None, ""]})).repartition(2)
        out = chunk_documents(ds, "text", "doc_id", chunk_tokens=4)
        import pyarrow as pa
        schema = out.schema()
        assert dict(zip(schema.names, schema.types))["doc_id"] == pa.int64()
        assert out.count() == 0
