"""quality_features (the r8 fused crawl-job quality sidecar) must be
value-identical to the 3-join composition of the registered queries
it replaces — same rows, same column names, exact value equality
(the fused projection reuses the registered queries' expression
builders, so any drift is a refactor bug)."""

import math

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _planted(spark):
    """Edge-heavy corpus: NULL text, empty text, whitespace-only,
    CRLF lines, repeated stopwords (replace-count greedy semantics),
    bullets, ellipses, braces, lorem ipsum, javascript lines,
    multi-space runs, non-ASCII words."""
    rows = [
        (1, None),
        (2, ""),
        (3, "   \t  \n  "),
        (4, "The the THE the the dog. And of la le el der und.\r\n"
            "Second line with five words here.\r\n{ code }"),
        (5, "• bullet one\n• bullet two\nplain line ends properly "
            "with the and of words."),
        (6, "lorem ipsum dolor sit amet. This line has plenty of "
            "words to keep.\nAnother good line with many words in "
            "it."),
        (7, "word " * 200 + "the of and to in."),
        (8, "ellipsis line one...\nellipsis line two…\n"
            "A normal sentence with the usual words."),
        (9, "javascript required to view. This page needs "
            "javascript enabled for all of the content."),
        (10, "la  le   el    der\n\n\nund de det "
             "καλημέρα мир 你好. the."),
        (11, "de de de de de en en het o e dos."),
        (12, "x. " * 60),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _composed(docs):
    from packages_sgml_spark.spark.datafilters import c4_clean
    from packages_sgml_spark.spark.textops import (gopher_quality,
                                                   lang_id_stopwords)
    return (gopher_quality(docs)
            .join(c4_clean(docs).select("doc_id", "n_kept",
                                        "c4_keep"), "doc_id")
            .join(lang_id_stopwords(docs), "doc_id"))


def _assert_equal(fused_df, comp_df):
    assert fused_df.columns == [
        "doc_id", "n_words", "mean_word_len", "symbol_ratio",
        "bullet_frac", "ellipsis_frac", "alpha_word_frac",
        "n_stop_hits", "gopher_pass", "n_kept", "c4_keep",
        "lang_pred", "lang_score"]
    fused = {r["doc_id"]: r.asDict() for r in fused_df.collect()}
    comp = {r["doc_id"]: r.asDict() for r in comp_df.collect()}
    assert set(fused) == set(comp)
    for doc_id, f in fused.items():
        c = comp[doc_id]
        for k, v in f.items():
            cv = c[k]
            if isinstance(v, float) and isinstance(cv, float):
                assert (math.isclose(v, cv, rel_tol=0, abs_tol=0)
                        or (math.isnan(v) and math.isnan(cv))), \
                    (doc_id, k, v, cv)
            else:
                assert v == cv, (doc_id, k, v, cv)


def test_fused_equals_composition_planted(spark):
    from packages_sgml_spark.spark.textops import quality_features
    docs = _planted(spark)
    _assert_equal(quality_features(docs), _composed(docs))


def test_fused_equals_composition_documents(spark):
    from packages_sgml_spark.spark.textops import quality_features
    docs = (spark.read.parquet(SF_DIR + "/documents.parquet")
            .select("doc_id", "text"))
    _assert_equal(quality_features(docs), _composed(docs))


def test_fused_plan_shape(spark):
    """The whole point: one scan, zero shuffles after the spread —
    no join operator anywhere in the fused plan."""
    from packages_sgml_spark.spark.textops import quality_features
    docs = (spark.read.parquet(SF_DIR + "/documents.parquet")
            .select("doc_id", "text"))
    plan = quality_features(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Join" not in plan, plan
