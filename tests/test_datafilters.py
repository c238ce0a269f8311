

def test_c4_line_keep_word_count_exact(spark):
    """The 5-word rlike must count WHITESPACE-SEPARATED words, not
    non-space character runs (r8 regression: `(?:\\s*\\S+){5}` let
    'Shared footer.' — 2 words, >= 5 non-space chars — pass)."""
    from packages_sgml_spark.spark.datafilters import c4_clean
    rows = [
        (1, "Shared footer."),                          # 2 words: drop
        (2, "abcdefgh."),                               # 1 word: drop
        (3, "one two three four five."),                # 5 words: keep
        (4, "one two three four."),                     # 4 words: drop
        (5, "  lead ws one two three four five."),      # keep
        (6, "a\tb\tc\td\te."),                          # tabs: keep
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r.n_kept for r in c4_clean(docs).collect()}
    assert got == {1: 0, 2: 0, 3: 1, 4: 0, 5: 1, 6: 1}


def test_dup_ngram_frac_planted(spark):
    """Planted cross-doc semantics: a shared 8-word sentence is
    duplicated for BOTH docs carrying it; a doc repeating its own
    8-gram internally (but in no other doc) reports 0.0 (within-doc
    repetition belongs to repetition_stats); short docs report 0/0."""
    from packages_sgml_spark.spark.datafilters import dup_ngram_frac
    shared = "the quick brown fox jumps over the lazy"   # 8 words
    rows = [
        (1, shared + " dog and then some more words here"),
        (2, "intro words first " + shared + " trailing tail"),
        (3, ("self repeat " + "alpha beta gamma delta epsilon zeta "
             "eta theta " * 2).strip()),
        (4, "too short"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.doc_id: (r.n_grams, r.dup_ngram_frac)
           for r in dup_ngram_frac(df).collect()}
    # doc1: 15 words -> 8 grams, exactly gram@1 == doc2's gram@4
    assert got[1][0] == 8 and abs(got[1][1] - round(1 / 8, 6)) < 1e-9
    # doc2: 13 words -> 6 grams, one duplicated
    assert got[2][0] == 6 and abs(got[2][1] - round(1 / 6, 6)) < 1e-9
    # doc3: internal repeat only -> 0.0 cross-doc
    assert got[3][0] > 0 and got[3][1] == 0.0
    assert got[4] == (0, 0.0) and got[5] == (0, 0.0)
