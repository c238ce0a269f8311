

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
