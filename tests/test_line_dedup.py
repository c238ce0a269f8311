"""CCNet-style cross-document line dedup: planted-truth mining and
byte-exact stripping."""


def _docs(spark):
    footer = "All rights reserved."
    cookie = "  We use cookies to improve your experience.  "
    rows = []
    for i in range(8):
        body = "Unique paragraph %d line one.\nSecond unique line %d." \
            % (i, i)
        rows.append((i, "%s\n%s\n\n%s" % (cookie, body, footer)))
    # a doc that is ONLY boilerplate, and a doc with no boilerplate
    rows.append((100, "All rights reserved.\n" + cookie.strip()))
    rows.append((101, "Completely original text.\nNothing shared."))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boilerplate_lines_mining(spark):
    from packages_sgml_spark.spark.datafilters import boilerplate_lines
    mined = {r.line: (r.n_docs, r.n_total)
             for r in boilerplate_lines(_docs(spark), min_docs=5)
             .collect()}
    assert mined == {
        "All rights reserved.": (9, 9),
        "We use cookies to improve your experience.": (9, 9)}
    # threshold respected: unique lines never mined
    loose = {r.line for r in
             boilerplate_lines(_docs(spark), min_docs=2).collect()}
    assert "Unique paragraph 3 line one." not in loose


def test_strip_boilerplate_byte_exact(spark):
    from packages_sgml_spark.spark.datafilters import (
        strip_boilerplate_lines)
    out = {r.doc_id: (r.text_clean, r.n_lines_removed)
           for r in strip_boilerplate_lines(_docs(spark), min_docs=5)
           .collect()}
    assert len(out) == 10                      # every doc present
    for i in range(8):
        want = ("Unique paragraph %d line one.\nSecond unique line %d."
                % (i, i))
        # empty line between body and footer survives (content spacing)
        assert out[i] == (want + "\n", 2)
    assert out[100] == ("", 2)                 # fully-boilerplate doc
    assert out[101] == ("Completely original text.\nNothing shared.", 0)


def test_strip_with_premined_frame(spark):
    from packages_sgml_spark.spark.datafilters import (
        boilerplate_lines, strip_boilerplate_lines)
    docs = _docs(spark)
    mined = boilerplate_lines(docs, min_docs=5)
    out = {r.doc_id: r.n_lines_removed
           for r in strip_boilerplate_lines(docs, mined=mined)
           .collect()}
    assert out[0] == 2 and out[101] == 0
