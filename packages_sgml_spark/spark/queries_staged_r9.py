"""Round-9 registry candidates, staged while the registry is frozen
at 70 (the r5 drift-kill rule: keys change only at round START).

The keys: ``quality_features``
(the r8 fused crawl-job quality sidecar), ``dup_ngram_frac``
(cross-doc duplicated-8-gram fraction), ``simhash_pairs``
(banded-Hamming near-dup pairs), ``doc_chunks`` (fixed-size
training-sequence chunking), ``stratified_sample`` (deterministic
per-source quota sampling), ``host_quality`` (domain-filter rollup
with exact integer sums), ``dedup_keep`` (materialized per-doc keep
decision over LSH components), ``pack_sequences``
(concatenate-and-cut packing spans), ``vocab_ngrams`` (corpus top-k
bigram census), ``unigram_logprob`` (CCNet-style corpus-unigram
NLL), ``tfidf_top_terms`` (characteristic terms per host),
``corpus_keep`` (the whole filter stack in one plan),
``dedup_spans`` (materialized exact-substring removal),
``shard_assign`` (deterministic training-shard shuffle),
``semdedup_keep`` (embedding-cluster keep decision), and
``classifier_score`` (model-based quality scoring, weights as
input) — sixteen keys, registry 70 -> 86 at r9 start.  Each is
gated NOW with the driver-exact compare at sf0.001 (pytest) and
sf0.01 (session gate) plus a planted-semantics test.

At round-9 start, registration is the queries_staged.py pattern:

    QUERIES.update(queries_staged_r9.R9_QUERIES)
    ORACLES.update(queries_staged_r9.R9_ORACLES)
"""

from .queries import _t
from .queries_staged import (_GOPHER_STOP_SQL, _LINEDOC_SQL_T,
                             _line_docs)


def q_quality_features(spark, sf_dir):
    """Fused quality sidecar (textops.quality_features) over
    line-ified documents — the exact projection jobs/crawl_job.py
    writes per url."""
    from .textops import quality_features
    return quality_features(_line_docs(_t(spark, sf_dir,
                                          "documents")))


def _lang_cols_sql():
    """lang_pred/lang_score SQL fragments over a `padded` column —
    the shared oracles._lang_pieces definition (no duplicate
    formula)."""
    from .oracles import _lang_pieces
    return _lang_pieces()


def _quality_features_oracle(src=None):
    # src: SQL expression for the text column (default: the staged
    # line-ified shape; corpus_keep reuses this oracle over plain
    # `text`).
    # COLUMN-NAME TRAP: both borrowed fragments hardcode a source
    # column named `padded`, but they mean DIFFERENT strings — the
    # gopher stop-hits read the \s+-normalized text, the lang marker
    # counts the raw ' '||lower(text)||' '.  Here `padded` is the
    # lang string and the gopher fragment is rewritten to `gpadded`
    # (caught by the staged gate: nl-vs-de flips on docs whose text
    # ends '\nde').
    scores, ranks, case, greatest = _lang_cols_sql()
    return """
WITH b AS (SELECT doc_id, coalesce({src}, '') AS text,
                  {src} AS rawtext FROM documents),
s AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(trim(text), '\\s+'),
                x -> x <> '') AS words,
    regexp_split_to_array(text, '\\r?\\n') AS lines,
    CAST((length(text) - length(replace(text, '#', ''))) +
         (length(text) - length(replace(text, '...', ''))) / 3 +
         (length(text) - length(replace(text, '…', ''))) AS INT)
      AS n_symbols,
    ' ' || regexp_replace(lower(text), '\\s+', ' ', 'g') || ' '
      AS gpadded,
    ' ' || lower(rawtext) || ' ' AS padded,
    (NOT contains(lower(text), 'lorem ipsum')
     AND NOT contains(text, '{{')) AS c4_page_ok
  FROM b),
g AS (
  SELECT doc_id,
    CAST(len(words) AS BIGINT) AS n_words,
    CAST(greatest(len(words), 1) AS DOUBLE) AS wden,
    CAST(greatest(len(lines), 1) AS DOUBLE) AS lden,
    CAST(COALESCE(list_sum(list_transform(words, x -> length(x))), 0)
         AS DOUBLE) AS wchars,
    CAST(len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]')))
         AS DOUBLE) AS n_alpha,
    CAST(len(list_filter(lines, x -> list_contains(
      ['•','‣','▪','●','◦','⁃','*','-'],
      substr(ltrim(x), 1, 1)))) AS DOUBLE) AS n_bullet,
    CAST(len(list_filter(lines, x -> rtrim(x) LIKE '%...'
         OR rtrim(x) LIKE '%…')) AS DOUBLE) AS n_ellipsis,
    n_symbols,
    CAST({stop} AS INT) AS n_stop_hits,
    CAST(len(list_filter(lines, l ->
      (rtrim(l) LIKE '%.' OR rtrim(l) LIKE '%!' OR
       rtrim(l) LIKE '%?' OR rtrim(l) LIKE '%"')
      AND len(list_filter(regexp_split_to_array(trim(l), '\\s+'),
                          x -> x <> '')) >= 5
      AND NOT contains(lower(l), 'javascript'))) AS INT) AS n_kept,
    c4_page_ok,
    {scores}
  FROM s),
r AS (
  SELECT doc_id, n_words,
    round(wchars / wden, 6) AS mean_word_len,
    round(n_symbols / wden, 6) AS symbol_ratio,
    round(n_bullet / lden, 6) AS bullet_frac,
    round(n_ellipsis / lden, 6) AS ellipsis_frac,
    round(n_alpha / wden, 6) AS alpha_word_frac,
    n_stop_hits, n_kept, c4_page_ok,
    {ranks}, {greatest} AS lang_score
  FROM g)
SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_frac,
  ellipsis_frac, alpha_word_frac, n_stop_hits,
  CAST(CASE WHEN n_words BETWEEN 50 AND 100000
             AND mean_word_len BETWEEN 3.0 AND 10.0
             AND symbol_ratio <= 0.1
             AND bullet_frac <= 0.9
             AND ellipsis_frac <= 0.3
             AND alpha_word_frac >= 0.8
             AND n_stop_hits >= 2
       THEN 1 ELSE 0 END AS INT) AS gopher_pass,
  n_kept,
  CAST(CASE WHEN n_kept >= 3 AND c4_page_ok THEN 1 ELSE 0 END AS INT)
    AS c4_keep,
  {case} AS lang_pred, lang_score
FROM r
""".format(src=src or _LINEDOC_SQL_T,
           stop=_GOPHER_STOP_SQL.replace('padded', 'gpadded'), scores=scores,
           ranks=ranks, case=case, greatest=greatest)


ORACLE_QUALITY_FEATURES = _quality_features_oracle()


def q_dup_ngram_frac(spark, sf_dir):
    """Cross-document duplicated-8-gram fraction per doc (the Lee et
    al. exact-substring-dedup signal) over the documents table."""
    from .datafilters import dup_ngram_frac
    return dup_ngram_frac(_t(spark, sf_dir, "documents"))


# Spark keys grams by xxhash64 (8-byte shuffle rows — the scale
# path); the oracle groups by the gram STRING.  Value-identical
# unless a 64-bit collision mis-tags a position (~#grams/2^64).
ORACLE_DUP_NGRAM_FRAC = """
WITH w AS (
  SELECT doc_id,
    regexp_split_to_array(
      regexp_replace(lower(trim(coalesce(text, ''))), '\\s+', ' ',
                     'g'), ' ') AS words
  FROM documents),
g AS (
  SELECT doc_id,
    CASE WHEN len(words) >= 8
      THEN list_transform(range(1, len(words) - 6),
                          i -> array_to_string(words[i:i+7], ' '))
      ELSE CAST([] AS VARCHAR[]) END AS grams
  FROM w),
cnts AS (
  SELECT doc_id, gram, count(*) AS c
  FROM (SELECT doc_id, unnest(grams) AS gram FROM g)
  GROUP BY doc_id, gram),
dup AS (SELECT gram FROM cnts GROUP BY gram HAVING count(*) > 1),
nd AS (SELECT doc_id, sum(c) AS n_dup FROM cnts
       WHERE gram IN (SELECT gram FROM dup) GROUP BY doc_id),
nt AS (SELECT doc_id, sum(c) AS n_grams FROM cnts GROUP BY doc_id)
SELECT d.doc_id,
  CAST(coalesce(nt.n_grams, 0) AS BIGINT) AS n_grams,
  round(coalesce(nd.n_dup, 0) /
        greatest(coalesce(nt.n_grams, 0), 1), 6) AS dup_ngram_frac
FROM documents d
LEFT JOIN nt USING (doc_id)
LEFT JOIN nd USING (doc_id)
"""

def q_simhash_pairs(spark, sf_dir):
    """Banded-Hamming near-dup pairs over the 32-bit simhash —
    completes the SimHash dedup surface (the registered `simhash`
    emits signatures only): exact recall for hamming <= 3 via the
    4-chunk pigeonhole, with the minhash-style star-collapse and
    bucket-cap skew guards."""
    from .dedup import simhash_pairs
    return simhash_pairs(_t(spark, sf_dir, "documents"))


def _simhash_pairs_oracle():
    """Wraps the registered simhash oracle as a CTE, then replicates
    the star / band / cap / verify semantics of dedup.simhash_pairs
    (row_number cap = the list_sort slice; bit_count(xor) = the
    banded Hamming verify; both engines' bit_count cast to INT —
    DuckDB's returns TINYINT)."""
    from .dedup import MAX_LSH_BUCKET
    from .oracles import ORACLES
    return """
WITH sim AS ({simhash}),
wr AS (SELECT doc_id, simhash,
              min(doc_id) OVER (PARTITION BY simhash) AS rep
       FROM sim),
star AS (SELECT rep AS doc_a, doc_id AS doc_b, CAST(0 AS INT) AS hamming
         FROM wr WHERE doc_id <> rep),
reps AS (SELECT doc_id, simhash FROM wr WHERE doc_id = rep),
banded AS (
  SELECT doc_id, simhash, (simhash >> (8 * t.i)) & 255 AS key, t.i AS band
  FROM reps, range(4) t(i)),
ranked AS (
  SELECT band, key, doc_id, simhash,
         row_number() OVER (PARTITION BY band, key
                            ORDER BY doc_id) AS rn,
         count(*) OVER (PARTITION BY band, key) AS sz
  FROM banded),
capped AS (SELECT band, key, doc_id, simhash FROM ranked
           WHERE rn <= {cap} AND sz >= 2),
rpairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
  FROM capped a JOIN capped b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3)
SELECT DISTINCT doc_a, doc_b, hamming FROM (
  SELECT * FROM star UNION ALL SELECT * FROM rpairs)
""".format(simhash=ORACLES["simhash"], cap=MAX_LSH_BUCKET)


ORACLE_SIMHASH_PAIRS = _simhash_pairs_oracle()


def q_doc_chunks(spark, sf_dir):
    """Fixed-size training-sequence chunking (textops.doc_chunks) at
    a 32-word window — the sequence-packing shard shape.  Zero
    shuffles: one generate+project stage, chunks stay in their
    parent doc's partition."""
    from .textops import doc_chunks
    return doc_chunks(_t(spark, sf_dir, "documents"), chunk_size=32)


# DuckDB list slices are 1-based inclusive and clamp at the array
# end, mirroring Spark's F.slice(w, start, length) exactly; empty /
# whitespace-only docs produce zero chunk rows on both engines
# (range(0,0) unnests to nothing; Spark guards the descending
# sequence(0,-1) trap).
ORACLE_DOC_CHUNKS = """
WITH t AS (
  SELECT doc_id,
    regexp_replace(coalesce(text, ''), '^\\s+|\\s+$', '', 'g')
      AS stripped
  FROM documents),
w AS (
  SELECT doc_id,
    CASE WHEN length(stripped) = 0
         THEN CAST([] AS VARCHAR[])
         ELSE regexp_split_to_array(stripped, '\\s+') END AS words
  FROM t),
c AS (
  SELECT doc_id, words,
         unnest(range(0, CAST(ceil(len(words) / 32.0) AS BIGINT)))
           AS i
  FROM w)
SELECT doc_id, CAST(i AS INT) AS chunk_id,
  CAST(len(words[(i*32+1):(i*32+32)]) AS INT) AS n_tokens,
  array_to_string(words[(i*32+1):(i*32+32)], ' ') AS chunk_text
FROM c
"""


def q_stratified_sample(spark, sf_dir):
    """Deterministic per-source quota sample (k=10) — the data-mixing
    primitive: same corpus in, same sample out, no rand()."""
    from .datafilters import stratified_sample
    return stratified_sample(_t(spark, sf_dir, "documents"), k=10)


# Same md5-hex permutation on both engines (Spark md5(encode(s,
# 'utf-8')) == DuckDB md5(VARCHAR), lowercase hex), doc_id
# tie-break, identical row_number semantics.
ORACLE_STRATIFIED_SAMPLE = """
WITH r AS (
  SELECT doc_id, source,
         CAST(row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT)
           AS sample_rank
  FROM documents)
SELECT doc_id, source, sample_rank FROM r WHERE sample_rank <= 10
"""


def q_host_quality(spark, sf_dir):
    """Host-level quality rollup (textops.host_quality) — the
    domain-filter signal, aggregated with exact integer sums so the
    result is partition-order independent."""
    from .textops import host_quality
    return host_quality(_t(spark, sf_dir, "documents"))


def _host_quality_oracle():
    """Per-doc CTE mirrors the registered quality oracle's b/s stages
    (same trim/split/punct/stop-hit formulas — shared _occ fragments,
    no drift), then integer-sums per source with one terminal
    division per ratio.  Sums are CAST to BIGINT before fetch:
    DuckDB sum(int) returns HUGEINT and DECIMAL cells are
    driver-unsafe."""
    from .oracles import _occ, _STOPWORDS
    occ = " + ".join(_occ(" %s " % w) for w in _STOPWORDS)
    return """
WITH b AS (
  SELECT doc_id, source, text, length(text) AS n_chars,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
           AS n_words,
         length(text) -
           length(regexp_replace(text, '[.,!?;:]', '', 'g'))
           AS n_punct,
         ' ' || lower(text) || ' ' AS padded
  FROM documents),
s AS (SELECT source, n_chars, n_words, n_punct, ({occ}) AS stop_hits
      FROM b),
g AS (
  SELECT source,
         count(*) AS n_docs,
         CAST(sum(n_words) AS BIGINT) AS sw,
         CAST(sum(n_chars) AS BIGINT) AS sc,
         CAST(sum(n_punct) AS BIGINT) AS sp,
         CAST(sum(stop_hits) AS BIGINT) AS ss,
         CAST(sum(CASE WHEN n_words < 30 THEN 1 ELSE 0 END)
              AS BIGINT) AS nshort
  FROM s GROUP BY source)
SELECT source,
  CAST(n_docs AS BIGINT) AS n_docs,
  sw AS n_words,
  round(sw / n_docs, 6) AS mean_doc_words,
  round(sp / greatest(sc, 1), 6) AS punct_ratio,
  round(ss / greatest(sw, 1), 6) AS stopword_ratio,
  round(nshort / n_docs, 6) AS short_doc_frac
FROM g
""".format(occ=occ)


ORACLE_HOST_QUALITY = _host_quality_oracle()


def q_dedup_keep(spark, sf_dir):
    """Materialized per-doc dedup decision (dedup.dedup_keep):
    MinHash-LSH candidates -> connected components -> one keep bit
    per doc, exactly one representative per near-dup cluster."""
    from .dedup import dedup_keep
    return dedup_keep(_t(spark, sf_dir, "documents"))


def _dedup_keep_oracle():
    """Wraps the registered dedup_components recursive-CTE oracle as
    a named subquery (DuckDB allows WITH RECURSIVE inside a CTE
    body), adds cluster sizes, and left-joins onto the doc base —
    singletons coalesce to themselves with size 1."""
    from .oracles import ORACLES
    return """
WITH comp AS ({comp}),
sz AS (SELECT component, count(*) AS csize FROM comp
       GROUP BY component)
SELECT d.doc_id,
  CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS component,
  CAST(coalesce(s.csize, 1) AS BIGINT) AS cluster_size,
  CAST(CASE WHEN coalesce(c.component, d.doc_id) = d.doc_id
       THEN 1 ELSE 0 END AS INT) AS keep
FROM documents d
LEFT JOIN comp c ON d.doc_id = c.doc_id
LEFT JOIN sz s ON c.component = s.component
""".format(comp=ORACLES["dedup_components"])


ORACLE_DEDUP_KEEP = _dedup_keep_oracle()


def q_pack_sequences(spark, sf_dir):
    """Concatenate-and-cut sequence packing at a 128-token budget
    (textops.pack_sequences) — per-source token streams cut into
    fixed training sequences, each doc's span recorded."""
    from .textops import pack_sequences
    return pack_sequences(_t(spark, sf_dir, "documents"), budget=128)


# Identical running-sum window on both engines (ROWS UNBOUNDED
# PRECEDING .. 1 PRECEDING, doc_id order within source); integer
# token counts make the cumulative sum exact.
ORACLE_PACK_SEQUENCES = """
WITH per AS (
  SELECT doc_id, source,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+'))
              END AS BIGINT) AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, source, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS before
  FROM per)
SELECT doc_id, source, n_tokens,
       CAST(floor(before / 128) AS BIGINT) AS seq_id,
       CAST(before % 128 AS BIGINT) AS seq_offset
FROM c
"""


def q_vocab_ngrams(spark, sf_dir):
    """Corpus-level top-50 bigram census (textops.vocab_ngrams) —
    the BPE merge-candidate sweep / boilerplate-phrase census."""
    from .textops import vocab_ngrams
    return vocab_ngrams(_t(spark, sf_dir, "documents"), n=2,
                        top_k=50)


# The top-k CUT is part of the contract: both engines order by
# (count DESC, gram ASC) so boundary ties resolve identically and
# the 50-row SETS hash-match.
ORACLE_VOCAB_NGRAMS = """
WITH w AS (
  SELECT doc_id,
    regexp_split_to_array(
      regexp_replace(lower(trim(coalesce(text, ''))), '\\s+', ' ',
                     'g'), ' ') AS words
  FROM documents),
g AS (
  SELECT doc_id,
    CASE WHEN len(words) >= 2
      THEN list_transform(range(1, len(words)),
                          i -> array_to_string(words[i:i+1], ' '))
      ELSE CAST([] AS VARCHAR[]) END AS grams
  FROM w),
u AS (SELECT doc_id, unnest(grams) AS gram FROM g)
SELECT gram,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM u GROUP BY gram
ORDER BY n_occurrences DESC, gram
LIMIT 50
"""


def q_unigram_logprob(spark, sf_dir):
    """Corpus-unigram NLL per doc (datafilters.unigram_logprob) —
    the CCNet/perplexity-style fluency filter's SQL-expressible
    core."""
    from .datafilters import unigram_logprob
    return unigram_logprob(_t(spark, sf_dir, "documents"))


# Determinism: both engines fold ln(count) terms over a SORTED list
# (sort_array+F.aggregate vs list_sort+list_reduce, same 0.0 seed
# via list_prepend) — identical IEEE addition order, so the only
# cross-engine noise is a possible 1-ulp ln() divergence, absorbed
# by round(.,6) and pinned by this gate on the fixed corpus.
ORACLE_UNIGRAM_LOGPROB = """
WITH w AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(
      regexp_replace(lower(trim(coalesce(text, ''))), '\\s+', ' ',
                     'g'), ' '), x -> x <> '') AS words
  FROM documents),
u AS (SELECT doc_id, unnest(words) AS word FROM w),
f AS (SELECT word, count(*) AS c FROM u GROUP BY word),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM f),
perdoc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
         list_sort(list(ln(CAST(c AS DOUBLE)))) AS lns
  FROM u JOIN f USING (word) GROUP BY doc_id),
s AS (
  SELECT doc_id, n,
         n * ln(CAST((SELECT t FROM tot) AS DOUBLE)) -
           list_reduce(list_prepend(0.0, lns), (a, b) -> a + b)
           AS nll
  FROM perdoc)
SELECT d.doc_id, CAST(coalesce(s.n, 0) AS BIGINT) AS n_words,
  round(coalesce(s.nll / greatest(s.n, 1), 0.0), 6) AS mean_nll
FROM documents d LEFT JOIN s USING (doc_id)
"""


def q_tfidf_top_terms(spark, sf_dir):
    """Characteristic terms per source (textops.tfidf_top_terms):
    tf-idf with hosts as the idf documents, top-5 per host."""
    from .textops import tfidf_top_terms
    return tfidf_top_terms(_t(spark, sf_dir, "documents"), top_k=5)


# No float accumulation anywhere: score is one int*ln(int/int)
# expression per (source, term) row; the (score DESC, term ASC)
# row_number makes the per-host cut deterministic on both engines.
ORACLE_TFIDF_TOP_TERMS = """
WITH w AS (
  SELECT doc_id, source,
    list_filter(regexp_split_to_array(
      regexp_replace(lower(trim(coalesce(text, ''))), '\\s+', ' ',
                     'g'), ' '), x -> x <> '') AS words
  FROM documents),
pos AS (SELECT source, unnest(words) AS term FROM w),
tf AS (SELECT source, term, CAST(count(*) AS BIGINT) AS tf
       FROM pos GROUP BY source, term),
dfx AS (SELECT term, CAST(count(*) AS BIGINT) AS df
        FROM tf GROUP BY term),
ns AS (SELECT CAST(count(DISTINCT source) AS BIGINT) AS n
       FROM documents),
s AS (
  SELECT source, term, tf, df,
         round(tf * ln(CAST((SELECT n FROM ns) AS DOUBLE) /
                       CAST(df AS DOUBLE)), 6) AS score
  FROM tf JOIN dfx USING (term)),
r AS (
  SELECT source, term, tf, df, score,
         CAST(row_number() OVER (
           PARTITION BY source
           ORDER BY score DESC, term) AS INT) AS rank
  FROM s)
SELECT source, term, tf, df, score, rank FROM r WHERE rank <= 5
"""


def q_corpus_keep(spark, sf_dir):
    """The shipped corpus decision (datafilters.corpus_keep): the
    whole filter stack — near-dup dedup, Gopher, C4, lang-ID — in
    ONE plan, each signal a bit plus the final AND."""
    from .datafilters import corpus_keep
    return corpus_keep(_t(spark, sf_dir, "documents"))


def _corpus_keep_oracle():
    """Nests the dedup_keep oracle and the quality_features oracle
    (re-parametrized over plain `text` instead of the staged
    line-ified shape) as CTEs and joins on doc_id."""
    return """
WITH dk AS ({dk}),
qf AS ({qf})
SELECT d.doc_id, dk.keep AS keep_dedup, qf.gopher_pass, qf.c4_keep,
  qf.lang_pred,
  CAST(CASE WHEN dk.keep = 1 AND qf.gopher_pass = 1
             AND qf.c4_keep = 1 THEN 1 ELSE 0 END AS INT) AS keep
FROM documents d
JOIN dk ON d.doc_id = dk.doc_id
JOIN qf ON d.doc_id = qf.doc_id
""".format(dk=ORACLE_DEDUP_KEEP,
           qf=_quality_features_oracle(src="text"))


ORACLE_CORPUS_KEEP = _corpus_keep_oracle()


def q_dedup_spans(spark, sf_dir):
    """Materialized exact-substring removal (datafilters.dedup_spans)
    — every word covered by a cross-document duplicated 8-gram cut,
    survivors reassembled in document order."""
    from .datafilters import dedup_spans
    import inspect
    # ORACLE_DEDUP_SPANS hardcodes the n=8 gram width (r8 ADVICE):
    # pin the Spark side to the same default so a future gate run
    # with a different n can't silently compare the wrong oracle
    assert inspect.signature(dedup_spans).parameters["n"].default == 8
    return dedup_spans(_t(spark, sf_dir, "documents"))


# Spark keys grams by xxhash64 (8-byte shuffle rows); the oracle
# groups by the gram STRING — value-identical modulo the documented
# 64-bit collision odds (same note as dup_ngram_frac).  NULL text
# behaves as empty on both sides (per-doc transformation: no
# cross-doc evidence to poison, unlike dedup_keep).  Matching runs
# on the normalized lowercase words; emission uses the parallel
# original-case owords array (identical token boundaries).
ORACLE_DEDUP_SPANS = """
WITH w AS (
  SELECT doc_id,
    CASE WHEN length(trim(coalesce(text, ''))) = 0
         THEN CAST([] AS VARCHAR[])
         ELSE regexp_split_to_array(
                regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                ' ')
    END AS words,
    CASE WHEN length(trim(coalesce(text, ''))) = 0
         THEN CAST([] AS VARCHAR[])
         ELSE regexp_split_to_array(trim(text), '\\s+')
    END AS owords
  FROM documents),
gp AS (
  SELECT doc_id, words,
         unnest(range(1, greatest(len(words) - 6, 1))) AS pos
  FROM w),
g AS (
  SELECT doc_id, pos,
         array_to_string(words[pos:pos+7], ' ') AS gram
  FROM gp),
dupg AS (
  SELECT gram FROM (
    SELECT gram, count(DISTINCT doc_id) AS nd FROM g GROUP BY gram)
  WHERE nd >= 2),
cov AS (
  SELECT DISTINCT g.doc_id, g.pos + r.k AS j
  FROM g JOIN dupg USING (gram), range(8) r(k)),
wip AS (
  SELECT doc_id, owords,
         unnest(range(1, len(owords) + 1)) AS j
  FROM w),
wi AS (
  SELECT doc_id, j, owords[j] AS word
  FROM wip),
kept AS (
  SELECT wi.doc_id, wi.j, wi.word
  FROM wi LEFT JOIN cov ON wi.doc_id = cov.doc_id AND wi.j = cov.j
  WHERE cov.j IS NULL),
per AS (
  SELECT doc_id, CAST(count(*) AS INT) AS n_kept,
         string_agg(word, ' ' ORDER BY j) AS kept_text
  FROM kept GROUP BY doc_id)
SELECT d.doc_id,
  CAST(len(w.words) AS INT) AS n_words,
  CAST(coalesce(per.n_kept, 0) AS INT) AS n_kept,
  coalesce(per.kept_text, '') AS kept_text
FROM documents d
JOIN w USING (doc_id)
LEFT JOIN per USING (doc_id)
"""


def q_shard_assign(spark, sf_dir):
    """Deterministic training-shard shuffle
    (datafilters.shard_assign): md5-bucketed shard + in-shard rank,
    bit-reproducible across runs and engines."""
    from .datafilters import shard_assign
    return shard_assign(_t(spark, sf_dir, "documents"), n_shards=8)


# Same md5-hex permutation trick as stratified_sample; the shard
# bucket parses the first 8 hex digits (F.conv base 16 on Spark,
# CAST('0x…') on DuckDB — both yield the same uint32, % 8 of a
# non-negative value matches pmod).
ORACLE_SHARD_ASSIGN = """
WITH k AS (
  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS key
  FROM documents),
s AS (
  SELECT doc_id, key,
         CAST(CAST(concat('0x', substr(key, 1, 8)) AS BIGINT) % 8
              AS INT) AS shard
  FROM k)
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard
                               ORDER BY key, doc_id) AS INT)
         AS shard_pos
FROM s
"""


def q_semdedup_keep(spark, sf_dir):
    """Embedding-cluster keep decision (similarity.semdedup_keep):
    LSH-bucketed cosine pairs at the registered embedding_dups
    threshold -> connected components -> one representative per
    semantic cluster."""
    from .queries import F, similarity
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>"))
    return similarity.semdedup_keep(emb, threshold=0.2, dim=64,
                                    n_planes=6)


def _semdedup_keep_oracle():
    """Wraps the registered embedding_dups oracle (same threshold /
    planes) as the pair CTE, then the dedup_keep recursive-reach /
    size / keep shape over the embeddings base."""
    from .oracles import ORACLES
    return """
WITH RECURSIVE p AS ({dups}),
edges AS (SELECT vec_a AS src, vec_b AS dst FROM p
          UNION SELECT vec_b, vec_a FROM p),
reach(src, node) AS (
  SELECT src, src FROM (SELECT DISTINCT src FROM edges)
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.node = e.src),
comp AS (SELECT src AS vec_id, MIN(node) AS component
         FROM reach GROUP BY src),
sz AS (SELECT component, count(*) AS csize FROM comp
       GROUP BY component)
SELECT e.vec_id,
  CAST(coalesce(c.component, e.vec_id) AS BIGINT) AS component,
  CAST(coalesce(s.csize, 1) AS BIGINT) AS cluster_size,
  CAST(CASE WHEN coalesce(c.component, e.vec_id) = e.vec_id
       THEN 1 ELSE 0 END AS INT) AS keep
FROM embeddings e
LEFT JOIN comp c ON e.vec_id = c.vec_id
LEFT JOIN sz s ON c.component = s.component
""".format(dups=ORACLES["embedding_dups"])


ORACLE_SEMDEDUP_KEEP = _semdedup_keep_oracle()


def q_classifier_score(spark, sf_dir):
    """Model-based quality scoring (textops.classifier_score): the
    fastText-classifier slot with the model as INPUT.  For the gate,
    weights derive deterministically from the corpus vocabulary —
    md5-bucketed half of the distinct terms get a uniform [-0.5,0.5]
    weight, the other half exercises the OOV path."""
    from .dedup import norm_words
    from .queries import F
    from .textops import classifier_score
    docs = _t(spark, sf_dir, "documents")
    w = F.filter(norm_words(F.coalesce(F.col("text"), F.lit(""))),
                 lambda x: x != "")
    terms = docs.select(F.explode(w).alias("term")).distinct()
    h = F.conv(F.substring(
        F.md5(F.encode(F.col("term"), "utf-8")), 1, 8), 16, 10) \
        .cast("bigint")
    weights = (terms.withColumn("h", h)
               .filter(F.col("h") % 2 == 0)
               .select("term",
                       (F.col("h") / F.lit(4294967295.0) -
                        F.lit(0.5)).alias("weight")))
    return classifier_score(docs, weights, bias=0.25)


# Same md5-hex uint32 parse on both engines (the shard_assign
# pairing); the weight sum folds over a SORTED list on both sides;
# sigmoid's exp() is the accepted 1-ulp surface under round(.,6)
# (the unigram_logprob precedent).
ORACLE_CLASSIFIER_SCORE = """
WITH w AS (
  SELECT doc_id, list_filter(regexp_split_to_array(
      regexp_replace(lower(trim(coalesce(text, ''))), '\\s+', ' ',
                     'g'), ' '), x -> x <> '') AS words
  FROM documents),
pos AS (SELECT doc_id, unnest(words) AS term FROM w),
vocab AS (
  SELECT term,
         CAST(concat('0x', substr(md5(term), 1, 8)) AS BIGINT) AS h
  FROM (SELECT DISTINCT term FROM pos)),
wt AS (SELECT term, h / 4294967295.0 - 0.5 AS weight
       FROM vocab WHERE h % 2 = 0),
per AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         CAST(count(weight) AS BIGINT) AS n_hits,
         list_sort(list_filter(list(weight),
                               x -> x IS NOT NULL)) AS ws
  FROM pos LEFT JOIN wt USING (term) GROUP BY doc_id),
s AS (
  SELECT doc_id, n_words, n_hits,
         0.25 + list_reduce(list_prepend(0.0, ws), (a, b) -> a + b)
              / greatest(n_words, 1) AS z
  FROM per)
SELECT d.doc_id,
  coalesce(s.n_words, 0) AS n_words,
  coalesce(s.n_hits, 0) AS n_hits,
  coalesce(round(1.0 / (1.0 + exp(-s.z)), 6),
           round(1.0 / (1.0 + exp(-0.25)), 6)) AS score
FROM documents d LEFT JOIN s USING (doc_id)
"""


R9_QUERIES = {
    "quality_features": q_quality_features,
    "dup_ngram_frac": q_dup_ngram_frac,
    "simhash_pairs": q_simhash_pairs,
    "doc_chunks": q_doc_chunks,
    "stratified_sample": q_stratified_sample,
    "host_quality": q_host_quality,
    "dedup_keep": q_dedup_keep,
    "pack_sequences": q_pack_sequences,
    "vocab_ngrams": q_vocab_ngrams,
    "unigram_logprob": q_unigram_logprob,
    "tfidf_top_terms": q_tfidf_top_terms,
    "corpus_keep": q_corpus_keep,
    "dedup_spans": q_dedup_spans,
    "shard_assign": q_shard_assign,
    "semdedup_keep": q_semdedup_keep,
    "classifier_score": q_classifier_score,
}

R9_ORACLES = {
    "quality_features": ORACLE_QUALITY_FEATURES,
    "dup_ngram_frac": ORACLE_DUP_NGRAM_FRAC,
    "simhash_pairs": ORACLE_SIMHASH_PAIRS,
    "doc_chunks": ORACLE_DOC_CHUNKS,
    "stratified_sample": ORACLE_STRATIFIED_SAMPLE,
    "host_quality": ORACLE_HOST_QUALITY,
    "dedup_keep": ORACLE_DEDUP_KEEP,
    "pack_sequences": ORACLE_PACK_SEQUENCES,
    "vocab_ngrams": ORACLE_VOCAB_NGRAMS,
    "unigram_logprob": ORACLE_UNIGRAM_LOGPROB,
    "tfidf_top_terms": ORACLE_TFIDF_TOP_TERMS,
    "corpus_keep": ORACLE_CORPUS_KEEP,
    "dedup_spans": ORACLE_DEDUP_SPANS,
    "shard_assign": ORACLE_SHARD_ASSIGN,
    "semdedup_keep": ORACLE_SEMDEDUP_KEEP,
    "classifier_score": ORACLE_CLASSIFIER_SCORE,
}
