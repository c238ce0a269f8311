"""Deduplication operators (exact + near-dup) for the documents
table.

Scale design:
- exact: groupBy on a 128-bit content hash — one shuffle, map-side
  partial agg; winner = min(doc_id) (deterministic).
- minhash-LSH: shingle -> per-shingle md5 -> min per (doc, hashfn)
  -> band signature -> groupBy band bucket -> candidate pairs.  All
  built-in exprs; md5 keeps the DuckDB oracle value-identical.  The
  band groupBy is the only wide shuffle and its keys are uniformly
  distributed hashes (no skew by construction).
- simhash: 64-bit sign-aggregated token hashes; hamming buckets by
  16-bit chunk for candidate pruning.
- ngram-jaccard: verification joiner for candidate pairs.
"""

from pyspark.sql import DataFrame, functions as F

N_HASHES = 12      # minhash functions
N_BANDS = 4        # bands of 3 rows each
SHINGLE_W = 3      # words per shingle


def norm_words(col):
    return F.split(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "),
                   " ")


def word_ngram_arr(w, n):
    """Array of n-word shingles of a MATERIALIZED words-array column
    (space-joined), as O(len) zip_with over n shifted slices.

    Two traps this shape avoids (r4 soak finding — the old
    transform(sequence, i -> concat_ws(slice(words, i+1, n))) form
    was ~25x slower on crawl-sized docs):
    - never capture a COMPUTED array expression inside a lambda:
      interpreted higher-order functions re-evaluate it per element,
      turning norm_words' regexp+split quadratic per document.  `w`
      must be a plain column reference from a previous projection
      (multi-reference keeps CollapseProject from inlining it).
    - per-element F.slice of the captured array pays array access
      through the lambda env; zip_with walks the slices linearly.

    Docs with fewer than n words yield an empty array (callers add
    their own short-doc fallback)."""
    cnt = F.size(w)
    m = cnt - n + 1
    cur = F.slice(w, 1, m)
    for j in range(1, n):
        cur = F.zip_with(cur, F.slice(w, j + 1, m),
                         lambda a, b: F.concat(a, F.lit(" "), b))
    return F.when(cnt >= n, cur).otherwise(F.array())


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact dedup on normalized text hash; keeps min doc_id per
    group (hash-groupBy, single shuffle)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    h = F.md5(F.encode(norm, "utf-8"))
    return (docs.select("doc_id", h.alias("content_hash"))
            .groupBy("content_hash")
            .agg(F.min("doc_id").alias("keep_doc_id"),
                 F.count("*").alias("n_dups"))
            )


def shingles(docs: DataFrame, w=SHINGLE_W) -> DataFrame:
    """Word w-shingles per doc (deduplicated within doc).  The input
    is spread to full parallelism first — shingling + per-shingle
    hashing is the CPU-heavy stage of the dedup pipeline."""
    from .util import spread
    docs = spread(docs, "doc_id")
    wd = docs.select("doc_id", norm_words(F.col("text")).alias("w"))
    wcol = F.col("w")
    sh = F.when(F.size(wcol) >= w,
                F.array_distinct(word_ngram_arr(wcol, w))) \
        .otherwise(F.array(F.concat_ws(" ", wcol)))
    return wd.select("doc_id", F.explode(sh).alias("shingle"))


def minhash_signatures(docs: DataFrame, k=N_HASHES) -> DataFrame:
    """k minhash values per doc: min over shingles of
    md5(i || ':' || shingle) for i in 0..k-1 (lexicographic min of
    hex digests — portable to the SQL oracle).

    Computed per-row with array_min over a higher-order transform —
    no shingle explode, no groupBy, therefore ZERO shuffle: the whole
    signature stage is a narrow map over the documents scan.  (min
    over duplicate shingles equals min over distinct ones, so the
    within-doc dedup the exploded round-2 shape did is unnecessary
    here; shingles() keeps it for the Jaccard verifier, which counts
    set sizes.)  This also removes the round-2 allocation hot spot —
    the exploded shingle rows were the bench's GC-churn driver."""
    from .util import spread
    # NULL text: norm_words(NULL) -> NULL array, so the when() falls
    # to the otherwise branch and concat_ws over the NULL array
    # yields '' — one empty shingle, exactly what the round-2
    # explode+groupBy shape produced (verified: r2 emitted a
    # signature row h_i = md5('i:') for NULL and empty text alike).
    # No filter here — the row set must not change.
    docs = spread(docs, "doc_id")
    # words materialized in their OWN projection, shingles built with
    # the linear zip_with shape — see word_ngram_arr's trap notes
    # (r4: the captured-lambda form re-ran norm_words per shingle,
    # ~25x slower on crawl-sized docs)
    wd = docs.select("doc_id", norm_words(F.col("text")).alias("w"))
    wcol = F.col("w")
    sh = F.when(F.size(wcol) >= SHINGLE_W,
                word_ngram_arr(wcol, SHINGLE_W)) \
        .otherwise(F.array(F.concat_ws(" ", wcol)))
    # materialize the shingle array once; the k min-hash projections
    # below all read the same column (not k recomputations)
    based = wd.select("doc_id", sh.alias("sh"))
    mins = [F.array_min(F.transform(
        F.col("sh"),
        lambda s: F.md5(F.encode(F.concat(F.lit(str(i) + ":"), s),
                                 "utf-8")))).alias("h%d" % i)
        for i in range(k)]
    return based.select("doc_id", *mins)


MAX_LSH_BUCKET = 64   # distinct-signature reps kept per (band, key)


def _banded(sig: DataFrame, k, bands) -> DataFrame:
    """(doc_id, band, key) rows: one md5 band key per band over the
    signature columns."""
    r = k // bands
    band_cols = []
    for b in range(bands):
        cols = [F.col("h%d" % (b * r + j)) for j in range(r)]
        band_cols.append(F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat_ws("|", *cols)).alias("key")))
    return (sig.select("doc_id",
                       F.explode(F.array(*band_cols)).alias("bk"))
            .select("doc_id", "bk.band", "bk.key"))


def _sig_with_rep(docs: DataFrame, k):
    """Signatures + per-identical-signature representative (min
    doc_id over the full signature group), materialized ONCE so the
    star-edge and rep branches below don't each re-run the
    scan->shingle->minhash subtree (round-1 doubled-subtree bug
    class).  The window shuffle keys are content hashes — a crawl's
    boilerplate-identical cluster lands in ONE partition but streams
    through it as rows (O(m)), never as a collected array."""
    from pyspark.sql import Window
    sig = minhash_signatures(docs, k)
    hcols = ["h%d" % i for i in range(k)]
    w = Window.partitionBy(*hcols)
    return (sig.withColumn("rep", F.min("doc_id").over(w))
            .localCheckpoint(eager=True), hcols)


def minhash_lsh_pairs(docs: DataFrame, k=N_HASHES, bands=N_BANDS,
                      max_bucket=MAX_LSH_BUCKET) -> DataFrame:
    """Candidate near-dup pairs via banded LSH over the minhash
    signature (rows-per-band = k / bands), with the two skew guards a
    crawl-scale corpus needs (round-3 review: boilerplate-identical
    pages all share one (band, key), so an unguarded
    collect_list+combos bucket is the classic dedup OOM):

    1. identical-signature collapse: docs with byte-equal signatures
       are emitted as STAR EDGES (rep, member) — m-1 pairs instead of
       the m(m-1)/2 clique — and only the distinct-signature
       representatives enter the banding stage.  For connected-
       component dedup (dedup_components) the clustering is
       unchanged: the star reaches every member.
    2. bucket cap: a (band, key) bucket keeps at most `max_bucket`
       representatives (the smallest doc_ids, deterministic).  The
       cap is NOT silent — lsh_bucket_stats() reports the bucket
       histogram and exactly how many reps overflowed; near-dup-heavy
       corpora should consult it and verify recall via ngram_jaccard
       on a sample.

    Single corpus scan end-to-end: signatures are a narrow per-row
    map, the windowed rep frame is checkpointed once, and pair
    emission groups the banded reps without any self-join of the
    shingle subtree."""
    with_rep, hcols = _sig_with_rep(docs, k)
    star = (with_rep.filter(F.col("doc_id") != F.col("rep"))
            .select(F.col("rep").alias("doc_a"),
                    F.col("doc_id").alias("doc_b")))
    reps = (with_rep.filter(F.col("doc_id") == F.col("rep"))
            .select("doc_id", *hcols))
    banded = _banded(reps, k, bands)
    buckets = (banded.groupBy("band", "key")
               .agg(F.slice(F.sort_array(F.collect_list("doc_id")),
                            1, max_bucket).alias("ids"))
               .filter(F.size("ids") >= 2))
    combos = F.filter(
        F.flatten(F.transform(
            F.col("ids"),
            lambda a: F.transform(
                F.col("ids"),
                lambda b: F.struct(a.alias("doc_a"),
                                   b.alias("doc_b"))))),
        lambda p: p["doc_a"] < p["doc_b"])
    rep_pairs = (buckets.select(F.explode(combos).alias("p"))
                 .select("p.doc_a", "p.doc_b"))
    # r9 (guide §2.4): dedup only the banded pairs — a rep pair can
    # surface from several bands, but star edges are unique by
    # construction (one row per member) and disjoint from rep pairs
    # (a star's doc_b is never a representative, rep pairs' endpoints
    # both are), so the union needs no second distinct shuffle.
    # Same row set as distinct-over-union.
    return star.unionByName(rep_pairs.distinct())


def lsh_bucket_stats(docs: DataFrame, k=N_HASHES, bands=N_BANDS,
                     max_bucket=MAX_LSH_BUCKET) -> DataFrame:
    """Observability companion to minhash_lsh_pairs (the no-silent-
    caps rule): per-band bucket-size distribution over the
    DISTINCT-SIGNATURE representatives, plus how much the bucket cap
    would drop.  Columns:

      band, n_buckets, n_multi (size >= 2), max_bucket_size,
      n_overflow_buckets (size > max_bucket), n_dropped_reps (sum of
      size - max_bucket over overflowing buckets), n_star_members
      (docs collapsed into identical-signature stars before banding).
    All exact integers (no approximate percentiles — the driver gate
    hash-compares against DuckDB)."""
    with_rep, hcols = _sig_with_rep(docs, k)
    n_star = (with_rep.filter(F.col("doc_id") != F.col("rep"))
              .groupBy().agg(F.count("*").alias("n_star_members")))
    reps = (with_rep.filter(F.col("doc_id") == F.col("rep"))
            .select("doc_id", *hcols))
    sizes = (_banded(reps, k, bands)
             .groupBy("band", "key").agg(F.count("*").alias("sz")))
    over = F.when(F.col("sz") > max_bucket,
                  F.col("sz") - max_bucket).otherwise(F.lit(0))
    per_band = (sizes.groupBy("band").agg(
        F.count("*").alias("n_buckets"),
        F.sum((F.col("sz") >= 2).cast("long")).alias("n_multi"),
        F.max("sz").alias("max_bucket_size"),
        F.sum((F.col("sz") > max_bucket).cast("long"))
         .alias("n_overflow_buckets"),
        F.sum(over).alias("n_dropped_reps")))
    return (per_band.crossJoin(n_star)
            .select("band",
                    F.col("n_buckets").cast("bigint").alias("n_buckets"),
                    F.col("n_multi").cast("bigint").alias("n_multi"),
                    F.col("max_bucket_size").cast("bigint")
                     .alias("max_bucket_size"),
                    F.col("n_overflow_buckets").cast("bigint")
                     .alias("n_overflow_buckets"),
                    F.col("n_dropped_reps").cast("bigint")
                     .alias("n_dropped_reps"),
                    F.col("n_star_members").cast("bigint")
                     .alias("n_star_members")))


def ngram_jaccard(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact Jaccard over word-shingles for candidate pairs
    (verification stage after LSH).

    r9 (guide §3.2): only docs that appear in a candidate pair are
    shingled — a semi-join against the pair endpoints prefilters the
    corpus before the explode.  The shingle subtree is consumed three
    times below (both join sides + the size aggregation), so without
    the prefilter the FULL corpus exploded three times while the
    joins kept only candidate docs; result rows are identical because
    intersections and sizes are only ever read for pair endpoints.
    3.9 s -> 0.9 s on the 50k-doc probe."""
    ids = (pairs.select(F.col("doc_a").alias("doc_id"))
           .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
           .distinct())
    docs = docs.join(ids, "doc_id", "leftsemi")
    # materialize the (prefiltered) shingle rows once — they feed
    # both join sides AND the size aggregation; same lineage-cut
    # pattern as _sig_with_rep
    sh = shingles(docs).localCheckpoint(eager=True)
    a = sh.withColumnRenamed("doc_id", "doc_a")
    b = sh.withColumnRenamed("doc_id", "doc_b") \
          .withColumnRenamed("shingle", "shingle_b")
    inter = (pairs.join(a, "doc_a")
             .join(b.withColumnRenamed("shingle_b", "shingle"),
                   ["doc_b", "shingle"])
             .groupBy("doc_a", "doc_b")
             .agg(F.count("*").alias("n_inter")))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    return (inter
            .join(sizes.withColumnRenamed("doc_id", "doc_a")
                       .withColumnRenamed("n_sh", "n_a"), "doc_a")
            .join(sizes.withColumnRenamed("doc_id", "doc_b")
                       .withColumnRenamed("n_sh", "n_b"), "doc_b")
            .select("doc_a", "doc_b",
                    F.round(F.col("n_inter") /
                            (F.col("n_a") + F.col("n_b") -
                             F.col("n_inter")), 6).alias("jaccard")))


def simhash_fast(docs: DataFrame, bits=32) -> DataFrame:
    """SimHash over words: per-bit majority vote of word hashes.
    Uses xxhash64 (JVM-side) — the performance path for real
    clusters.  xxhash64 has no DuckDB twin, so the *registered*
    `simhash` query is simhash_md5 (identical construction, portable
    projection bits); this variant is planted-truth pytest'd
    (tests/test_spark_ops.py) instead."""
    from .util import spread
    docs = spread(docs, "doc_id")
    words = F.explode(norm_words(F.col("text")))
    wh = docs.select("doc_id", words.alias("w")) \
             .select("doc_id", F.xxhash64("w").alias("h"))
    bit_sums = [
        F.sum(F.when(F.shiftright(F.col("h"), i).bitwiseAND(1) == 1,
                     1).otherwise(-1)).alias("b%d" % i)
        for i in range(bits)]
    agg = wh.groupBy("doc_id").agg(*bit_sums)
    sig = None
    for i in range(bits):
        bit = F.when(F.col("b%d" % i) > 0,
                     F.lit(2 ** i)).otherwise(F.lit(0))
        sig = bit if sig is None else (sig + bit)
    return agg.select("doc_id", sig.cast("long").alias("simhash"))


_HEX_HIGH = ("8", "9", "a", "b", "c", "d", "e", "f")


def simhash_md5(docs: DataFrame, bits=32) -> DataFrame:
    """SimHash with md5-derived projection bits (bit i = high bit of
    hex digit i of md5(word)) — engine-portable, so the DuckDB oracle
    verifies it exactly; same per-bit majority-vote construction as
    simhash().

    r9 (guide §1.2 per-task work): the per-word bit tests used to be
    32 x (substring(hex, i, 1) IN eight 1-char strings) — 32 string
    allocations + 256 comparisons per word.  Now each 8-hex-digit
    chunk is parsed ONCE with conv() into a long and every bit test
    is a shift-and-mask (bit i = bit 4*(7-d)+3 of chunk i//8, d =
    i%8, because hex digit d of the chunk is its (7-d)-th nibble).
    The +-1 vote sum becomes the equivalent integer test
    2*count(high) > count(*).  Identical signatures (same md5, same
    bits, exact integer arithmetic); 1.16 s -> 0.69 s on the
    50k-doc probe."""
    from .util import spread
    docs = spread(docs, "doc_id")
    words = F.explode(norm_words(F.col("text")))
    wh = (docs.select("doc_id", words.alias("w"))
          .select("doc_id", F.md5(F.encode("w", "utf-8")).alias("h")))
    n_chunks = (bits + 7) // 8
    chunks = wh.select("doc_id", *[
        F.conv(F.substring("h", 1 + 8 * j, 8), 16, 10).cast("long")
        .alias("c%d" % j) for j in range(n_chunks)])
    sums = []
    for i in range(bits):
        j, d = divmod(i, 8)
        sums.append(F.sum(F.shiftright(F.col("c%d" % j),
                                       4 * (7 - d) + 3)
                          .bitwiseAND(1)).alias("s%d" % i))
    agg = chunks.groupBy("doc_id").agg(*sums,
                                       F.count("*").alias("n"))
    sig = None
    for i in range(bits):
        bit = F.when(F.col("s%d" % i) * 2 > F.col("n"),
                     F.lit(2 ** i)).otherwise(F.lit(0))
        sig = bit if sig is None else (sig + bit)
    return agg.select("doc_id", sig.cast("long").alias("simhash"))


def simhash_pairs(docs: DataFrame, bands=4, hd_max=3,
                  max_bucket=MAX_LSH_BUCKET) -> DataFrame:
    """Near-dup pairs via banded Hamming search over the 32-bit
    simhash (simhash_md5, so the DuckDB oracle is value-identical):
    (doc_a, doc_b, hamming) with doc_a < doc_b and hamming <= hd_max.

    Banding is the classic Hamming pigeonhole: with `bands` equal
    bit-chunks, any pair within hd_max <= bands - 1 differing bits
    agrees on at least one whole chunk, so bucketing reps by each
    8-bit chunk value and verifying bit_count(xor) inside buckets is
    EXACT for hd_max <= 3 (no probabilistic recall like minhash LSH).

    Same two skew guards as minhash_lsh_pairs (a boilerplate-heavy
    crawl makes both mandatory):
    1. identical-simhash collapse: byte-equal signatures emit star
       edges (rep, member, hamming=0) — m-1 rows, not the clique —
       and only distinct-signature reps are banded.  Members inherit
       their rep's neighbourhood transitively (dedup_components
       clustering is unchanged).
    2. deterministic bucket cap: a (band, key) bucket keeps the
       `max_bucket` smallest rep doc_ids.  8-bit chunks give only
       256 buckets per band, so at corpus scale every bucket is hot
       and the cap WILL drop candidates — widen the chunk (bands=2
       of 16 bits still guarantees hd_max=1; or grow the signature)
       or raise max_bucket when pair recall matters more than cost.

    One corpus scan: the signature+rep frame is checkpointed once
    (same shape as _sig_with_rep); pairs are emitted from grouped
    buckets with no self-join of the token subtree."""
    from pyspark.sql import Window
    sig = simhash_md5(docs)
    w = Window.partitionBy("simhash")
    with_rep = (sig.withColumn("rep", F.min("doc_id").over(w))
                .localCheckpoint(eager=True))
    star = (with_rep.filter(F.col("doc_id") != F.col("rep"))
            .select(F.col("rep").alias("doc_a"),
                    F.col("doc_id").alias("doc_b"),
                    F.lit(0).cast("int").alias("hamming")))
    reps = (with_rep.filter(F.col("doc_id") == F.col("rep"))
            .select("doc_id", "simhash"))
    width = 32 // bands
    mask = (1 << width) - 1
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col("simhash"), b * width)
             .bitwiseAND(F.lit(mask)).alias("key"))
        for b in range(bands)]
    banded = (reps.select("doc_id", "simhash",
                          F.explode(F.array(*band_cols)).alias("bk"))
              .select("doc_id", "simhash", "bk.band", "bk.key"))
    buckets = (banded.groupBy("band", "key")
               .agg(F.slice(F.sort_array(F.collect_list(
                        F.struct("doc_id", "simhash"))),
                    1, max_bucket).alias("ids"))
               .filter(F.size("ids") >= 2))
    combos = F.filter(
        F.flatten(F.transform(
            F.col("ids"),
            lambda a: F.transform(
                F.col("ids"),
                lambda b: F.struct(
                    a["doc_id"].alias("doc_a"),
                    b["doc_id"].alias("doc_b"),
                    F.bit_count(a["simhash"].bitwiseXOR(b["simhash"]))
                     .cast("int").alias("hamming"))))),
        lambda p: p["doc_a"] < p["doc_b"])
    rep_pairs = (buckets.select(F.explode(combos).alias("p"))
                 .select("p.doc_a", "p.doc_b", "p.hamming")
                 .filter(F.col("hamming") <= hd_max))
    return star.unionByName(rep_pairs).distinct()


def dedup_components(pairs: DataFrame, max_iterations=12) -> DataFrame:
    """Connected components over near-dup candidate pairs:
    (doc_id, component) where component = min doc_id reachable (the
    canonical representative to keep).

    Iterative min-label propagation: each round every node adopts the
    min label among itself and its neighbours; converges in O(graph
    diameter) rounds (near-dup clusters are tiny, so a fixed bound is
    safe; at extreme scale swap in the alternating large-star/
    small-star variant — same join shapes)."""
    fwd = pairs.select(F.col("doc_a").alias("src"),
                       F.col("doc_b").alias("dst"))
    edges = fwd.union(fwd.select(F.col("dst").alias("src"),
                                 F.col("src").alias("dst"))).distinct()
    # edges is re-read every propagation round — materialize it once
    # instead of re-running the upstream candidate pipeline per round
    edges = edges.localCheckpoint(eager=True)
    labels = (edges.select("src").distinct()
              .select(F.col("src").alias("node"),
                      F.col("src").alias("label")))
    for _ in range(max_iterations):
        neigh = (edges.join(labels,
                            edges.dst == labels.node)
                 .groupBy("src")
                 .agg(F.min("label").alias("nlabel")))
        new_labels = (labels.join(neigh,
                                  labels.node == neigh.src, "left")
                      .select("node",
                              F.least("label",
                                      F.coalesce("nlabel", "label"))
                              .alias("label")))
        # cut lineage each round: iterative algorithms otherwise
        # re-execute the whole chain on every action (checkpointing
        # is the standard CC-on-Spark pattern)
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "node")
                   .filter(F.col("n.label") != F.col("o.label"))
                   .take(1))
        labels = new_labels
        if not changed:
            break
    return labels.select(F.col("node").alias("doc_id"),
                         F.col("label").alias("component"))


def dedup_keep(docs: DataFrame) -> DataFrame:
    """Materialized dedup decision for the whole corpus — the row a
    training-data run actually writes: every doc mapped to its
    near-dup cluster representative with a keep bit.

    Composes the MinHash-LSH candidate pipeline (banded signatures,
    star-collapse, bucket cap) with min-label connected components,
    then joins the component map back onto the doc base:
      component    = min doc_id reachable (self for singletons)
      cluster_size = docs in the cluster (1 for singletons)
      keep         = 1 iff this doc IS the representative — exactly
                     one keep per cluster, all singletons kept.

    Scale shape: the component map holds only docs that appear in a
    candidate pair, so the final join is corpus x (dup subset).  The
    join is left UNHINTED: on lightly-duplicated corpora AQE will
    broadcast the map from its observed shuffle size, while on
    heavily-duplicated crawls (30-50% dup rate is normal) the map is
    a large fraction of the corpus and a forced broadcast() would
    OOM the executors — a sort-merge/shuffled-hash join on doc_id is
    the correct plan there, and AQE picks per-run.  cluster_size is
    one extra tiny-side groupBy on the map, never on the corpus.

    NULL-text docs (failed extractions — real crawl shape) form ONE
    cluster of their own, NEVER mixed with empty-string docs: their
    shingle evidence is identical-and-absent, so the SQL pipeline
    star-collapses them on the shared NULL signature while keeping
    ''-shingle docs a separate cluster.  Spark's minhash instead
    folds NULL to the same signature as the EMPTY doc, silently
    merging the two classes (caught by the r8 session-4 review
    differential; a first fix made NULLs singletons, which the
    multi-NULL differential then caught diverging the other way).
    They are filtered out of the minhash input and re-attached as
    explicit min-doc_id star edges — the same shape the oracle's
    identical-signature collapse produces, bounded at any NULL
    count."""
    nonnull = docs.filter(F.col("text").isNotNull())
    nulls = docs.filter(F.col("text").isNull()).select("doc_id")
    null_star = (nulls.crossJoin(
        nulls.agg(F.min("doc_id").alias("rep")))
        .filter(F.col("doc_id") != F.col("rep"))
        .select(F.col("rep").alias("doc_a"),
                F.col("doc_id").alias("doc_b")))
    pairs = (minhash_lsh_pairs(nonnull).select("doc_a", "doc_b")
             .unionByName(null_star))
    comp = dedup_components(pairs)
    sizes = comp.groupBy("component").agg(
        F.count("*").alias("csize"))
    comp = comp.join(sizes, "component")
    base = docs.select("doc_id")
    j = base.join(comp, "doc_id", "left")
    rep = F.coalesce(F.col("component"), F.col("doc_id"))
    return j.select(
        "doc_id",
        rep.cast("bigint").alias("component"),
        F.coalesce(F.col("csize"), F.lit(1)).cast("bigint")
         .alias("cluster_size"),
        (rep == F.col("doc_id")).cast("int").alias("keep"))
