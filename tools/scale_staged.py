"""Scale probe for the round-9 staged training-pipeline operators.

Corpus: n_docs synthetic documents with the two pathologies the sf
gates cannot exhibit — a Zipfian host distribution (60% of docs on
one host) and a 30% byte-identical boilerplate fraction — plus a
Zipfian word distribution so vocab/logprob shapes see realistic hot
keys.  Everything derives deterministically from doc_id.

Per operator: wall-clock + the invariant the small gates prove
semantically, re-checked at scale:
  doc_chunks        — chunk count == ceil(words/size) corpus-wide;
                      glued token count == source token count
  stratified_sample — every stratum emits min(k, n) rows, hot host
                      included
  host_quality      — n_docs sums to corpus, hot host dominates
  pack_sequences    — per-source final offset+tokens == total tokens
  vocab_ngrams      — top gram is the planted boilerplate bigram
  unigram_logprob   — boilerplate docs score strictly below unique
                      docs on average
  dedup_keep        — keeps == docs - (dup-cluster members beyond
                      their representative); the 30% boilerplate
                      collapses to ONE representative via the LSH
                      star path (no O(cluster^2) blowup)
  dedup_spans       — boilerplate docs are cut to NOTHING (every
                      8-gram cross-doc duplicated); n_words
                      conserves the corpus token count exactly
  shard_assign      — every doc assigned once, shard sizes uniform
                      (md5 bucketing: no skew by construction),
                      ranks contiguous 1..shard_size
  semdedup_keep     — a 30% identical-embedding mega-group (the
                      failed-extraction vector shape) collapses via
                      the exact-dup star path, never O(group^2)
                      cosine pairs

Prints one JSON line.  Usage:
    python tools/scale_staged.py [n_docs] [cpus] [--skip-dedup]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _mk_docs(spark, n_docs):
    """Deterministic skewed corpus: (doc_id, source, text)."""
    from pyspark.sql import functions as F
    base = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    d = F.col("doc_id")
    # Zipfian host: 60% on host0, rest spread over 200 hosts
    src = F.when(d % 10 < 6, F.lit("host0")).otherwise(
        F.concat(F.lit("host"), ((d * 2654435761) % 200 + 1)
                 .cast("string")))
    # 30% boilerplate (identical body), else unique-ish Zipf words
    n_words = (d % 180 + 40).cast("int")
    words = F.transform(
        F.sequence(F.lit(0), n_words - 1),
        lambda i: F.concat(
            F.lit("w"),
            (F.when((i + d) % 3 == 0,
                    ((d * 31 + i * 7) % 50))
              .otherwise((d * 131 + i * 1009) % 20000))
            .cast("string")))
    boiler = F.lit(" ".join("bp%d bq%d" % (i % 9, i % 7)
                            for i in range(60)))
    text = F.when(d % 10 < 3, boiler) \
            .otherwise(F.concat_ws(" ", words))
    return base.select("doc_id", src.alias("source"),
                       text.alias("text"))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_docs = int(args[0]) if len(args) > 0 else 200_000
    cpus = int(args[1]) if len(args) > 1 else 32
    skip_dedup = "--skip-dedup" in sys.argv
    from pyspark.sql import functions as F

    from packages_sgml_spark.spark.session import get_spark
    from packages_sgml_spark.spark.datafilters import (
        dedup_spans, shard_assign, stratified_sample,
        unigram_logprob)
    from packages_sgml_spark.spark.dedup import dedup_keep
    from packages_sgml_spark.spark.similarity import semdedup_keep
    from packages_sgml_spark.spark.textops import (
        doc_chunks, host_quality, pack_sequences, vocab_ngrams)

    spark = get_spark(app="scale-staged", cpus=cpus)
    docs = _mk_docs(spark, n_docs).localCheckpoint(eager=True)
    mb = docs.select(F.sum(F.length("text"))).collect()[0][0] / 1e6
    out = {"n_docs": n_docs, "cpus": cpus, "mb": round(mb, 1)}

    def timed(name, fn):
        t0 = time.time()
        r = fn()
        out[name + "_sec"] = round(time.time() - t0, 2)
        return r

    # doc_chunks: conservation of tokens + chunk count
    agg = timed("doc_chunks", lambda: doc_chunks(docs, 512).agg(
        F.count("*"), F.sum("n_tokens")).collect())[0]
    want = docs.select(
        F.sum(F.when(F.length(F.trim("text")) == 0, 0)
              .otherwise(F.size(F.split(F.trim("text"), r"\s+")))),
        F.sum(F.ceil(
            F.when(F.length(F.trim("text")) == 0, 0)
            .otherwise(F.size(F.split(F.trim("text"), r"\s+")))
            / 512.0))).collect()[0]
    assert agg[1] == want[0], (agg, want)
    assert agg[0] == want[1], (agg, want)
    out["doc_chunks_rows"] = agg[0]

    # stratified_sample: exact quota per stratum
    samp = timed("stratified_sample",
                 lambda: stratified_sample(docs, k=1000)
                 .groupBy("source").count().collect())
    hosts = {r["source"]: r["count"] for r in
             docs.groupBy("source").count().collect()}
    for r in samp:
        assert r["count"] == min(1000, hosts[r["source"]]), r
    assert len(samp) == len(hosts)
    out["n_strata"] = len(samp)

    # host_quality: doc conservation + hot host dominance
    hq = timed("host_quality",
               lambda: host_quality(docs).collect())
    assert sum(r["n_docs"] for r in hq) == n_docs
    top = max(hq, key=lambda r: r["n_docs"])
    assert top["source"] == "host0" and top["n_docs"] >= 0.55 * n_docs

    # pack_sequences: final offset + final tokens == stream length
    # (timed INCLUDING the verification aggregate — the operator is
    # lazy, so timing the constructor alone would measure nothing)
    packed = pack_sequences(docs, budget=2048)
    last = timed("pack_sequences", lambda: (packed.withColumn(
        "end", F.col("seq_id") * 2048 + F.col("seq_offset") +
        F.col("n_tokens"))
        .groupBy("source")
        .agg(F.max("end").alias("end"), F.sum("n_tokens").alias("t"))
        .collect()))
    for r in last:
        assert r["end"] == r["t"], r

    # vocab_ngrams: the planted boilerplate bigram dominates
    vg = timed("vocab_ngrams",
               lambda: vocab_ngrams(docs, n=2, top_k=20).collect())
    assert vg[0]["gram"].startswith("bp"), vg[0]
    assert vg[0]["n_docs"] >= 0.29 * n_docs

    # unigram_logprob: boilerplate scores below unique soup
    # (same laziness note: the timed closure runs the comparison)
    lp = unigram_logprob(docs)
    cmpr = timed("unigram_logprob", lambda: (
        lp.join(docs.select("doc_id",
                            (F.col("doc_id") % 10 < 3)
                            .alias("is_bp")), "doc_id")
        .groupBy("is_bp").agg(F.avg("mean_nll").alias("m"))
        .collect()))
    m = {r["is_bp"]: r["m"] for r in cmpr}
    assert m[True] < m[False], m

    # dedup_spans: boilerplate cut to nothing, token conservation.
    # NOTE: this corpus's "unique" stream is a sliding-window family
    # (word(i, d) depends only on (131d + 1009i) % 20000, (d+i) % 3,
    # (31d + 7i) % 50 — so every doc is a shifted substring of its
    # mod-60000 twin), which makes EVERY position cross-doc
    # duplicated: kept_frac 0.0 is the corpus's truth and the probe
    # exercises the operator's 100%-dup worst case (cov = the whole
    # corpus), the heaviest tagging load the plan can see.
    ds = timed("dedup_spans", lambda: dedup_spans(docs)
               .join(docs.select("doc_id",
                                 (F.col("doc_id") % 10 < 3)
                                 .alias("is_bp")), "doc_id")
               .groupBy("is_bp")
               .agg(F.sum("n_words").alias("nw"),
                    F.sum("n_kept").alias("nk"),
                    F.max("n_kept").alias("mx")).collect())
    dsm = {r["is_bp"]: r for r in ds}
    assert dsm[True]["nk"] == 0 and dsm[True]["mx"] == 0, dsm
    assert dsm[True]["nw"] + dsm[False]["nw"] == want[0], (dsm, want)
    out["dedup_spans_kept_frac"] = round(
        dsm[False]["nk"] / dsm[False]["nw"], 4)

    # shard_assign: exactly-once, uniform shards, contiguous ranks
    sa = timed("shard_assign", lambda: shard_assign(docs, 64)
               .groupBy("shard")
               .agg(F.count("*").alias("n"),
                    F.max("shard_pos").alias("mx")).collect())
    assert sum(r["n"] for r in sa) == n_docs
    assert all(r["mx"] == r["n"] for r in sa)
    szs = sorted(r["n"] for r in sa)
    # spread asserts only when shards are statistically full: at
    # tiny n_docs some of the 64 md5 buckets are legitimately empty
    # and a fixed count/ratio misfires (session-5 review catch)
    if n_docs >= 64 * 100:
        assert len(sa) == 64
        # binomial bound, scale-aware: within ~8 sigma of the mean
        assert szs[-1] - szs[0] < 8 * (n_docs / 64) ** 0.5, (
            szs[0], szs[-1])
        out["shard_skew"] = round(szs[-1] / szs[0], 4)

    # semdedup_keep: identical-embedding mega-group stars, never
    # O(group^2) cosine (probed on its own vec count: the cosine leg
    # over random-ish vectors is the documented sum-of-bucket^2)
    n_vecs = min(n_docs, 20_000)
    vbase = spark.range(n_vecs).withColumnRenamed("id", "vec_id")
    v = F.col("vec_id")
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: F.when(v % 10 < 3, (i % 7).cast("double"))
                   .otherwise(((v * 131 + i * 1009) % 997)
                              .cast("double") - 498.0))
    emb = vbase.select("vec_id", vec.alias("embedding")) \
        .localCheckpoint(eager=True)
    sk = timed("semdedup_keep", lambda: semdedup_keep(
        emb, threshold=0.95).agg(
        F.count("*"), F.sum("keep"),
        F.max("cluster_size")).collect())[0]
    n_bpv = sum(1 for i in range(n_vecs) if i % 10 < 3)
    assert sk[0] == n_vecs
    assert sk[2] >= n_bpv, sk
    assert sk[1] <= n_vecs - n_bpv + 1, sk
    out["semdedup_vecs"] = n_vecs
    out["semdedup_kept"] = sk[1]
    out["semdedup_max_cluster"] = sk[2]

    # dedup_keep: the 30% boilerplate collapses to one representative
    if not skip_dedup:
        dk = timed("dedup_keep", lambda: dedup_keep(docs).agg(
            F.count("*"), F.sum("keep"),
            F.max("cluster_size")).collect())[0]
        assert dk[0] == n_docs
        n_bp = sum(1 for i in range(n_docs) if i % 10 < 3)
        assert dk[2] >= n_bp, dk            # the mega-cluster formed
        assert dk[1] <= n_docs - n_bp + 1, dk   # and kept once
        out["dedup_keep_kept"] = dk[1]
        out["dedup_max_cluster"] = dk[2]

    print(json.dumps(out))
    spark.stop()


def scaling():
    """North-rule evidence for the staged operator surface: the same
    op chain on the SAME input at two parallelism levels, reporting
    throughput at both plus scaling efficiency
    (= throughput ratio / core ratio).  Corpus generation is
    checkpointed before the clock starts; dedup_keep is excluded
    (its CC-iteration fixed cost is a latency floor, not a
    throughput term — measured separately by the main probe).

    Methodology matches bench.py --scaling: local[2] -> local[8]
    stays within this box's ~16 physical cores so the number
    reflects code scaling, not the SMT ceiling (a first cut at
    8 -> 32 measured 0.43 — decomposed, that was one part hot-host
    window serialization and three parts SMT: raw CPU itself does
    not scale 4x past the physical cores); levels interleave twice
    and keep the best of each (co-tenant noise), and the box's raw
    CPU ceiling is measured alongside for honest accounting."""
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_docs = int(args[0]) if args else 400_000
    levels = (2, 8)
    from pyspark.sql import functions as F

    from packages_sgml_spark.spark.session import get_spark
    from packages_sgml_spark.spark.datafilters import (
        stratified_sample, unigram_logprob)
    from packages_sgml_spark.spark.textops import (
        doc_chunks, host_quality, pack_sequences, tfidf_top_terms,
        vocab_ngrams)

    out = {"n_docs": n_docs, "levels": {}}
    for cpus in levels + levels:
        spark = get_spark(app="scale-staged-%d" % cpus, cpus=cpus)
        docs = _mk_docs(spark, n_docs).localCheckpoint(eager=True)
        mb = docs.select(F.sum(F.length("text"))).collect()[0][0] / 1e6
        ops = [
            ("doc_chunks", lambda: doc_chunks(docs, 512)
             .agg(F.sum("n_tokens")).collect()),
            ("stratified_sample",
             lambda: stratified_sample(docs, k=1000).count()),
            ("host_quality", lambda: host_quality(docs).count()),
            ("pack_sequences", lambda: pack_sequences(docs, 2048)
             .agg(F.max("seq_id")).collect()),
            ("vocab_ngrams", lambda: vocab_ngrams(docs, 2, 50).count()),
            ("unigram_logprob", lambda: unigram_logprob(docs)
             .agg(F.sum("mean_nll")).collect()),
            ("tfidf_top_terms",
             lambda: tfidf_top_terms(docs, 5).count()),
        ]
        per_op, wall = {}, 0.0
        for name, fn in ops:
            t0 = time.time()
            fn()
            dt = time.time() - t0
            per_op[name] = round(dt, 2)
            wall += dt
        rec = {"wall_sec": round(wall, 2),
               "mb_per_sec": round(mb / wall, 1),
               "per_op_sec": per_op}
        k = str(cpus)
        if k not in out["levels"] or \
                rec["mb_per_sec"] > out["levels"][k]["mb_per_sec"]:
            out["levels"][k] = rec
        out["mb"] = round(mb, 1)
        spark.stop()
    import bench
    bench.finish_scaling(out, levels)
    print(json.dumps(out))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
