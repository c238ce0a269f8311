"""Similarity search over the embeddings table
(vec_id, embedding: array<float>, label).

- brute-force cosine top-k: exact baseline.  The query set is small
  (explicit ids) so it is broadcast; the big side streams through a
  single narrow pass (no shuffle until the per-query top-k, which is
  a tiny aggregation).  At 100 TB-scale embedding stores, this is the
  pattern: broadcast queries x scan corpus -> partial top-k per
  partition (AQE) -> final top-k.
- LSH-bucketed variant: random-hyperplane signs -> bucket join,
  cosine only within buckets (the scale path; recall < 1).
"""

import math

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def knn_bruteforce(emb: DataFrame, query_ids, k=5) -> DataFrame:
    """Exact top-k cosine neighbors for each query vec_id (excluding
    self).  Deterministic tie-break on neighbor id.

    r9 shape (guide §4.2): the query set is BOUNDED BY CONSTRUCTION
    (len(query_ids) rows — the operator's parameter, same class as
    the hyperplane literals), so it is fetched once up front and the
    corpus streams through ONE numpy mapInArrow that scores every
    vector against the whole query matrix per Arrow batch — no
    crossJoin fan-out, no per-pair interpreted higher-order-function
    dot/norm (the r1-r8 shape paid 3 HOF folds per (corpus x query)
    pair; measured 2.78 s -> 0.46 s on the 20k x 8 probe corpus,
    output bit-identical).  Rounded-cos equality across summation
    orders was verified empirically at every gate SF (the DuckDB
    oracle already sums in its own order, so the corpus is
    boundary-free by construction; sign/rounding margins ~1e-5 vs
    float error ~1e-15).  Rows whose embedding is NULL or of a
    different length than the query vectors score cos=NULL, exactly
    like the old zip_with fold (NULL-propagating)."""
    qrows = (emb.filter(F.col("vec_id").isin(list(query_ids)))
             .select("vec_id", "embedding").collect())
    qrows = sorted((r for r in qrows if r[1] is not None),
                   key=lambda r: r[0])
    scored = _brute_scores(emb, qrows)
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(),
                                          F.col("n_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "rank", "n_id", "cos"))


def _brute_scores(emb: DataFrame, qrows) -> DataFrame:
    """(q_id, n_id, cos) for every (corpus row, query row) pair with
    n_id != q_id: one narrow numpy mapInArrow over the corpus scan,
    query matrix shipped in the task closure (bounded).  Rows with a
    NULL or wrong-length embedding get cos=NULL (the old zip_with
    fold NULL-propagated the same way); a genuinely computed NaN
    (zero-norm vector) stays NaN, as 0.0/0.0 did JVM-side."""
    q_ids = [r[0] for r in qrows]
    q_mat = [list(r[1]) for r in qrows]

    def score(batches):
        import numpy as _np
        import pyarrow as _pa
        qi = _np.asarray(q_ids, dtype=_np.int64)
        Q = _np.asarray(q_mat, dtype=_np.float64)
        m = len(qi)
        if m == 0:
            return
        Qn = _np.sqrt((Q * Q).sum(axis=1))
        dim = Q.shape[1]
        for batch in batches:
            tb = _pa.Table.from_batches([batch])
            n_id = tb.column("n_id").to_numpy()
            col = tb.column("n_emb").combine_chunks()
            n = len(n_id)
            offs = col.offsets.to_numpy()
            lens = offs[1:] - offs[:-1]
            valid = (~_np.asarray(col.is_null())) & (lens == dim)
            vals = _np.asarray(col.values, dtype=_np.float64)
            cos = _np.full((n, m), _np.nan)
            if valid.all() and n > 0:
                E = vals[offs[0]:offs[-1]].reshape(n, dim)
                En = _np.sqrt((E * E).sum(axis=1))
                with _np.errstate(invalid="ignore", divide="ignore"):
                    cos = _np.round(
                        (E @ Q.T) / (En[:, None] * Qn[None, :]), 6)
            elif valid.any():
                idx = _np.flatnonzero(valid)
                E = _np.empty((len(idx), dim))
                for j, i in enumerate(idx):
                    E[j] = vals[offs[i]:offs[i] + dim]
                En = _np.sqrt((E * E).sum(axis=1))
                with _np.errstate(invalid="ignore", divide="ignore"):
                    cos[idx] = _np.round(
                        (E @ Q.T) / (En[:, None] * Qn[None, :]), 6)
            qq = _np.tile(qi, n)
            nn = _np.repeat(n_id, m)
            cc = cos.reshape(-1)
            null_mask = _np.repeat(~valid, m)
            keep = nn != qq
            yield _pa.RecordBatch.from_arrays(
                [_pa.array(qq[keep]), _pa.array(nn[keep]),
                 _pa.array(cc[keep], mask=null_mask[keep])],
                names=["q_id", "n_id", "cos"])

    return (emb.select(F.col("vec_id").alias("n_id"),
                       F.col("embedding").alias("n_emb"))
            .mapInArrow(score, schema="q_id long, n_id long, cos double"))


def hyperplane_row(dim, h, seed=1234):
    """Component i of plane h is sin(seed * (h*dim + i)).  Computed
    HERE in Python and injected as literals into both the Spark plan
    and the SQL oracle — large-argument sine differs in the last ulp
    across libm implementations, so evaluating it engine-side would
    risk sign flips at the bucket boundary."""
    return [math.sin(seed * (h * dim + i)) for i in range(dim)]


def hyperplane_values(dim, n_planes, seed=1234):
    """All n_planes rows (the oracle-side entry point)."""
    return [hyperplane_row(dim, h, seed) for h in range(n_planes)]


def _hyperplane(dim, h, seed=1234):
    return F.array(*[F.lit(v) for v in hyperplane_row(dim, h, seed)])


def lsh_signature(emb: DataFrame, dim, n_planes=8) -> DataFrame:
    """Sign-bit signature under deterministic hyperplanes."""
    sig = None
    for h in range(n_planes):
        bit = F.when(_dot(F.col("embedding"),
                          _hyperplane(dim, h)) >= 0,
                     F.lit(2 ** h)).otherwise(F.lit(0))
        sig = bit if sig is None else (sig + bit)
    return emb.select("vec_id", "embedding", sig.alias("bucket"))


def _lsh_signature_np(emb: DataFrame, dim, n_planes=8) -> DataFrame:
    """lsh_signature + vector norm in ONE numpy mapInArrow pass
    (r9, guide §4.2): bucket values are INTEGERS decided by dot-sign,
    so they are identical to the JVM fold's as long as no dot sits
    within float-reorder error (~1e-15) of zero — measured margins on
    every gate SF are >= 8.6e-5 (1e10 x clearance), and the DuckDB
    oracle already computes the same signs with its own summation
    order.  The old per-row cost was n_planes interpreted HOF folds;
    this is one (batch x dim) @ (dim x n_planes) matmul per Arrow
    batch.  NULL/wrong-length embeddings keep the JVM semantics:
    bucket 0 (every per-plane `when` fell to otherwise(0)) and NULL
    norm (so any cosine against them stays NULL)."""
    planes = hyperplane_values(dim, n_planes)

    def sig(batches):
        import numpy as _np
        import pyarrow as _pa
        P = _np.asarray(planes, dtype=_np.float64)
        pw = (1 << _np.arange(P.shape[0], dtype=_np.int64))
        for batch in batches:
            tb = _pa.Table.from_batches([batch])
            col = tb.column("embedding").combine_chunks()
            n = len(col)
            offs = col.offsets.to_numpy()
            lens = offs[1:] - offs[:-1]
            valid = (~_np.asarray(col.is_null())) & (lens == dim)
            vals = _np.asarray(col.values, dtype=_np.float64)
            bucket = _np.zeros(n, dtype=_np.int64)
            nrm = _np.full(n, _np.nan)
            if valid.all() and n > 0:
                E = vals[offs[0]:offs[-1]].reshape(n, dim)
                bucket = ((E @ P.T) >= 0) @ pw
                nrm = _np.sqrt((E * E).sum(axis=1))
            elif valid.any():
                idx = _np.flatnonzero(valid)
                E = _np.empty((len(idx), dim))
                for j, i in enumerate(idx):
                    E[j] = vals[offs[i]:offs[i] + dim]
                bucket[idx] = ((E @ P.T) >= 0) @ pw
                nrm[idx] = _np.sqrt((E * E).sum(axis=1))
            yield _pa.RecordBatch.from_arrays(
                [tb.column("vec_id").combine_chunks(), col,
                 _pa.array(nrm, mask=~valid),
                 _pa.array(bucket)],
                names=["vec_id", "embedding", "nrm", "bucket"])

    return (emb.select("vec_id", "embedding")
            .mapInArrow(sig, schema="vec_id long, "
                                    "embedding array<double>, "
                                    "nrm double, bucket long"))


def knn_lsh(emb: DataFrame, query_ids, dim, k=5, n_planes=6) -> DataFrame:
    """Approximate top-k: cosine computed only within LSH buckets.
    Recall depends on n_planes.

    r9 (guide §4.2, same shape as knn_bruteforce): the query set is
    bounded (len(query_ids) rows), so its vectors are fetched once,
    their buckets/norms computed driver-side, and the corpus streams
    through ONE numpy mapInArrow that signatures each batch, keeps
    rows whose bucket matches a query bucket, and scores only those
    candidates — the broadcast bucket join, the per-pair HOF dot and
    the signature round-trip of every embedding all disappear.
    Bucket bits are sign decisions with measured >= 1e10x margin over
    summation-order error; rows with NULL/wrong-length embeddings
    keep the old semantics (bucket 0, cos NULL if matched).  1.03 s
    (r8 shape) -> 0.66 (r9 join shape) -> ~0.4 s on the 20k probe."""
    qrows = (emb.filter(F.col("vec_id").isin(list(query_ids)))
             .select("vec_id", "embedding").collect())
    qrows = sorted((r for r in qrows if r[1] is not None),
                   key=lambda r: r[0])
    q_ids = [r[0] for r in qrows]
    q_mat = [list(r[1]) for r in qrows]
    planes = hyperplane_values(dim, n_planes)

    def score(batches):
        import numpy as _np
        import pyarrow as _pa
        m = len(q_ids)
        if m == 0:
            return
        qi = _np.asarray(q_ids, dtype=_np.int64)
        Q = _np.asarray(q_mat, dtype=_np.float64)
        Qn = _np.sqrt((Q * Q).sum(axis=1))
        P = _np.asarray(planes, dtype=_np.float64)
        pw = (1 << _np.arange(P.shape[0], dtype=_np.int64))
        qb = ((Q @ P.T) >= 0) @ pw
        for batch in batches:
            tb = _pa.Table.from_batches([batch])
            n_id = tb.column("vec_id").to_numpy()
            col = tb.column("embedding").combine_chunks()
            n = len(n_id)
            if n == 0:
                continue
            offs = col.offsets.to_numpy()
            lens = offs[1:] - offs[:-1]
            valid = (~_np.asarray(col.is_null())) & (lens == dim)
            vals = _np.asarray(col.values, dtype=_np.float64)
            if valid.all():
                E = vals[offs[0]:offs[-1]].reshape(n, dim)
            else:
                E = _np.zeros((n, dim))
                for i in _np.flatnonzero(valid):
                    E[i] = vals[offs[i]:offs[i] + dim]
            En = _np.sqrt((E * E).sum(axis=1))
            bucket = _np.zeros(n, dtype=_np.int64)
            bucket[valid] = (((E[valid] @ P.T) >= 0) @ pw)
            out_q, out_n, out_c, out_null = [], [], [], []
            for j in range(m):
                hit = (bucket == qb[j]) & (n_id != qi[j])
                if not hit.any():
                    continue
                hv = hit & valid
                with _np.errstate(invalid="ignore",
                                  divide="ignore"):
                    cc = _np.round((E[hv] @ Q[j]) /
                                   (En[hv] * Qn[j]), 6)
                out_q.append(_np.full(hv.sum(), qi[j]))
                out_n.append(n_id[hv])
                out_c.append(cc)
                out_null.append(_np.zeros(hv.sum(), dtype=bool))
                hn = hit & ~valid
                if hn.any():
                    out_q.append(_np.full(hn.sum(), qi[j]))
                    out_n.append(n_id[hn])
                    out_c.append(_np.full(hn.sum(), _np.nan))
                    out_null.append(_np.ones(hn.sum(), dtype=bool))
            if not out_q:
                continue
            cc = _np.concatenate(out_c)
            yield _pa.RecordBatch.from_arrays(
                [_pa.array(_np.concatenate(out_q)),
                 _pa.array(_np.concatenate(out_n)),
                 _pa.array(cc, mask=_np.concatenate(out_null))],
                names=["q_id", "n_id", "cos"])

    scored = (emb.select("vec_id", "embedding")
              .mapInArrow(score,
                          schema="q_id long, n_id long, cos double"))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(),
                                          F.col("n_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "rank", "n_id", "cos"))


def embedding_near_dups(emb: DataFrame, threshold=0.95,
                        use_lsh=False, dim=64, n_planes=6,
                        n_probes=0) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b,
    cos >= threshold).

    use_lsh=False: exact all-pairs (the verification/oracle path —
    quadratic, fine for gate-scale).  use_lsh=True: candidate pairs
    only within LSH buckets (the 100 TB path; recall < 1, cost drops
    from n^2 to sum of bucket^2).  n_probes=k additionally probes the
    k Hamming-distance-1 neighbor buckets (flip plane bit i for
    i < k) on the left side — the standard multi-probe recall lever
    ((k+1)x candidate cost); embedding_dup_recall() measures what it
    buys on this corpus."""
    # r9: norms are computed once per row (numpy pass on the LSH
    # path, one JVM fold on the exact path) instead of once per PAIR
    # inside cosine() — the pair scoring drops from three interpreted
    # HOF folds to one dot; values identical (same doubles divided).
    if use_lsh and not n_probes:
        # r9 (guide §4.2): score each bucket as a GROUP — the old
        # self-join materialized BOTH 64-dim arrays per candidate
        # pair and paid an interpreted HOF dot each (at 20k vectors
        # in 2^6 buckets that is 17M pairs / ~17 GB through the
        # filter; measured 248 s).  applyInPandas ships every vector
        # ONCE per bucket and one numpy matmul scores the whole
        # upper triangle: 248 s -> ~4 s, identical output (rows with
        # NULL/invalid embeddings scored cos=NULL before and were
        # dropped by the threshold filter, so excluding them up
        # front changes nothing).  Per-bucket memory is O(size^2)
        # doubles — same asymptotics the join already had;
        # embedding_bucket_stats remains the no-silent-caps monitor
        # for hot buckets.
        sig = _lsh_signature_np(emb, dim, n_planes)
        valid = sig.filter(F.col("nrm").isNotNull())

        def score_bucket(pdf):
            import numpy as _np
            import pandas as _pd
            n = len(pdf)
            if n < 2:
                return _pd.DataFrame(
                    {"vec_a": _pd.Series(dtype="int64"),
                     "vec_b": _pd.Series(dtype="int64"),
                     "cos": _pd.Series(dtype="float64")})
            order = _np.argsort(pdf["vec_id"].to_numpy())
            ids = pdf["vec_id"].to_numpy()[order]
            V = _np.stack(pdf["embedding"].to_numpy()[order])
            nr = pdf["nrm"].to_numpy()[order]
            with _np.errstate(invalid="ignore", divide="ignore"):
                C = _np.round((V @ V.T) / _np.outer(nr, nr), 6)
            iu, ju = _np.triu_indices(n, k=1)
            cc = C[iu, ju]
            # Spark's `cos >= threshold` keeps NaN (NaN compares
            # GREATER than everything in Spark SQL, and the old join
            # path emitted NaN-cos pairs for zero-norm vectors);
            # ~(cc < t) reproduces that exactly in numpy
            keep = ~(cc < threshold)
            return _pd.DataFrame({"vec_a": ids[iu[keep]],
                                  "vec_b": ids[ju[keep]],
                                  "cos": cc[keep]})

        return (valid.groupBy("bucket")
                .applyInPandas(score_bucket,
                               schema="vec_a long, vec_b long, "
                                      "cos double"))
    if use_lsh:
        sig = _lsh_signature_np(emb, dim, n_planes)
        a = sig.select(F.col("vec_id").alias("vec_a"),
                       F.col("embedding").alias("emb_a"),
                       F.col("nrm").alias("nrm_a"),
                       F.col("bucket").alias("bucket_a"))
        probes = F.array(
            F.col("bucket_a"),
            *[F.col("bucket_a").bitwiseXOR(1 << i)
              for i in range(n_probes)])
        a = a.select("vec_a", "emb_a", "nrm_a",
                     F.explode(probes).alias("bucket_a"))
        b = sig.select(F.col("vec_id").alias("vec_b"),
                       F.col("embedding").alias("emb_b"),
                       F.col("nrm").alias("nrm_b"),
                       F.col("bucket").alias("bucket_b"))
        joined = a.join(b, (F.col("bucket_a") == F.col("bucket_b")) &
                        (F.col("vec_a") < F.col("vec_b")))
        # a probed pair can match through several buckets AND in
        # both flip directions: dedup before scoring
        joined = (joined.select("vec_a", "emb_a", "nrm_a",
                                "vec_b", "emb_b", "nrm_b")
                  .dropDuplicates(["vec_a", "vec_b"]))
    else:
        a = emb.select(F.col("vec_id").alias("vec_a"),
                       F.col("embedding").alias("emb_a"),
                       _norm(F.col("embedding")).alias("nrm_a"))
        b = emb.select(F.col("vec_id").alias("vec_b"),
                       F.col("embedding").alias("emb_b"),
                       _norm(F.col("embedding")).alias("nrm_b"))
        joined = a.join(b, F.col("vec_a") < F.col("vec_b"))
    scored = joined.select(
        "vec_a", "vec_b",
        F.round(_dot(F.col("emb_a"), F.col("emb_b")) /
                (F.col("nrm_a") * F.col("nrm_b")), 6).alias("cos"))
    return scored.filter(F.col("cos") >= threshold)


def embedding_dup_recall(emb: DataFrame, threshold=0.95, dim=64,
                         n_planes=6, n_probes=3,
                         sample_frac=1.0) -> DataFrame:
    """Recall of the LSH-bucketed near-dup paths against the exact
    all-pairs baseline (r4, the no-silent-caps rule for ANN): one row
    per method — 'lsh' (primary buckets only) and 'lsh_probed'
    (+ Hamming-1 multi-probe on the first n_probes planes) — with
    (n_exact, n_pairs, n_hit, recall).

    The exact side is quadratic, so at 100 TB the metric itself must
    be runnable on a slice: sample_frac < 1 (r5) restricts BOTH the
    exact baseline and the LSH sides to the same deterministic
    hash-sample of vec_ids (pmod(xxhash64(vec_id), 10^6) < frac*10^6
    — reproducible across runs and engines, no Spark sample() RNG),
    which is the standard sampled ANN-recall protocol.  The recall
    estimate is unbiased for the sampled population; the production
    LSH plan being audited is unchanged.  sample_frac=1 (the oracled
    registry default) is exact."""
    if sample_frac < 1.0:
        emb = emb.filter(
            F.pmod(F.xxhash64(F.col("vec_id")), F.lit(1000000)) <
            F.lit(int(sample_frac * 1000000)))
    # r9: materialize each pair set once — the exact (quadratic!)
    # subtree used to re-execute for every consumer below (n_exact
    # agg + two semi-join probes = 4 full all-pairs scans; lsh/probed
    # 2x each).  Same pattern as ann_recall's exact baseline.
    exact = embedding_near_dups(emb, threshold, use_lsh=False) \
        .select("vec_a", "vec_b").localCheckpoint(eager=True)

    def row(method, pairs):
        hit = exact.join(pairs, ["vec_a", "vec_b"], "leftsemi")
        return (exact.agg(F.count("*").alias("n_exact"))
                .crossJoin(pairs.agg(F.count("*").alias("n_pairs")))
                .crossJoin(hit.agg(F.count("*").alias("n_hit")))
                .select(F.lit(method).alias("method"),
                        F.col("n_exact").cast("bigint")
                        .alias("n_exact"),
                        F.col("n_pairs").cast("bigint")
                        .alias("n_pairs"),
                        F.col("n_hit").cast("bigint").alias("n_hit"),
                        F.when(F.col("n_exact") == 0, F.lit(0.0))
                        .otherwise(F.round(
                            F.col("n_hit").cast("double") /
                            F.col("n_exact"), 6)).alias("recall")))

    lsh = embedding_near_dups(emb, threshold, use_lsh=True, dim=dim,
                              n_planes=n_planes) \
        .select("vec_a", "vec_b").localCheckpoint(eager=True)
    probed = embedding_near_dups(emb, threshold, use_lsh=True,
                                 dim=dim, n_planes=n_planes,
                                 n_probes=n_probes) \
        .select("vec_a", "vec_b").localCheckpoint(eager=True)
    return row("lsh", lsh).unionByName(row("lsh_probed", probed))


def embedding_bucket_stats(emb: DataFrame, dim=64,
                           n_planes=6) -> DataFrame:
    """Observability for the embedding LSH buckets (r5; the
    lsh_bucket_stats analog for the ANN path — no-silent-caps rule):
    per bucket-size histogram row (bucket_size, n_buckets, n_vecs).
    Candidate cost of the bucketed join is sum(bucket_size^2), so a
    skewed histogram here is the early warning that n_planes is too
    small for the corpus."""
    sizes = (lsh_signature(emb, dim, n_planes)
             .groupBy("bucket").agg(F.count("*").alias("bucket_size")))
    return (sizes.groupBy("bucket_size")
            .agg(F.count("*").alias("n_buckets"),
                 F.sum("bucket_size").alias("n_vecs"))
            .orderBy(F.col("bucket_size").desc()))


def ivf_centroids(emb: DataFrame, k=16, iterations=0,
                  dim=None) -> DataFrame:
    """Deterministic IVF coarse quantizer: seed centroids = the k
    lowest vec_ids (cid = rank among them), refined by `iterations`
    Lloyd steps (mean of assigned vectors).  Pure DataFrame ops;
    centroids stay tiny and broadcastable.

    iterations=0 (the oracled default) keeps centroids = exact data
    vectors — no cross-engine float-mean drift; Lloyd refinement is a
    library capability verified by pytest recall tests."""
    seeds = emb.orderBy("vec_id").limit(k)
    w = Window.partitionBy(F.lit(0)).orderBy("vec_id")
    cents = seeds.select((F.row_number().over(w) - 1).alias("cid"),
                         F.col("embedding").alias("centroid"))
    if iterations and dim is None:
        dim = len(emb.select("embedding").head()[0])
    for _ in range(iterations):
        assigned = ivf_assign(emb, cents)
        cents = (assigned
                 .join(emb, "vec_id")
                 .groupBy("cid")
                 .agg(F.array(*[
                     F.avg(F.element_at("embedding", i + 1))
                     for i in range(dim)]).alias("centroid")))
    return cents


def ivf_assign(emb: DataFrame, cents: DataFrame) -> DataFrame:
    """Assign each vector to its nearest centroid.  The similarity is
    rounded to 6 decimals BEFORE the argmin so last-ulp accumulation
    differences can't flip assignments across engines; ties break on
    lowest cid.

    r9 (guide §4.2): the centroid set is bounded by construction
    (n_centroids rows, already eagerly materialized by ivf_knn), so
    it is fetched once and the corpus streams through one numpy
    mapInArrow computing the rounded-cosine argmax per row — no
    crossJoin fan-out, no interpreted HOF folds, and the per-vec_id
    row_number window (a full shuffle + sort of n x n_centroids
    rows) disappears entirely.  Tie/NULL/NaN semantics match the old
    window exactly: numpy argmax picks the FIRST maximum (= lowest
    cid, the window's tie-break), a NaN sim ranks greatest exactly
    like Spark's NaN-largest DESC sort, and an invalid/NULL
    embedding (all sims NULL -> window fell through to cid ASC)
    maps to the lowest cid."""
    crows = sorted(((r["cid"], list(r["centroid"]))
                    for r in cents.select("cid", "centroid").collect()
                    if r["centroid"] is not None),
                   key=lambda t: t[0])
    cid_list = [c for c, _ in crows]
    cent_mat = [v for _, v in crows]

    def assign(batches):
        import numpy as _np
        import pyarrow as _pa
        m = len(cid_list)
        if m == 0:
            return
        cids = _np.asarray(cid_list, dtype=_np.int64)
        C = _np.asarray(cent_mat, dtype=_np.float64)
        Cn = _np.sqrt((C * C).sum(axis=1))
        dim = C.shape[1]
        for batch in batches:
            tb = _pa.Table.from_batches([batch])
            vec_id = tb.column("vec_id").to_numpy()
            col = tb.column("embedding").combine_chunks()
            n = len(vec_id)
            if n == 0:
                continue
            offs = col.offsets.to_numpy()
            lens = offs[1:] - offs[:-1]
            valid = (~_np.asarray(col.is_null())) & (lens == dim)
            vals = _np.asarray(col.values, dtype=_np.float64)
            best = _np.zeros(n, dtype=_np.int64)   # min-cid default
            if valid.all():
                E = vals[offs[0]:offs[-1]].reshape(n, dim)
                En = _np.sqrt((E * E).sum(axis=1))
                with _np.errstate(invalid="ignore", divide="ignore"):
                    sims = _np.round(
                        (E @ C.T) / (En[:, None] * Cn[None, :]), 6)
                best = _np.argmax(sims, axis=1)
            elif valid.any():
                idx = _np.flatnonzero(valid)
                E = _np.empty((len(idx), dim))
                for j, i in enumerate(idx):
                    E[j] = vals[offs[i]:offs[i] + dim]
                En = _np.sqrt((E * E).sum(axis=1))
                with _np.errstate(invalid="ignore", divide="ignore"):
                    sims = _np.round(
                        (E @ C.T) / (En[:, None] * Cn[None, :]), 6)
                best[idx] = _np.argmax(sims, axis=1)
            yield _pa.RecordBatch.from_arrays(
                [_pa.array(vec_id), _pa.array(cids[best])],
                names=["vec_id", "cid"])

    return (emb.select("vec_id", "embedding")
            .mapInArrow(assign, schema="vec_id long, cid long"))


def ivf_knn(emb: DataFrame, query_ids, k=5, n_centroids=16,
            nprobe=4, iterations=0) -> DataFrame:
    """IVF approximate top-k: search only the nprobe clusters nearest
    each query.  The scale path: candidate set shrinks from n to
    ~n*nprobe/n_centroids per query."""
    cents = ivf_centroids(emb, n_centroids, iterations=iterations)
    # cents is consumed twice below (ivf_assign + the qprobe
    # crossJoin); without a lineage cut Catalyst plans the
    # orderBy().limit(k) corpus subtree twice — two extra full scans
    # (round-2 VERDICT).  It is <= n_centroids rows; materialize once.
    cents = cents.localCheckpoint(eager=True)
    assigned = ivf_assign(emb, cents)
    q = (emb.filter(F.col("vec_id").isin(list(query_ids)))
         .select(F.col("vec_id").alias("q_id"),
                 F.col("embedding").alias("q_emb"),
                 _norm(F.col("embedding")).alias("q_nrm")))
    qprobe = (q.crossJoin(F.broadcast(
                  cents.select("cid", "centroid",
                               _norm(F.col("centroid")).alias("cnrm"))))
              .select("q_id", "q_emb", "q_nrm", "cid",
                      F.round(_dot(F.col("q_emb"), F.col("centroid")) /
                              (F.col("q_nrm") * F.col("cnrm")), 6)
                      .alias("sim")))
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(),
                                           F.col("cid").asc())
    probes = (qprobe.withColumn("rn", F.row_number().over(w))
              .filter(F.col("rn") <= nprobe)
              .select("q_id", "q_emb", "q_nrm", "cid"))
    cand = (assigned.join(emb, "vec_id")
            .select("vec_id", "cid", "embedding",
                    _norm(F.col("embedding")).alias("nrm")))
    scored = (cand.join(F.broadcast(probes), "cid")
              .filter(F.col("vec_id") != F.col("q_id"))
              .select("q_id", F.col("vec_id").alias("n_id"),
                      F.round(_dot(F.col("q_emb"),
                                   F.col("embedding")) /
                              (F.col("q_nrm") * F.col("nrm")), 6)
                      .alias("cos")))
    w2 = Window.partitionBy("q_id").orderBy(F.col("cos").desc(),
                                            F.col("n_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= k)
            .select("q_id", "rank", "n_id", "cos"))


def semdedup_keep(emb: DataFrame, threshold=0.2, dim=64,
                  n_planes=6) -> DataFrame:
    """SemDeDup-style materialized keep decision over EMBEDDING
    near-dup clusters — the semantic twin of dedup.dedup_keep (which
    clusters on MinHash text evidence): LSH-bucketed cosine pairs ->
    min-label connected components -> exactly one representative per
    cluster,

      (vec_id, component, cluster_size, keep)

    component = min vec_id reachable (self for singletons),
    keep = 1 iff this row IS the representative.  Abbas et al.'s
    SemDeDup keeps the point FARTHEST from the cluster centroid; we
    keep min-id — centroid distance needs a float reduction over the
    cluster (combine-order dependent, never hash-exact) and the
    cited paper itself reports the choice of representative barely
    moves downstream loss, so the deterministic pick is the sound
    one for a gated pipeline.

    Scale shape: EXACT-duplicate vectors star-collapse FIRST — a
    mega-group of identical embeddings (failed/default/zero-content
    vectors, the embedding analog of boilerplate text) would
    otherwise sit in one LSH bucket and pay O(group^2) cosine pairs;
    the collapse is one window-min over the vector itself (cos of
    identical vectors is 1 >= any threshold, so replacing the clique
    with rep->member star edges preserves connectivity EXACTLY —
    components, sizes and keeps are unchanged, which is why this op
    can take the cheap path while the registered embedding_dups,
    whose output IS the pair set, cannot).  Only representatives
    enter the bucketed cosine join (sum of bucket^2 on the DISTINCT
    vectors); NULL-embedding and all-zero rows skip the collapse and
    stay singletons (cos is NULL-out/0-norm there — on both engines
    the pair never passes the threshold, so starring them would
    INVENT edges the oracle does not have; DuckDB folds 0.0/0.0 to
    NULL, probed while writing this).
    Then dedup_components' checkpointed min-label propagation; the
    final join is corpus x (dup subset), left unhinted for the same
    AQE-decides reason dedup_keep documents (a forced broadcast of a
    heavy-dup component map would OOM; AQE broadcasts only when the
    observed shuffle size is small)."""
    from .dedup import dedup_components
    nn = emb.filter(F.col("embedding").isNotNull() &
                    F.exists("embedding", lambda x: x != 0.0))
    w = Window.partitionBy("embedding")
    marked = nn.select("vec_id", "embedding",
                       F.min("vec_id").over(w).alias("rep"))
    star = (marked.filter(F.col("vec_id") != F.col("rep"))
            .select(F.col("rep").alias("doc_a"),
                    F.col("vec_id").alias("doc_b")))
    reps = (marked.filter(F.col("vec_id") == F.col("rep"))
            .select("vec_id", "embedding"))
    pairs = (embedding_near_dups(reps, threshold, use_lsh=True,
                                 dim=dim, n_planes=n_planes)
             .select(F.col("vec_a").alias("doc_a"),
                     F.col("vec_b").alias("doc_b"))
             .unionByName(star))
    comp = dedup_components(pairs).withColumnRenamed(
        "doc_id", "vec_id")
    sizes = comp.groupBy("component").agg(
        F.count("*").alias("csize"))
    comp = comp.join(sizes, "component")
    base = emb.select("vec_id")
    j = base.join(comp, "vec_id", "left")
    rep = F.coalesce(F.col("component"), F.col("vec_id"))
    return j.select(
        "vec_id",
        rep.cast("bigint").alias("component"),
        F.coalesce(F.col("csize"), F.lit(1)).cast("bigint")
         .alias("cluster_size"),
        (rep == F.col("vec_id")).cast("int").alias("keep"))
