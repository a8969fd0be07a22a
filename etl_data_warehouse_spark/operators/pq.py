"""Product quantization (PQ) — compressed-domain ANN scan.

Completes the ANN ladder (operators/similarity.py): brute force (exact
baseline, q26) → hyperplane LSH (pair generation, q41) → IVF (coarse
cell pruning, q28) → PQ (this module): each vector is stored as m
small code ids (one per subspace) instead of d floats, and query-time
scoring is table lookups — the memory-bound trick that makes
billion-vector scans fit in RAM (Jégou et al., "Product Quantization
for Nearest Neighbor Search", TPAMI 2011; public method).

Spark-first shapes:
- training: m independent ``kmeans_centroids`` runs over sliced
  subvectors (slices are Catalyst ``slice`` calls, no UDFs);
- encoding: long-form (vec_id, subspace, code_id) via a broadcast
  argmin join — ONE table, partitionable by anything, m rows/vector
  (m * ceil(log2(k))/8 bytes effective vs 4d bytes raw: 16 bytes vs
  256 for d=64, m=4 — a 16x state reduction at 100 TB);
- ADC scan: the query builds an (m × k) partial-similarity table
  (broadcast), the codes table aggregates sum-of-partials per
  (query, vector) — no original vectors touched;
- refine: exact cosine re-rank of the ADC shortlist (the standard
  production composition: PQ recalls the neighborhood, exact scoring
  orders it; within-quantization-cell ties are unrecoverable from
  codes alone).

Cosine under ADC: cos(q, x) ≈ Σ_s q_s·c_{s,code} / (|q| · sqrt(Σ_s
|c_{s,code}|²)) — both the numerator partials and the reconstruction
norm come from the same broadcast tables.

Reference parity: none (the reference has no vector search at all);
this is brief-mandated training-data-pipeline surface.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import kmeans_centroids


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _subvectors(vectors: DataFrame, m: int, dim: int, vec_col: str) -> DataFrame:
    """Long-form (vec_id, subspace, sv:array<double>) — one row per
    (vector, subspace), sliced JVM-side."""
    sub_dim = dim // m
    dbl = F.transform(vec_col, lambda x: x.cast("double"))
    slices = F.array(
        *[
            F.struct(
                F.lit(s).alias("subspace"),
                F.slice(dbl, s * sub_dim + 1, sub_dim).alias("sv"),
            )
            for s in range(m)
        ]
    )
    return vectors.select(
        "vec_id", F.explode(slices).alias("p")
    ).select("vec_id", "p.subspace", "p.sv")


def _vec_dim(vectors: DataFrame, vec_col: str) -> int:
    row = vectors.select(F.size(vec_col).alias("d")).first()
    return int(row["d"])


def train_pq_codebooks(
    vectors: DataFrame,
    m: int = 4,
    codes: int = 16,
    max_iterations: int = 8,
    vec_col: str = "embedding",
) -> DataFrame:
    """m per-subspace codebooks of ``codes`` entries each, trained with
    the deterministic Lloyd's operator. Returns (subspace, code_id, cv,
    cnorm2), small by construction (m·codes rows) — always broadcast.
    """
    dim = _vec_dim(vectors, vec_col)
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = _subvectors(vectors, m, dim, vec_col).localCheckpoint()

    # All m subspaces train in ONE Lloyd's fixed-point loop (subspace is
    # just another grouping column) instead of m sequential kmeans runs
    # — same per-subspace math and seeding, so the result is identical,
    # but the driver schedules iterations once, not m times. A subspace
    # that converges early just stops changing (no-op iterations).
    w_seed = Window.partitionBy("subspace").orderBy("vec_id")
    centroids = (
        sub.withColumn("r", F.row_number().over(w_seed))
        .filter(F.col("r") <= codes)
        .select(
            "subspace", F.col("r").alias("code_id"), F.col("sv").alias("cv")
        )
        .localCheckpoint()
    )
    prev_assign = None
    for _ in range(max_iterations):
        cent_row = centroids.groupBy().agg(
            F.collect_list(F.struct("subspace", "code_id", "cv")).alias("cells")
        )
        best = F.aggregate(
            F.transform(
                F.filter("cells", lambda c: c["subspace"] == F.col("subspace")),
                lambda c: F.struct(
                    F.aggregate(
                        F.zip_with(
                            "sv", c["cv"], lambda x, y: (x - y) * (x - y)
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ).alias("dist"),
                    c["code_id"].alias("code_id"),
                ),
            ),
            F.struct(
                F.lit(float("inf")).alias("dist"),
                F.lit(2147483647).alias("code_id"),
            ),
            lambda acc, c: F.when(
                (c["dist"] < acc["dist"])
                | ((c["dist"] == acc["dist"]) & (c["code_id"] < acc["code_id"])),
                c,
            ).otherwise(acc),
        )
        assigned = (
            sub.crossJoin(F.broadcast(cent_row))
            .select("vec_id", "subspace", "sv", best["code_id"].alias("code_id"))
            .localCheckpoint()
        )
        if prev_assign is not None:
            changed = (
                assigned.select("vec_id", "subspace", "code_id")
                .exceptAll(prev_assign)
                .count()
            )
            if changed == 0:
                break
        prev_assign = assigned.select("vec_id", "subspace", "code_id")
        means = (
            assigned.select(
                "subspace", "code_id", F.posexplode("sv").alias("pos", "x")
            )
            .groupBy("subspace", "code_id", "pos")
            .agg(F.avg("x").alias("mu"))
            .groupBy("subspace", "code_id")
            .agg(
                F.array_sort(F.collect_list(F.struct("pos", "mu"))).alias("pm")
            )
            .select(
                "subspace",
                "code_id",
                F.transform("pm", lambda s: s["mu"]).alias("cv"),
            )
        )
        # empty cells keep their previous centroid
        centroids = (
            centroids.alias("old")
            .join(means.alias("new"), ["subspace", "code_id"], "left")
            .select(
                "subspace",
                "code_id",
                F.coalesce(F.col("new.cv"), F.col("old.cv")).alias("cv"),
            )
            .localCheckpoint()
        )
    return centroids.withColumn("cnorm2", _dot("cv", "cv")).localCheckpoint()


def train_pq_codebooks_numpy(
    vectors: DataFrame,
    m: int = 4,
    codes: int = 16,
    max_iterations: int = 8,
    vec_col: str = "embedding",
) -> DataFrame:
    """Driver-side numpy twin of :func:`train_pq_codebooks` for BOUNDED
    training sets (PQ training is always subsampled in production —
    build_ivf_pq_index's pq_train_limit): collect the n x d training
    block once (10K x 16 doubles = 1.2 MB at the XL operating point)
    and run the same deterministic Lloyd's locally instead of
    max_iterations x m interpreted fold-assignment jobs.

    Same CONTROL FLOW as the distributed trainer: seeding = the
    ``codes`` lowest vec_ids per subspace, assignment = argmin squared
    distance with asc-code_id tiebreak (numpy argmin first-occurrence
    over code_id-ordered centroids), empty cells keep their previous
    centroid, early stop when assignments stop changing. Centroid
    VALUES can differ from the fold trainer in final ulps (BLAS
    summation order vs the sequential fold) — same caveat as every
    assign_arrow twin, so this is the index-BUILD path
    (build_ivf_pq_index arrow mode), not the oracle-checked one; the
    recall gate measures the result where it matters.
    """
    import numpy as np

    rows = (
        vectors.select("vec_id", vec_col)
        .orderBy("vec_id")
        .collect()
    )
    V = np.array([r[1] for r in rows], dtype=np.float64)
    dim = V.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub_dim = dim // m
    out_rows = []
    for s in range(m):
        S = V[:, s * sub_dim : (s + 1) * sub_dim]
        cents = S[: codes].copy()  # code_id = row index + 1
        n_c = cents.shape[0]
        prev = None
        for _ in range(max_iterations):
            d = ((S[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(d, axis=1)
            if prev is not None and np.array_equal(a, prev):
                break
            prev = a
            for c in range(n_c):
                mask = a == c
                if mask.any():
                    cents[c] = S[mask].mean(axis=0)
        for c in range(n_c):
            cv = [float(x) for x in cents[c]]
            out_rows.append(
                (s, c + 1, cv, float(sum(x * x for x in cv)))
            )
    spark = vectors.sparkSession
    return spark.createDataFrame(
        out_rows, "subspace int, code_id int, cv array<double>, cnorm2 double"
    ).localCheckpoint()


def pq_encode(
    vectors: DataFrame, codebooks: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """(vec_id, subspace, code_id): nearest codebook entry per subspace
    (broadcast argmin join, deterministic code_id tiebreak). This long
    layout IS the PQ index — persist it partitioned however the corpus
    is partitioned."""
    m = codebooks.select(F.max("subspace")).first()[0] + 1
    dim = _vec_dim(vectors, vec_col)
    sub = _subvectors(vectors, m, dim, vec_col)
    l2 = F.aggregate(
        F.zip_with("sv", "cv", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("vec_id", "subspace").orderBy("dist", "code_id")
    return (
        sub.join(F.broadcast(codebooks), "subspace")
        .withColumn("dist", l2)
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select("vec_id", "subspace", "code_id")
    )


def pack_codes(codes_table: DataFrame, codebooks: DataFrame) -> DataFrame:
    """Pack the long-form PQ index into one row per vector:
    (vec_id, code_ids array<int> ordered by subspace, rnorm2 = Σ_s
    |c_{s,code}|²). The packed layout is what a compressed-domain scan
    wants to ship through joins — 1 row instead of m per candidate,
    and the reconstruction norm is precomputed at pack (index-build)
    time instead of re-aggregated per query. Persist alongside the
    cell assignment as index state."""
    joined = codes_table.join(
        F.broadcast(codebooks.select("subspace", "code_id", "cnorm2")),
        ["subspace", "code_id"],
    )
    return (
        joined.groupBy("vec_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("subspace", "code_id", "cnorm2"))
            ).alias("cs")
        )
        .select(
            "vec_id",
            F.transform("cs", lambda c: c["code_id"]).alias("code_ids"),
            F.aggregate(
                F.transform("cs", lambda c: c["cnorm2"]),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("rnorm2"),
        )
    )


def pack_encode_arrow(
    vectors: DataFrame, codebooks: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Throughput twin of ``pack_codes(pq_encode(...))``: one
    mapInPandas pass emits the packed layout (vec_id, code_ids,
    rnorm2) directly — no m-way explode, no broadcast join against
    every code, and no N·m·codes-row ranking window (the fold path
    pushes 64M rows through row_number at 1M vectors, m=4, codes=16;
    this path touches N rows once).

    Equivalence: per subspace, codes are sorted by code_id so numpy
    argmin's first-occurrence rule IS the fold path's asc-code_id
    tiebreak; the matmul drops the row-constant |sv|^2 term (argmin
    unaffected); rnorm2 accumulates the codebooks' OWN cnorm2 values
    in subspace order — the same left fold as pack_codes. Same caveat
    as every assign_arrow path: BLAS summation can flip exact-distance
    ties, so the fold path remains the oracle-checked default
    (tests/test_pq.py pins equality on the test corpus)."""
    import numpy as np
    import pandas as pd  # noqa: F401  (mapInPandas contract)

    rows = codebooks.select("subspace", "code_id", "cv", "cnorm2").collect()
    m = max(r["subspace"] for r in rows) + 1
    books, ids, norms = [], [], []
    for s in range(m):
        rs = sorted(
            (r for r in rows if r["subspace"] == s),
            key=lambda r: r["code_id"],
        )
        books.append(
            np.stack([np.asarray(r["cv"], dtype=np.float64) for r in rs])
        )
        ids.append(np.array([r["code_id"] for r in rs], dtype=np.int32))
        norms.append(np.array([r["cnorm2"] for r in rs], dtype=np.float64))
    subdim = books[0].shape[1]
    d2 = [(b * b).sum(axis=1) for b in books]
    np_ = np

    def enc(batches):
        import pandas as pd_

        for pdf in batches:
            if not len(pdf):
                continue
            vmat = np_.stack(
                [np_.asarray(x, dtype=np_.float64) for x in pdf[vec_col]]
            )
            n = len(pdf)
            code_mat = np_.empty((n, m), dtype=np_.int32)
            rn = np_.zeros(n, dtype=np_.float64)
            for s in range(m):
                sub = vmat[:, s * subdim : (s + 1) * subdim]
                d = d2[s][None, :] - 2.0 * (sub @ books[s].T)
                a = np_.argmin(d, axis=1)
                code_mat[:, s] = ids[s][a]
                rn = rn + norms[s][a]
            yield pd_.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "code_ids": list(code_mat),
                    "rnorm2": rn,
                }
            )

    return vectors.select("vec_id", vec_col).mapInPandas(
        enc, schema="vec_id bigint, code_ids array<int>, rnorm2 double"
    )


def pq_topk(
    codes_table: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    k: int = 5,
    refine_with: DataFrame | None = None,
    refine_factor: int = 10,
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k per query over the PQ codes.

    Pure-ADC mode (refine_with=None): rank by the table-lookup cosine.
    Refine mode: ADC shortlists k*refine_factor candidates, then exact
    cosine over the original vectors (``refine_with``) re-ranks —
    touching only shortlist rows of the raw corpus.
    Output: (src_id, neighbor_id, score, rank); self-matches excluded.
    """
    m = codebooks.select(F.max("subspace")).first()[0] + 1
    dim = _vec_dim(queries, vec_col)
    qsub = _subvectors(
        queries.select(F.col("vec_id"), F.col(vec_col)), m, dim, vec_col
    ).withColumnRenamed("vec_id", "src_id")
    # (src_id, subspace, code_id, partial, cnorm2): m·codes rows/query
    table = (
        qsub.join(F.broadcast(codebooks), "subspace")
        .select(
            "src_id",
            "subspace",
            "code_id",
            _dot("sv", "cv").alias("partial"),
            "cnorm2",
        )
    )
    qnorm = queries.select(
        F.col("vec_id").alias("src_id"),
        F.sqrt(
            _dot(
                F.transform(vec_col, lambda x: x.cast("double")),
                F.transform(vec_col, lambda x: x.cast("double")),
            )
        ).alias("qn"),
    )
    adc = (
        codes_table.join(F.broadcast(table), ["subspace", "code_id"])
        .groupBy("src_id", "vec_id")
        .agg(
            F.sum("partial").alias("num"),
            F.sum("cnorm2").alias("rnorm2"),
            F.count(F.lit(1)).alias("m_terms"),
        )
        .filter(F.col("m_terms") == m)  # guard against partial indexes
        .join(F.broadcast(qnorm), "src_id")
        .filter(F.col("src_id") != F.col("vec_id"))
        .select(
            "src_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                F.col("num") / (F.col("qn") * F.sqrt(F.col("rnorm2")))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("src_id").orderBy(F.desc("score"), "neighbor_id")
    if refine_with is None:
        return (
            adc.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .orderBy("src_id", "rank")
        )
    shortlist = (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k * refine_factor)
        .select("src_id", "neighbor_id")
    )
    dblv = F.transform(vec_col, lambda x: x.cast("double"))
    corpus = refine_with.select(
        F.col("vec_id").alias("neighbor_id"), dblv.alias("nv")
    )
    qv = queries.select(F.col("vec_id").alias("src_id"), dblv.alias("qv"))
    exact = (
        shortlist.join(corpus, "neighbor_id")
        .join(F.broadcast(qv), "src_id")
        .select(
            "src_id",
            "neighbor_id",
            (
                _dot("qv", "nv")
                / (F.sqrt(_dot("qv", "qv")) * F.sqrt(_dot("nv", "nv")))
            ).alias("score"),
        )
    )
    w2 = Window.partitionBy("src_id").orderBy(F.desc("score"), "neighbor_id")
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .orderBy("src_id", "rank")
    )


def compression_ratio(dim: int, m: int, codes: int) -> float:
    """Raw float32 bytes per vector vs effective PQ code bytes."""
    return (4.0 * dim) / (m * max(1.0, math.ceil(math.log2(codes)) / 8.0))


def ivfadc_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 64,
    nprobe: int = 8,
    m: int = 4,
    codes: int = 16,
    centroids: DataFrame | None = None,
    codebooks: DataFrame | None = None,
    codes_table: DataFrame | None = None,
    codes_packed: DataFrame | None = None,
    assigned: DataFrame | None = None,
    refine_with: DataFrame | None = None,
    refine_factor: int = 10,
    vec_col: str = "embedding",
    assign_arrow: bool = False,
) -> DataFrame:
    """IVFADC: IVF cell pruning composed with PQ ADC scoring and exact
    refine — the standard production ANN form (Jégou et al. 2011, §IV:
    coarse quantizer + product codes; this variant PQ-encodes raw
    vectors rather than cell residuals, trading a little ADC fidelity
    for one shared codebook — the exact-refine stage absorbs the
    difference).

    Stages (all DataFrame ops, no cartesian):
    1. coarse-assign every corpus vector to its nearest of ``n_cells``
       trained centroids (one linear pass, ``similarity.rank_cells``);
    2. PQ-encode the corpus (m codes/vector — the only per-vector state
       the scan touches);
    3. queries probe their ``nprobe`` nearest cells; ADC-score ONLY the
       codes of vectors in probed cells via two broadcast joins
       (candidates ≈ |Q|·N·nprobe/n_cells, each m code rows);
    4. exact cosine re-rank of the k*refine_factor ADC shortlist
       against the raw corpus (touches shortlist rows only).

    Pass pre-trained ``centroids``/``codebooks``/``codes_table``/
    ``assigned`` (vec_id, cell_id) to amortize index build across query
    batches (the 100 TB shape: train once, persist codes AND cell
    assignment partitioned by cell — the assignment is index state, not
    per-query work; omitting ``assigned`` re-derives it each call with
    a full corpus pass).
    Output: (src_id, neighbor_id, score, rank) — score is exact cosine
    when refining (default), ADC cosine otherwise.
    """
    from .similarity import rank_cells, with_norm

    if centroids is None:
        centroids = kmeans_centroids(
            vectors, n_cells=n_cells, vec_col=vec_col
        )
    cents = centroids.select(
        "cell_id",
        "cv",
        F.sqrt(_dot("cv", "cv")).alias("cn"),
    ).localCheckpoint()
    if codebooks is None:
        codebooks = train_pq_codebooks(vectors, m=m, codes=codes,
                                       vec_col=vec_col)
    if codes_table is None and codes_packed is None:
        codes_table = pq_encode(vectors, codebooks, vec_col=vec_col)

    if assigned is None:
        v = with_norm(vectors, vec_col).select(
            F.col("vec_id").alias("vid"),
            F.col("_v").alias("vv"),
            F.col("_norm").alias("vn"),
        )
        assigned = (
            rank_cells(
                v, cents, 1, assign_arrow=assign_arrow, emit_vectors=False
            )
            .select(F.col("vid").alias("vec_id"), "cell_id")
        )
    else:
        assigned = assigned.select("vec_id", "cell_id")
    q = with_norm(queries, vec_col).select(
        F.col("vec_id").alias("vid"),
        F.col("_v").alias("vv"),
        F.col("_norm").alias("vn"),
    )
    # emit_vectors=False: only (vid, cell_id) is consumed, and the
    # arrow pass is opaque to column pruning (r14)
    probe_cells = (
        rank_cells(
            q, cents, nprobe, assign_arrow=assign_arrow, emit_vectors=False
        )
        .select(F.col("vid").alias("src_id"), "cell_id")
    )

    # Query ADC lookup table: m*codes partial dot products per query.
    mm = codebooks.select(F.max("subspace")).first()[0] + 1
    dim = _vec_dim(queries, vec_col)
    qsub = _subvectors(
        queries.select("vec_id", vec_col), mm, dim, vec_col
    ).withColumnRenamed("vec_id", "src_id")
    table = qsub.join(F.broadcast(codebooks), "subspace").select(
        "src_id", "subspace", "code_id",
        _dot("sv", "cv").alias("partial"), "cnorm2",
    )
    qnorm = queries.select(
        F.col("vec_id").alias("src_id"),
        F.sqrt(
            _dot(
                F.transform(vec_col, lambda x: x.cast("double")),
                F.transform(vec_col, lambda x: x.cast("double")),
            )
        ).alias("qn"),
    )
    # Cell restriction + ADC lookup, packed: ONE row per (query,
    # candidate) instead of m, no per-pair hash aggregate. The corpus
    # side ships (code_ids[m], rnorm2); each query broadcasts a flat
    # m·codes partials LUT ordered by (subspace, code_id), and the
    # score is an m-term lookup fold — r4 measured this at ~2x over
    # the previous m-rows-then-groupBy shape at 100K×1K bench scale.
    # code_id is 1-based (kmeans cell_id numbering): index the flat LUT
    # as s*codes_n + (code - code0) + 1 (element_at is 1-based too).
    code_lo, code_hi = codebooks.agg(
        F.min("code_id"), F.max("code_id")
    ).first()
    codes_n = code_hi - code_lo + 1
    packed = (
        codes_packed
        if codes_packed is not None
        else pack_codes(codes_table, codebooks)
    )
    lut = (
        table.groupBy("src_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("subspace", "code_id", "partial"))
            ).alias("ps")
        )
        .select(
            "src_id", F.transform("ps", lambda p: p["partial"]).alias("flat")
        )
    )
    num = F.aggregate(
        F.sequence(F.lit(0), F.lit(mm - 1)),
        F.lit(0.0),
        lambda acc, s: acc
        + F.element_at(
            F.col("flat"),
            (
                s * codes_n
                + F.element_at(F.col("code_ids"), (s + 1).cast("int"))
                - code_lo
                + 1
            ).cast("int"),
        ),
    )
    adc = (
        packed.join(assigned, "vec_id")
        .join(F.broadcast(probe_cells), "cell_id")
        .join(F.broadcast(lut), "src_id")
        .join(F.broadcast(qnorm), "src_id")
        .filter(F.col("src_id") != F.col("vec_id"))
        .select(
            "src_id",
            F.col("vec_id").alias("neighbor_id"),
            (num / (F.col("qn") * F.sqrt(F.col("rnorm2")))).alias("score"),
        )
    )
    w = Window.partitionBy("src_id").orderBy(F.desc("score"), "neighbor_id")
    if refine_with is None:
        refine_with = vectors
    shortlist = (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k * refine_factor)
        .select("src_id", "neighbor_id")
    )
    dblv = F.transform(vec_col, lambda x: x.cast("double"))
    corpus = refine_with.select(
        F.col("vec_id").alias("neighbor_id"), dblv.alias("nv")
    )
    qv = queries.select(F.col("vec_id").alias("src_id"), dblv.alias("qv"))
    exact = (
        shortlist.join(corpus, "neighbor_id")
        .join(F.broadcast(qv), "src_id")
        .select(
            "src_id",
            "neighbor_id",
            (
                _dot("qv", "nv")
                / (F.sqrt(_dot("qv", "qv")) * F.sqrt(_dot("nv", "nv")))
            ).alias("score"),
        )
    )
    w2 = Window.partitionBy("src_id").orderBy(F.desc("score"), "neighbor_id")
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .orderBy("src_id", "rank")
    )


def int8_quantize(vectors: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Symmetric per-vector int8 quantization — the 4× storage cut
    (float32 → int8) an embedding lake takes before PQ is worth it:
    ``scale = 127 / max|x|``, ``code_i = floor(x_i*scale + 0.5)``
    (round-half-toward-+∞ — spelled as floor(x+0.5) because engine
    round() builtins disagree on half-up vs half-even for doubles),
    dequant = code/scale. Emits the codes plus the reconstruction MSE
    (left-fold sum ≡ DuckDB list_reduce, per the fold-parity rule) so
    a pipeline can gate on quantization loss. Zero vectors quantize to
    scale 0 / all-zero codes / zero error.

    Pure projection — zero shuffles, runs at scan speed at any size.
    """
    dbl = F.transform(vec_col, lambda x: x.cast("double"))
    v = vectors.select("vec_id", dbl.alias("vv"))
    max_abs = F.array_max(F.transform("vv", F.abs))
    v = v.withColumn(
        "quant_scale",
        F.when(max_abs > 0, F.lit(127.0) / max_abs).otherwise(F.lit(0.0)),
    )
    code = lambda x: F.floor(x * F.col("quant_scale") + F.lit(0.5))  # noqa: E731
    inv = F.when(
        F.col("quant_scale") > 0, F.lit(1.0) / F.col("quant_scale")
    ).otherwise(F.lit(0.0))
    v = v.withColumn("inv_scale", inv)
    err = F.aggregate(
        F.transform(
            "vv",
            lambda x: (x - code(x).cast("double") * F.col("inv_scale"))
            * (x - code(x).cast("double") * F.col("inv_scale")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return v.select(
        "vec_id",
        "quant_scale",
        F.transform("vv", lambda x: code(x).cast("int")).alias("codes"),
        (err / F.size("vv").cast("double")).alias("recon_mse"),
    )
