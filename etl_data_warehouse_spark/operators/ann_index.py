"""Persisted IVF-PQ ANN index: train once, then query and APPEND new
vector batches without recomputing the corpus — the embedding twin of
the persisted MinHash index (operators/dedup_index.py).

The 100 TB similarity-search problem is operational, not one-shot:
"index today's embeddings against the billions already indexed".
Retraining/re-encoding the corpus per batch is O(corpus) per day; the
scale answer is persisted index state with FROZEN quantizers:

- ``centroids/``  (cell_id, cv)                  — coarse quantizer
- ``codebooks/``  (subspace, code_id, cv, cnorm2) — PQ codebooks
- ``packed/batch=N/``   (vec_id, code_ids, rnorm2) — compressed codes
- ``assigned/batch=N/`` (vec_id, cell_id)          — cell assignment

Quantizer state is trained at build time and never touched by appends
(periodic retraining is an offline REBUILD, the standard production
cadence); per batch the cost is O(batch) encode + assign.

Crash-safety of appends (the lesson from dedup_index/neardup_stream's
write-order analysis): each batch writes into its OWN ``batch=N``
subdirectories with mode=overwrite, so a replayed batch rewrites
byte-identical content instead of appending duplicates — duplicate
packed/assigned rows would double-score candidates in the ADC scan,
so append-mode idempotency-by-guard is NOT enough here. The
``skip_indexed`` guard exists for CROSS-batch re-crawls (an id
resubmitted in a later batch) and probes the UNION of both tables'
ids: an id left half-written by a crashed batch K is skipped by later
batches (K's replay completes it via overwrite) yet never lost.

Reference parity: none (the reference has no vector search); this is
the brief's training-data extension, composed from public methods
(Jégou et al. 2011 IVFADC).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pq import (
    ivfadc_topk,
    pack_codes,
    pack_encode_arrow,
    pq_encode,
    train_pq_codebooks,
)
from .similarity import kmeans_centroids, rank_cells, with_norm


def _assign_cells(
    vectors: DataFrame,
    centroids: DataFrame,
    assign_arrow: bool,
    vec_col: str,
) -> DataFrame:
    from .pq import _dot

    v = with_norm(vectors, vec_col).select(
        F.col("vec_id").alias("vid"),
        F.col("_v").alias("vv"),
        F.col("_norm").alias("vn"),
    )
    cents = centroids.select(
        "cell_id", "cv", F.sqrt(_dot("cv", "cv")).alias("cn")
    )
    return rank_cells(v, cents, 1, assign_arrow=assign_arrow).select(
        F.col("vid").alias("vec_id"), "cell_id"
    )


def build_ivf_pq_index(
    vectors: DataFrame,
    index_dir: str,
    n_cells: int = 64,
    m: int = 4,
    codes: int = 16,
    coarse_iterations: int = 4,
    pq_iterations: int = 4,
    pq_train_limit: int | None = 10000,
    coarse_train_limit: int | None = None,
    assign_arrow: bool = False,
    vec_col: str = "embedding",
) -> None:
    """Train quantizer state on the corpus (PQ codebooks on the
    ``pq_train_limit`` lowest vec_ids — Lloyd's cost is linear in the
    training set; subsampling is standard practice) and persist state
    plus the encoded corpus as batch 0.

    ``coarse_train_limit`` subsamples coarse-quantizer TRAINING the
    same way (the FAISS max_points_per_centroid move — ~64-256 points
    per cell train centroids as good as the full corpus; the FULL
    corpus is still assigned afterwards). ``assign_arrow=True`` also
    routes corpus encoding through ``pack_encode_arrow`` — one Arrow
    pass instead of the N·m·codes-row fold ranking; same BLAS-ulp
    caveat, so deterministic replay keeps the default fold path."""
    train_c = vectors
    if coarse_train_limit is not None:
        train_c = vectors.orderBy("vec_id").limit(coarse_train_limit)
    cents = kmeans_centroids(
        train_c,
        n_cells=n_cells,
        max_iterations=coarse_iterations,
        vec_col=vec_col,
        assign_arrow=assign_arrow,
    )
    train = vectors
    if pq_train_limit is not None:
        train = vectors.orderBy("vec_id").limit(pq_train_limit)
    books = train_pq_codebooks(
        train, m=m, codes=codes, max_iterations=pq_iterations, vec_col=vec_col
    )
    cents.write.mode("overwrite").parquet(f"{index_dir}/centroids")
    books.write.mode("overwrite").parquet(f"{index_dir}/codebooks")
    if assign_arrow:
        packed = pack_encode_arrow(vectors, books, vec_col=vec_col)
    else:
        packed = pack_codes(pq_encode(vectors, books, vec_col=vec_col), books)
    assigned = _assign_cells(vectors, cents, assign_arrow, vec_col)
    packed.write.mode("overwrite").parquet(f"{index_dir}/packed/batch=0")
    assigned.write.mode("overwrite").parquet(f"{index_dir}/assigned/batch=0")


def load_ivf_pq_index(spark: SparkSession, index_dir: str) -> dict:
    """Index state as DataFrames; `packed`/`assigned` span all batches."""
    return {
        "centroids": spark.read.parquet(f"{index_dir}/centroids"),
        "codebooks": spark.read.parquet(f"{index_dir}/codebooks"),
        "packed": spark.read.option("basePath", f"{index_dir}/packed")
        .parquet(f"{index_dir}/packed")
        .drop("batch"),
        "assigned": spark.read.option("basePath", f"{index_dir}/assigned")
        .parquet(f"{index_dir}/assigned")
        .drop("batch"),
    }


def append_to_ivf_index(
    new_vectors: DataFrame,
    index_dir: str,
    batch_id: int,
    assign_arrow: bool = False,
    vec_col: str = "embedding",
    skip_indexed: bool = True,
) -> None:
    """Encode + assign a new batch under the FROZEN quantizer state and
    persist it as ``batch=batch_id`` (overwrite → replay-idempotent;
    see module docstring for why append-mode would corrupt the scan).
    ``skip_indexed`` anti-joins ids already in packed OR assigned of
    any OTHER batch — re-crawled ids across batches are dropped, while
    this batch's own earlier (possibly partial) write is excluded from
    the probe so a replay always re-encodes the full batch and the
    overwrite completes it."""
    spark = new_vectors.sparkSession
    idx = load_ivf_pq_index(spark, index_dir)
    if skip_indexed:
        other = F.col("batch") != batch_id
        seen = (
            spark.read.option("basePath", f"{index_dir}/packed")
            .parquet(f"{index_dir}/packed")
            .filter(other)
            .select("vec_id")
            .unionByName(
                spark.read.option("basePath", f"{index_dir}/assigned")
                .parquet(f"{index_dir}/assigned")
                .filter(other)
                .select("vec_id")
            )
            .distinct()
        )
        new_vectors = new_vectors.join(seen, "vec_id", "left_anti")
    new_vectors = new_vectors.localCheckpoint()
    if not new_vectors.take(1):
        # every id was a re-crawl — nothing to encode, and writing
        # nothing keeps the batch dirs absent consistently on replay
        return
    if assign_arrow:
        packed = pack_encode_arrow(
            new_vectors, idx["codebooks"], vec_col=vec_col
        )
    else:
        packed = pack_codes(
            pq_encode(new_vectors, idx["codebooks"], vec_col=vec_col),
            idx["codebooks"],
        )
    assigned = _assign_cells(
        new_vectors, idx["centroids"], assign_arrow, vec_col
    )
    packed.write.mode("overwrite").parquet(
        f"{index_dir}/packed/batch={batch_id}"
    )
    assigned.write.mode("overwrite").parquet(
        f"{index_dir}/assigned/batch={batch_id}"
    )


def query_ivf_pq_index(
    vectors: DataFrame,
    queries: DataFrame,
    index_dir: str,
    k: int = 5,
    nprobe: int = 8,
    refine_factor: int = 10,
    assign_arrow: bool = False,
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k ANN against the persisted index: probe + compressed-domain
    ADC scan + exact refine against ``vectors`` (the raw corpus table —
    refine touches shortlist rows only, predicate-pushed on vec_id)."""
    idx = load_ivf_pq_index(vectors.sparkSession, index_dir)
    return ivfadc_topk(
        vectors,
        queries,
        k=k,
        nprobe=nprobe,
        centroids=idx["centroids"],
        codebooks=idx["codebooks"],
        codes_packed=idx["packed"],
        assigned=idx["assigned"],
        refine_factor=refine_factor,
        vec_col=vec_col,
        assign_arrow=assign_arrow,
    )
