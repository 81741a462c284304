"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k as the correctness baseline (broadcast the small
query set against the corpus — a broadcast nested-loop join, linear in
corpus size), and a random-hyperplane LSH bucketed variant as the scale
path (equi-join on bucket id, so candidate generation is bucketed rather
than all-pairs).

Net-new surface per the builder brief; vector math uses built-in
higher-order functions (``zip_with``/``aggregate``) — JVM-side, no UDFs.
"""

from gofast_spark.sim.cosine import cosine_sim, cosine_topk, l2_norm
from gofast_spark.sim.projection import jl_project, jl_shortlist_topk, jl_sign_matrix
from gofast_spark.sim.ivf import (
    assign_cells,
    ivf_topk,
    ivf_topk_kmeans_exact,
    ivf_topk_portable,
    train_centroids,
)
from gofast_spark.sim.pq import pq_codebook, pq_encode, pq_topk
from gofast_spark.sim.lsh import cosine_near_dup_pairs, hyperplane_bucket, lsh_topk

__all__ = [
    "jl_project",
    "jl_shortlist_topk",
    "jl_sign_matrix",
    "cosine_sim",
    "cosine_topk",
    "l2_norm",
    "hyperplane_bucket",
    "lsh_topk",
    "cosine_near_dup_pairs",
    "train_centroids",
    "assign_cells",
    "pq_codebook",
    "pq_encode",
    "pq_topk",
    "ivf_topk",
    "ivf_topk_kmeans_exact",
    "ivf_topk_portable",
]
