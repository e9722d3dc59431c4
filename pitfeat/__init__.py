"""pitfeat — a from-scratch PySpark-native point-in-time feature-engineering engine.

Recasts the capabilities of the reference (aakashrav/MolecularFeatureEngineering:
per-row feature extraction, fixed-width feature vectors / DATABLOCK layout,
min-max normalization with degenerate-column pruning, clustering prep) as a
temporal feature factory over tables of multi-turn conversation/agent
transcripts ``(conv_id, turn_idx, role, text, tool, ts)``.

Spark-first design: every operator is expressed with the DataFrame API so
Catalyst handles pushdown/pruning/join selection; Python appears only inside
vectorized Arrow/pandas kernels (as-of binary search, DATABLOCK re-blocking).

See SURVEY.md for the blueprint and BASELINE.md for the performance contract.
"""

from pitfeat.config import PitfeatConfig
from pitfeat.ops.asof import asof_join
from pitfeat.ops.cluster import cluster_features, score_clusters
from pitfeat.ops.dedup import (
    connected_components,
    exact_dedup,
    minhash_lsh_pairs,
    simhash_near_pairs,
)
from pitfeat.ops.ewma import ewma, ewma_time
from pitfeat.ops.intervals import interval_join
from pitfeat.ops.sampling import hash_split
from pitfeat.ops.normalize import (
    compute_moments,
    compute_quantiles,
    compute_quantiles_multi,
    normalize_minmax_grouped,
    normalize_zscore,
    normalize_zscore_grouped,
    quantile_bin,
)
from pitfeat.ops.similarity import cosine_topk, ivf_topk, knn_join, lsh_topk
from pitfeat.pipeline import Pipeline
from pitfeat.session import get_spark

__version__ = "0.6.0"

__all__ = [
    "PitfeatConfig",
    "cluster_features",
    "hash_split",
    "score_clusters",
    "get_spark",
    "Pipeline",
    "asof_join",
    "connected_components",
    "exact_dedup",
    "minhash_lsh_pairs",
    "simhash_near_pairs",
    "cosine_topk",
    "lsh_topk",
    "ivf_topk",
    "knn_join",
    "ewma",
    "interval_join",
    "ewma_time",
    "compute_moments",
    "normalize_minmax_grouped",
    "normalize_zscore",
    "normalize_zscore_grouped",
    "compute_quantiles",
    "compute_quantiles_multi",
    "quantile_bin",
    "__version__",
]
