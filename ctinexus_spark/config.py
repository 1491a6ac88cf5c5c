"""Pipeline configuration.

Replaces the reference's hydra/omegaconf config tree
(reference: ctinexus/config/config.yaml:1-39, app.py:69-73) with a
plain frozen dataclass that ships to executors via closure capture —
no external config framework needed for `spark-submit --py-files`.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PipelineConfig:
    # EA merge threshold (reference config.yaml:14 `similarity_threshold: 0.6`)
    similarity_threshold: float = 0.6
    # kNN demonstration retrieval (reference config.yaml:26-30: shot 3, asc)
    shot: int = 3
    demo_permutation: str = "asc"  # "asc" reverses the ranked top-k
    retriever: str = "kNN"  # kNN | rand | fixed
    # EA cluster mode: "star" replicates the reference's overlapping
    # star-sets (graph_constructor.py:394-436); "cc" uses connected
    # components over the >=threshold similarity graph (north_star).
    ea_cluster_mode: str = "star"
    # Deterministic stub model knobs (no-network build).
    embedding_dim: int = 64
    # Relation label the stub link-predictor emits.
    lp_relation: str = "related-to"
    # Salting fan-out for hot-domain skew on heavy groupBys.
    skew_salt_buckets: int = 32
    # Arrow batch sizing for pandas UDFs.
    arrow_batch_rows: int = 10_000
    # Cap applied by merge_extraction_candidates / build_cti_focus_text.
    merge_max_chars: int = 16_000
    focus_max_chars: int = 10_000
    # Lexicon-based stub extraction (term -> entity class). Empty map
    # means "CTI mode": IOC regex extraction drives the stub.
    lexicon: dict[str, str] = field(default_factory=dict)
    random_seed: int = 42


DEFAULT_CONFIG = PipelineConfig()
