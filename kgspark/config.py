"""Pipeline configuration.

Mirrors the reference's TOML config surface (reference: config.toml:1-30,
src/knowledge_graph/config.py:5-20) minus the LLM section (our extraction
kernel is deterministic and local — no HTTP).  Loaded on the driver and
captured by closure into Arrow UDFs as plain Python values.
"""

from __future__ import annotations

import dataclasses
from typing import Any

try:  # py3.11+
    import tomllib
except ImportError:  # pragma: no cover
    tomllib = None


@dataclasses.dataclass(frozen=True)
class KgConfig:
    # chunking (reference defaults config.toml chunk_size=100 overlap=20;
    # batch scripts override to 120/25: policy_kg_batch_generator.py:50-55)
    chunk_size: int = 100
    overlap: int = 20
    # phase toggles (reference: main.py:282-286 CLI overrides)
    standardization_enabled: bool = True
    inference_enabled: bool = True
    # S-6: Traditional→Simplified conversion before chunking (reference
    # data_processor.py:47-62; OFF = parity config for Simplified corpora)
    t2s_enabled: bool = False
    # deterministic stand-ins for the reference's LLM-gated branches
    # (reference flags: standardization.use_llm_for_entities,
    # inference.use_llm_for_inference — entity_standardization.py:179,240).
    # OFF by default = the parity configuration (SURVEY §7.3).
    lsh_linking_enabled: bool = False
    # O-21/O-22 deterministic community-inference stand-ins (reference
    # flag: inference.use_llm_for_inference) — OFF = parity config
    community_inference_enabled: bool = False
    # Gopher repetition-quality page filter (ops/textstats): drop
    # boilerplate/templated-spam pages before extraction.  OFF = parity
    # config (the reference has no such stage); ON for corpus-scale
    # training-data builds.
    quality_filter_enabled: bool = False
    # exact content dedup of pages before extraction (training-data
    # staple: crawl corpora carry ~25-30% byte-identical duplicates).
    # Keeps the lexicographically-smallest url per content hash —
    # deterministic regardless of partitioning.  OFF = parity config
    # (the reference has no such stage).
    page_dedup_enabled: bool = False
    # write the derived entities/edges relations as bucketed catalog
    # tables (pipeline/tables.py) so downstream analytics joins on the
    # entity key run shuffle-free.  OFF by default: bucketed writes need
    # a catalog (saveAsTable), which plain path-only deployments lack.
    bucketed_output: bool = False
    # scale knobs
    num_buckets: int = 64          # url-hash partition buckets
    salt_partitions: int = 8       # salt fan-out for hot domains
    hot_domain_threshold: int = 10_000  # pages per domain before salting
    broadcast_map_max_rows: int = 5_000_000  # entity map broadcast cutoff
    # MinHash-LSH linking parameters (scale path)
    lsh_num_hashes: int = 24
    lsh_bands: int = 8
    lsh_jaccard_threshold: float = 0.6
    # candidate verification: "jaccard" (exact token-set Jaccard) or
    # "tfidf" (corpus-IDF-weighted cosine — the north rule's named
    # alternative; downweights boilerplate tokens shared by many
    # entity names, e.g. "ltd"/"committee")
    lsh_verify: str = "jaccard"
    lsh_tfidf_threshold: float = 0.6

    @staticmethod
    def from_toml(path: str) -> "KgConfig":
        if tomllib is None:
            raise RuntimeError("tomllib unavailable")
        with open(path, "rb") as f:
            raw: dict[str, Any] = tomllib.load(f)
        chunking = raw.get("chunking", {})
        std = raw.get("standardization", {})
        inf = raw.get("inference", {})
        scale = raw.get("scale", {})
        return KgConfig(
            chunk_size=int(chunking.get("chunk_size", 100)),
            overlap=int(chunking.get("overlap", 20)),
            standardization_enabled=bool(std.get("enabled", True)),
            inference_enabled=bool(inf.get("enabled", True)),
            t2s_enabled=bool(chunking.get("t2s", False)),
            lsh_linking_enabled=bool(std.get("lsh_linking", False)),
            quality_filter_enabled=bool(raw.get("quality", {}).get("enabled", False)),
            page_dedup_enabled=bool(raw.get("quality", {}).get("page_dedup", False)),
            bucketed_output=bool(scale.get("bucketed_output", False)),
            community_inference_enabled=bool(inf.get("community_inference", False)),
            num_buckets=int(scale.get("num_buckets", 64)),
            salt_partitions=int(scale.get("salt_partitions", 8)),
            hot_domain_threshold=int(scale.get("hot_domain_threshold", 10_000)),
            broadcast_map_max_rows=int(scale.get("broadcast_map_max_rows", 5_000_000)),
            lsh_num_hashes=int(scale.get("lsh_num_hashes", 24)),
            lsh_bands=int(scale.get("lsh_bands", 8)),
            lsh_jaccard_threshold=float(scale.get("lsh_jaccard_threshold", 0.6)),
            lsh_verify=str(scale.get("lsh_verify", "jaccard")),
            lsh_tfidf_threshold=float(scale.get("lsh_tfidf_threshold", 0.6)),
        )
