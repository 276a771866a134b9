"""Training-data pipeline operators (dedup, similarity, text stats,
multimodal plumbing) — the 100 TB-corpus operations layered next to the KG
pipeline (SURVEY §2 + engine charter)."""
