"""Web-scale training-data operators (dedup, similarity, text stats,
multimodal plumbing) — each SQL query dialect-paired with a DuckDB
oracle like the relational path.
"""
