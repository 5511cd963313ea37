"""Training-data pipeline operators over documents/embeddings.

Beyond the reference's transform inventory: deduplication (exact,
MinHash-LSH, SimHash, n-gram Jaccard), similarity search (brute
cosine top-k, LSH-bucketed), text analysis (lang-id, quality,
tokens, fingerprints), multimodal plumbing. All hash functions are
deterministic and SQL-portable (md5-derived integers) so the DuckDB
oracle can verify them bit-for-bit.
"""
