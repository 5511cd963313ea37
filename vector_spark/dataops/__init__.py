"""Training-data pipeline operators over documents/embeddings.

Beyond the reference's transform inventory: deduplication (exact,
MinHash-LSH, SimHash, n-gram Jaccard), similarity search (brute
cosine top-k, LSH-bucketed, IVF), text analysis (lang-id, quality,
tokens, fingerprints), Gopher-rule quality filtering (quality.py),
PII detection + redaction (pii.py), benchmark decontamination
(decontam.py), and multimodal plumbing with real pure-numpy media
kernels for PPM/BMP/WAV (media_codecs.py). All hash functions are
deterministic and SQL-portable (md5-derived integers) so the DuckDB
oracle can verify them bit-for-bit.
"""
