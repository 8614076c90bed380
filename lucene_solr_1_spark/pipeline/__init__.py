"""Large-scale training-data pipeline operators over document/embedding
tables: deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard),
similarity search, text analysis, multimodal column plumbing."""
