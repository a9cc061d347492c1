"""Training-data pipeline operators (beyond the reference's surface):
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), embedding
similarity search, text analysis, multimodal plumbing."""
