"""Large-scale training-data operations over ray.data Datasets:
deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard), text
analysis (tokens, quality, language-ID, fingerprints), and
similarity search over embedding columns."""
