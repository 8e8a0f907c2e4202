"""Large-scale training-data operations over document/embedding tables.

First-class components beyond the reference's operator set: exact and
near deduplication, similarity search, text analysis, multimodal
plumbing — each expressed Ray-Data-first (vectorized map_batches,
combiner-before-shuffle, broadcast small sides).
"""
