"""Large-scale data-processing operators.

The reference's signature capability is URL-level dedup (bloom filters
+ unique-index inserts, SURVEY.md §2.8); this package generalizes it to
the operators a 100 TB training-data pipeline needs:

    dedup        exact, MinHash-LSH, SimHash, n-gram Jaccard
    similarity   embedding cosine top-k (brute force + LSH-bucketed)
    textstats    language-ID, quality scores, token counts, fingerprints
    multimodal   opaque-binary column plumbing (decode stubs, metadata)

Everything is DataFrame → DataFrame, built from native column
expressions (higher-order array functions); Python only appears in
Arrow-batched ``mapInPandas`` where Spark has no primitive (multimodal
decode).
"""
