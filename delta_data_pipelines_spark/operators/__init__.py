"""Large-scale data-processing operators.

The reference's signature capability is URL-level dedup (bloom filters
+ unique-index inserts, SURVEY.md §2.8); this package generalizes it to
the operators a 100 TB training-data pipeline needs:

    dedup        exact, MinHash-LSH, SimHash, n-gram Jaccard,
                 embedding-cosine near-dup
    similarity   embedding cosine top-k (brute force, sign-LSH, IVF)
    textstats    language-ID, quality scores, token counts, fingerprints
    multimodal   opaque-binary column plumbing (decode/resize/frame
                 stubs, metadata)
    temporal     as-of + range joins (union+window formulation)
    membership   bloom prefilter (two-phase with the exact anti-join)
    enums        broadcast mapping-table lookups
    scale        skew-salted joins, bucketed co-located joins

Everything is DataFrame → DataFrame, built from native column
expressions (higher-order array functions); Python only appears in
Arrow-batched ``mapInPandas`` where Spark has no primitive (multimodal
decode).
"""
