"""Large-scale data-processing operators.

The reference's signature capability is URL-level dedup (bloom filters
+ unique-index inserts, SURVEY.md §2.8); this package generalizes it to
the operators a 100 TB training-data pipeline needs:

    dedup        exact, MinHash-LSH, SimHash, n-gram Jaccard,
                 embedding-cosine near-dup, prefix-filter containment,
                 connected-components clustering
    similarity   embedding cosine top-k (brute force, sign-LSH, IVF),
                 radius search, deterministic spherical k-means
    textstats    language-ID, quality scores, token counts,
                 fingerprints, PII scrub, unigram-LM scoring
    sketches     mergeable KMV distinct counts, binned-histogram
                 quantiles
    sampling     deterministic splits/samples, stratified + temperature
                 mixing, weighted interleave, token-budget allocation
    ranking      range-partitioned global/grouped ranks, prefix sums,
                 chunk spans (sequence packing)
    multimodal   opaque-binary column plumbing (decode/resize/frame
                 stubs, metadata; vendored PNG header decode)
    temporal     as-of + range joins (union+window formulation), SCD2
    membership   bloom prefilter (two-phase with the exact anti-join)
    enums        broadcast mapping-table lookups
    scale        skew-salted joins, bucketed co-located joins, Z-order
                 layout

Everything is DataFrame → DataFrame, built from native column
expressions (higher-order array functions); Python only appears in
Arrow-batched ``mapInPandas`` where Spark has no primitive (multimodal
decode).
"""
