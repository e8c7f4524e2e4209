"""Reusable relational operators.

Each module re-expresses a family from SURVEY.md §2 as generic DataFrame
transforms (lazy plans in, lazy plans out — no collect inside operators):

    joins        latest-per-key, top-n-per-key, fuzzy best-match, as-of join
    pairs        unordered self-join pairs (J7), agreement rates
    voting       the reference's analysis semantics (void anti-join, party
                 majority, loyalty, attendance, breakdowns)
    similarity   sparse cosine pairs, Gram-trick PCA (M1-M3)
    dedup        exact, n-gram Jaccard, MinHash-LSH, SimHash, SemDeDup
                 (batch + incremental-vs-index), duplicated-span
                 detection/removal
    ann          embedding similarity search (brute-force + LSH-bucketed)
    textual      language-ID, quality scoring, token counts, fingerprints
    multimodal   binary columns: sniffing, mapInPandas decode/frame stages
    docparse     document-parser UDTFs (steno-protocol state machine)
    enrich       checkpointed batch-inference stage with anti-join resume
    parliament   mp_info + tisk-bridge derived dimensions
    pagination   top-k and keyset/offset pagination
    sessionize   gap-based sessionization over event streams
"""
