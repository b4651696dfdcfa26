"""Large-scale training-data pipeline operators (extension beyond the
reference's surface — BASELINE.json north-star).

Modules:
- dedup:      exact, fingerprint, MinHash+LSH, SimHash, n-gram Jaccard,
              embedding near-dup
- similarity: brute-force + IVF approximate nearest neighbor
- text:       language-ID, quality scoring, token counting, fingerprints
- multimodal: binary payload columns + Arrow-batched decode plumbing

Design rule: everything stays in native Column expressions (JVM, codegen)
except multimodal decoders, which are Arrow-batched ``mapInPandas``.
"""

from .dedup import (
    connected_components,
    decontaminate,
    dedup_exact,
    embedding_dup_pairs,
    lsh_candidate_pairs,
    dedup_keep_best,
    lsh_jaccard_pairs,
    lsh_jaccard_stats,
    minhash_dedup,
    minhash_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    prefix_jaccard_pairs,
    release_caches,
    simhash,
    simhash_pairs,
)
from .asof import asof_join
from .sampling import cap_per_group, hash_sample, sample_mask
from .sessions import session_stats, sessionize, sessionize_stream
from .skew import salted_join, skew_stats, two_phase_agg
from .similarity import cosine_topk, ivf_build, ivf_topk
from .text import (
    chunk_documents,
    fingerprint,
    lang_id,
    ngram_repetition,
    pack_sequences,
    quality_score,
    scrub_stats,
    scrub_text,
    tfidf_top_terms,
    token_count,
)

__all__ = [
    "dedup_exact",
    "decontaminate",
    "connected_components",
    "minhash_signature",
    "lsh_candidate_pairs",
    "dedup_keep_best",
    "lsh_jaccard_pairs",
    "lsh_jaccard_stats",
    "minhash_pairs",
    "minhash_dedup",
    "simhash",
    "simhash_pairs",
    "ngram_jaccard_pairs",
    "prefix_jaccard_pairs",
    "release_caches",
    "embedding_dup_pairs",
    "cosine_topk",
    "ivf_build",
    "ivf_topk",
    "sessionize",
    "session_stats",
    "sessionize_stream",
    "lang_id",
    "quality_score",
    "token_count",
    "chunk_documents",
    "scrub_text",
    "pack_sequences",
    "ngram_repetition",
    "scrub_stats",
    "fingerprint",
    "tfidf_top_terms",
    "asof_join",
    "hash_sample",
    "cap_per_group",
    "sample_mask",
    "salted_join",
    "two_phase_agg",
    "skew_stats",
]
