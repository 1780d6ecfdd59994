"""Large-scale training-data pipeline operators (engine extensions).

Beyond the reference's anomaly-detection surface, these are the
operations a 100 TB training-data pipeline needs: text analysis,
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding near-dup), similarity search (brute-force + LSH-bucketed
ANN), and multimodal (binary-column) plumbing.

Everything is native DataFrame/SQL unless genuinely impossible
(multimodal decode uses mapInPandas). Cross-engine determinism rides
on one portable primitive: ``md5`` hex parsed to int is identical in
Spark and DuckDB, so every hash-derived value is oracle-checkable.
"""

from .io import (  # noqa: F401
    jsonl_ingest_report,
    read_jsonl_corpus,
    read_text_corpus,
)
from .text import (  # noqa: F401
    tokenize,
    doc_stats,
    lang_id,
    fingerprint,
    winnow_fingerprints,
)
from .dedup import (  # noqa: F401
    exact_dedup,
    shingles,
    ngram_jaccard_pairs,
    minhash_signatures,
    minhash_lsh_pairs,
    simhash,
    embedding_near_dup,
    near_dup_clusters,
    incremental_dedup,
)
from .embed import (  # noqa: F401
    tf_embed_sparse,
    doc_cosine_topk,
)
from .index import (  # noqa: F401
    build_dedup_index,
    extend_dedup_index,
    incremental_dedup_against_index,
)
from .corpus import (  # noqa: F401
    ngram_counts,
    top_ngrams,
    corpus_filter,
    corpus_prep,
    source_stats,
    corpus_drift,
)
from .similarity import (  # noqa: F401
    with_norm,
    cosine_topk,
    ann_lsh_topk,
    ivf_topk,
    kmeans_centroids,
    topk_recall,
    knn_label_agreement,
    semantic_dedup,
    pq_topk,
    incremental_semantic_dedup,
    embedding_density,
)
from .sampling import (  # noqa: F401
    stratified_sample,
    quality_deciles,
    source_mix,
    training_order,
)
from .decontam import (  # noqa: F401
    decontaminate,
    repetition_stats,
    pii_scan,
)
from .packing import (  # noqa: F401
    pack_documents,
    pack_stats,
    pack_bins_ffd,
    chunk_documents,
    write_training_shards,
)
from .events import (  # noqa: F401
    load_events,
    user_sessions,
    event_rollup,
    session_funnel,
    props_field_stats,
    retention_cohorts,
)
from .multimodal import (  # noqa: F401
    as_binary_payload,
    decode_image,
    decode_ppm,
    extract_features,
    resize_frames,
)
