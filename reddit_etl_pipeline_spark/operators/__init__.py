from .asof import asof_join, range_join_bucketed  # noqa: F401
from .dedup import (  # noqa: F401
    connected_components,
    dedup_exact,
    doc_lines,
    duplicate_span_stats,
    exact_duplicate_groups,
    jaccard_pairs,
    line_dedup_stats,
    minhash_neardup_pairs,
    minhash_signatures,
    neardup_clusters,
    segment_dedup_stats,
    simhash_fingerprints,
    simhash_neardup_pairs,
)
from .multimodal import (  # noqa: F401
    attach_fake_media,
    decode_media,
    extract_features,
    media_byte_stats,
    resize_images,
    sample_frames,
)
from .packing import (  # noqa: F401
    chunk_manifest,
    pack_assignments,
    sequence_pack,
    shard_assignments,
    shard_manifest,
    stratified_sample,
    temperature_mix,
)
from .quality import (  # noqa: F401
    assert_not_null,
    assert_unique,
    dq_report,
    duplicate_keys,
    null_counts,
    total_nulls,
)
from .similarity import (  # noqa: F401
    cosine_topk_bruteforce,
    cosine_topk_lsh,
    embedding_neardup_exact,
    embedding_neardup_pairs,
    ivf_topk,
    knn_label_confusion,
    semantic_dedup,
)
from .clustering import kmeans_assign, kmeans_cluster_stats, kmeans_fit  # noqa: F401
from .graph import degree_stats, pagerank  # noqa: F401
from .lm import bucket_thresholds, lm_score, lm_train, perplexity_buckets  # noqa: F401
from .dsir import dsir_fit, dsir_score, dsir_select  # noqa: F401
from .bpe import bpe_segment_stats, learn_bpe_merges, word_histogram  # noqa: F401
from .skew import salted_join, two_phase_count, two_phase_distinct_count  # noqa: F401
from .text_quality import (  # noqa: F401
    contaminated_doc_ids,
    contamination_summary,
    ngram_frequency,
    repetition_stats,
    vocab_oov_stats,
    word_ngrams,
)
from .upsert import upsert_anti_join, upsert_latest_wins, upsert_window_dedup  # noqa: F401
