"""DataFrame → DataFrame operators (SURVEY §2.3–§2.7 + LLM-pipeline ops)."""

from wp_etl_migration_spark.operators.prefix import (  # noqa: F401
    prefix_all,
    select_prefix,
    strip_prefix,
    unpack_prefixed,
)
from wp_etl_migration_spark.operators.rename import (  # noqa: F401
    snake_case,
    scrub_name,
    rename_snake_scrub,
    rename_regex_replace,
)
from wp_etl_migration_spark.operators.cleaning import (  # noqa: F401
    string_to_null,
)
from wp_etl_migration_spark.operators.melt import (  # noqa: F401
    melt,
    melt_meta,
)
from wp_etl_migration_spark.operators.dedup import (  # noqa: F401
    contamination,
    cross_corpus_exact_dedup,
    dedup_documents,
    exact_dedup,
    incremental_lsh_pairs,
    line_dedup,
    lsh_bands,
    ngram_jaccard_pairs,
    minhash_signatures,
    minhash_lsh_pairs,
    purge_index,
    tombstone_index,
)
from wp_etl_migration_spark.operators.lm import (  # noqa: F401
    bigram_counts,
    lm_score,
    lm_score_ngram,
    ngram_counts,
)
from wp_etl_migration_spark.operators.bpe import (  # noqa: F401
    encode_bpe,
    train_bpe,
)
from wp_etl_migration_spark.operators.fuzzy import (  # noqa: F401
    fuzzy_join,
    fuzzy_self_join,
)
from wp_etl_migration_spark.operators.plancheck import (  # noqa: F401
    assert_scalable,
    audit_plan,
)
from wp_etl_migration_spark.operators.textstats import (  # noqa: F401
    chunk_documents,
    extract_keywords,
    gopher_rules,
    lang_id,
    quality_score,
    remove_shared_passages,
    repetition_stats,
    script_fractions,
    shared_gram_stats,
    vocab_build,
)
from wp_etl_migration_spark.operators.gates import (  # noqa: F401
    apply_gates,
)
from wp_etl_migration_spark.operators.graph import (  # noqa: F401
    connected_components,
    dedup_keep_list,
)
from wp_etl_migration_spark.operators.sampling import (  # noqa: F401
    assign_splits,
    global_shuffle,
    hash_sample,
    mix_corpora,
    stratified_hash_sample,
    weighted_hash_sample,
)
from wp_etl_migration_spark.operators.profile import (  # noqa: F401
    corpus_report,
    key_skew_profile,
    profile_table,
)
from wp_etl_migration_spark.operators.pii import (  # noqa: F401
    pii_counts,
    scrub_pii,
)
from wp_etl_migration_spark.operators.simhash import (  # noqa: F401
    simhash_signatures,
    simhash_near_dup,
)
from wp_etl_migration_spark.operators.similarity import (  # noqa: F401
    build_ann_index,
    cosine_topk,
    cosine_topk_lsh,
    embedding_contamination,
    embedding_near_dup,
    ivf_topk,
    kmeans_centroids,
    quantize_embeddings,
    query_ann_index,
    random_projection,
    seeded_planes,
    semantic_dedup,
    validate_planes,
)
from wp_etl_migration_spark.operators.classifier import (  # noqa: F401
    load_classifier,
    save_classifier,
    score_text_classifier,
    train_text_classifier,
)
from wp_etl_migration_spark.operators.multimodal import (  # noqa: F401
    attach_binary,
    extract_features,
    decode_media,
    resize_media,
    sample_frames,
)
from wp_etl_migration_spark.operators.merge import (  # noqa: F401
    merge_upsert,
    cascaded_lookup,
)
from wp_etl_migration_spark.operators.hierarchy import (  # noqa: F401
    resolve_paths,
)
