from searchlite_spark.textops.transform import (  # noqa: F401
    chunk_documents,
    pack_sequences,
    redact_pii,
)
from searchlite_spark.textops.multimodal import (  # noqa: F401
    attach_media_meta,
    extract_features,
    sample_frames,
)
from searchlite_spark.textops.sampling import (  # noqa: F401
    assign_splits,
    dsir_bucket_logratio,
    sample_n_per_stratum,
    dsir_select,
    dsir_weights,
    mixture_fractions,
    sample_by_fractions,
    sample_tokens,
)
from searchlite_spark.textops.webclean import (  # noqa: F401
    gopher_quality,
    repetition_stats,
    url_dedup,
    url_normalize,
)
from searchlite_spark.textops.dedup import (  # noqa: F401
    connected_components,
    decontaminate,
    drop_duplicated_spans,
    duplicate_window_stats,
    exact_dedup,
    line_dedup,
    minhash_dedup,
    minhash_signatures,
    minhash_lsh_pairs,
    near_dedup_survivors,
    simhash,
    simhash_near_pairs,
    ngram_jaccard_pairs,
)
from searchlite_spark.textops.similarity import (  # noqa: F401
    cosine_near_pairs,
    cosine_topk,
    hybrid_multi_topk,
    hybrid_topk,
    ivf_ann_topk,
    ivf_assign,
    ivf_assign_df,
    ivf_index_build,
    ivf_index_search,
    ivf_train,
    ivf_train_df,
    lsh_ann_topk,
    quantize_embeddings,
    quantize_query,
    quantized_cosine_topk,
    semantic_dedup,
)
from searchlite_spark.textops.quality import (  # noqa: F401
    bigram_cross_entropy,
    token_stats,
    quality_score,
    langid,
    doc_fingerprint,
    collocations_pmi,
    unigram_cross_entropy,
)
from searchlite_spark.textops.bpe import (  # noqa: F401
    bpe_encode,
    bpe_train,
    bpe_vocab,
    learn_merges,
    word_counts,
)
from searchlite_spark.textops.pca import (  # noqa: F401
    pca_project,
    pca_train,
)
from searchlite_spark.textops.extract import (  # noqa: F401
    extract_text,
    extract_text_col,
    verify_extraction,
)
from searchlite_spark.textops.pq import (  # noqa: F401
    pq_encode,
    pq_index_build,
    pq_index_search,
    pq_lut,
    pq_topk,
    pq_train,
)
