from lazy_frame_spark.operators.classifier import (
    logreg_score,
    train_logreg,
)
from lazy_frame_spark.operators.decontam import (
    contamination,
    decontaminate,
    decontaminate_stream,
    eval_ngrams,
)
from lazy_frame_spark.operators.incremental import (
    agg_view_build,
    agg_view_read,
    agg_view_repair,
    agg_view_retract,
    agg_view_update,
)
from lazy_frame_spark.operators.mixing import (
    cap_per_group,
    cap_tokens_per_group,
    epoch_shuffle,
    mix_corpora,
    mix_temperature,
    rates_for_target_mix,
    release_rate_tables,
    sample_by_rates,
    sample_by_rates_df,
    temperature_rates,
    temperature_weights,
)
from lazy_frame_spark.operators.urls import (
    canonicalize_url,
    dedup_canonical_url,
    with_canonical_url,
)
from lazy_frame_spark.operators.dedup import (
    chunk_dedup,
    connected_components_star,
    dedup_against,
    duplicate_clusters,
    exact_dedup,
    incremental_near_dups,
    minhash_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    paragraph_dedup,
    release_sketches,
    simhash,
    simhash_pairs,
)
from lazy_frame_spark.operators.joins import (
    anti_join,
    asof_join,
    broadcast_dim_join,
    merge_join,
    range_join,
    salted_join,
    semi_join,
    shuffle_hash_join,
)
from lazy_frame_spark.operators.sampling import (
    deterministic_sample,
    sample,
    stratified_sample,
)
from lazy_frame_spark.operators.similarity import (
    IVFIndex,
    IVFPQIndex,
    RandomHyperplaneLSH,
    coarse_train_cosine,
    cosine_topk,
    cosine_topk_int8,
    dequantize_int8,
    embedding_near_dup_pairs,
    label_outliers,
    pq_adc_topk,
    pq_codebooks,
    pq_encode,
    pq_encode_arrow,
    pq_train,
    quantize_int8,
)
from lazy_frame_spark.operators.jpeg import decode_jpeg, encode_jpeg
from lazy_frame_spark.operators.multimodal import (
    attach_binary_payload,
    decode_audio_features,
    decode_image_features,
    decode_pixels,
    decode_png,
    decode_wav,
    encode_png,
    probe_media,
)
from lazy_frame_spark.operators.packing import bin_stats, chunk_documents, pack_sequences
from lazy_frame_spark.operators.quality import check_expectations, profile_columns
from lazy_frame_spark.operators.sketches import (
    hll_incremental_update,
    hll_partials,
    hll_rollup,
    kll_merge,
    kll_partials,
    kll_quantiles,
    theta_incremental_update,
    theta_partials,
    theta_setops,
)
from lazy_frame_spark.operators.timeseries import resample_ffill, transition_matrix
from lazy_frame_spark.operators.sorts import top_k
from lazy_frame_spark.operators.text import (
    kmin_shingle_fingerprint,
    lang_id,
    model_quality_score,
    normalized_fingerprint,
    pii_scrub,
    quality_features,
    quality_gate,
    repetition_features,
    token_count,
    vocabulary,
)

__all__ = [
    # joins
    "asof_join", "broadcast_dim_join", "range_join", "salted_join",
    "semi_join", "anti_join", "shuffle_hash_join", "merge_join",
    # sorts & sampling
    "top_k", "sample", "stratified_sample", "deterministic_sample",
    # decontamination
    "contamination", "decontaminate", "decontaminate_stream", "eval_ngrams",
    # classifier training/inference
    "train_logreg", "logreg_score",
    # mixing & training order
    "epoch_shuffle", "mix_corpora", "mix_temperature",
    "rates_for_target_mix", "release_rate_tables",
    "sample_by_rates", "sample_by_rates_df",
    "temperature_rates", "temperature_weights",
    "cap_per_group", "cap_tokens_per_group",
    # canonical-URL dedup
    "canonicalize_url", "with_canonical_url", "dedup_canonical_url",
    # incremental aggregate views
    "agg_view_build", "agg_view_update", "agg_view_read",
    "agg_view_retract", "agg_view_repair",
    # dedup
    "dedup_against", "exact_dedup",
    "minhash_signatures", "minhash_candidate_pairs", "release_sketches",
    "simhash", "simhash_pairs", "ngram_jaccard_pairs",
    "connected_components_star", "duplicate_clusters", "incremental_near_dups",
    # similarity
    "cosine_topk", "RandomHyperplaneLSH", "IVFIndex", "IVFPQIndex",
    "pq_train", "coarse_train_cosine",
    "embedding_near_dup_pairs",
    "quantize_int8", "dequantize_int8", "cosine_topk_int8",
    "pq_codebooks", "pq_encode", "pq_encode_arrow", "pq_adc_topk",
    # text
    "token_count", "quality_features", "lang_id", "model_quality_score",
    "normalized_fingerprint", "kmin_shingle_fingerprint",
    "repetition_features", "pii_scrub", "quality_gate",
    # packing
    "pack_sequences", "bin_stats", "chunk_documents", "vocabulary",
    # multimodal
    "attach_binary_payload", "probe_media", "decode_pixels", "decode_wav",
    "decode_image_features", "decode_audio_features",
    "encode_png", "decode_png", "encode_jpeg", "decode_jpeg",
    # chunk/paragraph dedup
    "chunk_dedup", "paragraph_dedup",
    # sketches
    "hll_partials", "hll_rollup", "hll_incremental_update",
    "theta_partials", "theta_setops", "theta_incremental_update",
    "kll_partials", "kll_merge", "kll_quantiles",
    # data quality
    "profile_columns", "check_expectations",
    # time series
    "resample_ffill", "transition_matrix",
    # embedding analytics
    "label_outliers",
]
