from .text import (  # noqa: F401
    bm25_score,
    chunk_documents,
    cross_source_ppl,
    decontaminate,
    decontaminate_ngrams,
    fingerprint,
    language_id,
    redact,
    repetition_score,
    text_metrics,
    tfidf_stats,
    trigram_logppl,
)
from .sampling import (  # noqa: F401
    deterministic_sample,
    deterministic_sample_n,
    hash_split,
    stratified_sample,
    weighted_mixture,
)
from .pack import pack_sequences  # noqa: F401
from .dedup import (  # noqa: F401
    dedup_purge,
    exact_dedup,
    minhash_lsh_candidates,
    minhash_near_dups,
    minhash_near_dups_distributed,
    minhash_signatures,
    simhash_signatures,
    simhash_near_dups,
    jaccard_near_dups,
    ngram_jaccard_pairs,
)
from .dedup import containment_pairs  # noqa: F401
from .spans import duplicated_span_stats  # noqa: F401
from .spectral import periodogram_probe  # noqa: F401
from .survivorship import golden_record  # noqa: F401
from .concurrency import interval_concurrency, interval_coverage  # noqa: F401
from .drift import distribution_drift  # noqa: F401
from .fuzzy import edit1_pairs  # noqa: F401
from .stats import (  # noqa: F401
    anova_eta2,
    benford_audit,
    chi2_independence,
    gini_coefficient,
    kaplan_meier,
    ks_exponential,
    ks_two_sample,
    mann_whitney_u,
    mutual_information,
    pareto_abc,
)
from .graph import (  # noqa: F401
    connected_components,
    dedup_components,
    pagerank,
    triangle_count,
)
from .events import (  # noqa: F401
    cohort_retention,
    funnel_conversion,
    scd2_build,
    session_attribution,
)
from .temporal_join import asof_join, interval_join, range_join  # noqa: F401
from .grouped import (  # noqa: F401
    grouped_agg,
    grouped_corr,
    grouped_quantiles,
    grouped_regr,
    grouped_top_k,
    grouped_trimmed_mean,
    winsorize,
)
from .sketches import approx_top_tokens, distinct_overlap  # noqa: F401
from .changepoint import cusum_changepoint  # noqa: F401
from .windows import (  # noqa: F401
    align_locf_corr,
    interpolate_gaps,
    lagged_corr,
    rolling_agg,
    rolling_corr,
    rolling_zscore,
    hampel_outliers,
    run_length_stats,
    seasonal_naive_error,
    time_weighted_avg,
    ewma,
)
from .similarity import (  # noqa: F401
    ann_recall,
    hard_negatives,
    brute_knn,
    ivf_knn,
    kmeans_cluster,
    kmeans_fit,
    knn_purity,
    lsh_bucketed_knn,
    mutual_top1,
    semantic_dedup,
)
