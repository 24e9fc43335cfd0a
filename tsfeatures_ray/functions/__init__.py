from .text import text_metrics, language_id, fingerprint  # noqa: F401
from .dedup import (  # noqa: F401
    dedup_purge,
    exact_dedup,
    minhash_lsh_candidates,
    minhash_near_dups,
    minhash_near_dups_distributed,
    minhash_signatures,
    simhash_signatures,
    simhash_near_dups,
    ngram_jaccard_pairs,
)
from .similarity import (  # noqa: F401
    ann_recall,
    brute_knn,
    ivf_knn,
    lsh_bucketed_knn,
)
