from .quality import TokenCount, QualityStats, QualityFilter, LangId, Fingerprint, RepetitionStats, skipgram_pairs, top_tokens, tfidf_top_terms  # noqa: F401
from .dedup import exact_dedup, minhash_lsh_pairs, near_dedup, ngram_jaccard_pairs, simhash_pairs, embedding_near_dup, decontaminate  # noqa: F401
from .ann import knn_brute, knn_ivf, knn_lsh, train_ivf  # noqa: F401
from .redact import RedactPII, chunk_documents  # noqa: F401
