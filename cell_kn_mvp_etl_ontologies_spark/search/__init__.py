from .analyzers import (
    accent_fold,
    analyze_edge_ngram,
    analyze_ngram,
    char_ngrams,
    edge_ngrams,
    text_en_no_stem_tokens,
)
from .inverted_index import build_inverted_index, build_positional_index, phrase_search
