from pydi_spark.functions.joins import (
    asof_join,
    edit_distance_join,
    grid_distance_join,
    interval_overlap_join,
    range_join,
    salted_join,
)
from pydi_spark.functions.phonetic import PhoneticBlocker, soundex_key, soundex_sql
from pydi_spark.functions.ranks import (
    global_row_number,
    global_running_sum,
    rank_normalize,
    top_k_per_group,
)
from pydi_spark.functions.similarity import (
    NATIVE_METRICS,
    PY_METRICS,
    list_metrics,
    similarity,
    token_similarity,
)
from pydi_spark.functions.tokenize import char_ngrams, word_tokens

__all__ = [
    "NATIVE_METRICS",
    "PY_METRICS",
    "asof_join",
    "edit_distance_join",
    "global_row_number",
    "global_running_sum",
    "grid_distance_join",
    "interval_overlap_join",
    "rank_normalize",
    "top_k_per_group",
    "PhoneticBlocker",
    "soundex_key",
    "soundex_sql",
    "char_ngrams",
    "list_metrics",
    "salted_join",
    "similarity",
    "token_similarity",
    "word_tokens",
]
