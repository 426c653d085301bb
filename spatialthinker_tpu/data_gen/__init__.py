from .lemma import expand_question_words, map_objects, map_relationships, normalize_token
from .pipeline import (
    build_hf_dataset,
    compute_data_stats,
    correct_count_answer,
    cross_validate,
    easy_hard_splits,
    extract_json_from_output,
    generate_questions,
    shuffle_options_deterministic,
)

__all__ = [
    "expand_question_words", "map_objects", "map_relationships", "normalize_token",
    "build_hf_dataset", "compute_data_stats", "correct_count_answer", "cross_validate",
    "easy_hard_splits", "extract_json_from_output", "generate_questions",
    "shuffle_options_deterministic",
]
