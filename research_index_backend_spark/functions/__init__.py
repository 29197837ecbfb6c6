from .doi import DOI_PATTERN, normalize_doi, valid_doi
from .text import clean_html_col, clean_html_py, normalize_text_udf
from .names import (
    split_names_cols, name_similarity, name_similarity_udf, full_name_col,
)

__all__ = [
    "DOI_PATTERN", "normalize_doi", "valid_doi",
    "clean_html_col", "clean_html_py", "normalize_text_udf",
    "split_names_cols", "name_similarity", "name_similarity_udf", "full_name_col",
]
