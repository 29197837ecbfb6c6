"""Source/sink layer (SURVEY.md §2.1)."""

from .csv_sources import read_init_csv, read_init_csvs  # noqa: F401
from .doi_list import read_doi_list  # noqa: F401
from .json_sink import write_json  # noqa: F401
