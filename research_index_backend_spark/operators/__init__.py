from .theta import contains_tag, range_bucket_join
from .upsert import upsert, assert_unique
from .exists import existence_probe, semi_anti_split
from .window_ops import group_top1, keep_first

__all__ = [
    "contains_tag", "range_bucket_join",
    "upsert", "assert_unique",
    "existence_probe", "semi_anti_split",
    "group_top1", "keep_first",
]
