from .queries import QUERIES, ORACLE

__all__ = ["QUERIES", "ORACLE"]
