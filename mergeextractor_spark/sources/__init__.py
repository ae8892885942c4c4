from .fixtures import table, TABLE_NAMES

__all__ = ["table", "TABLE_NAMES"]
