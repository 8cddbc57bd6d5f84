from ..registry import QuerySpec

SPECS: list[QuerySpec] = []
