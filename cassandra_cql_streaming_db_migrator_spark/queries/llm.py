from . import QueryDef

QUERIES: list[QueryDef] = []
