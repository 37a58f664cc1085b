from .parser import parse_tags, parse_traceql  # noqa: F401
