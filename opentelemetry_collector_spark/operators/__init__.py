from .parse import parse_pages, ACCESS_RE, APPLOG_RE

__all__ = ["parse_pages", "ACCESS_RE", "APPLOG_RE"]
