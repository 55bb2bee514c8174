from .pages import generate_pages_pandas, synthesize_pages, write_pages
from .lookups import lkp_lang, lkp_geo, lkp_severity

__all__ = [
    "generate_pages_pandas",
    "synthesize_pages",
    "write_pages",
    "lkp_lang",
    "lkp_geo",
    "lkp_severity",
]
