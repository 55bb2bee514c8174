from .values import as_string, is_sampled, with_flag

__all__ = ["as_string", "is_sampled", "with_flag"]
