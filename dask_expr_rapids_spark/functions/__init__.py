from .exact import dsum, davg, dsum_expr, davg_expr, pround, pround_expr, DEC
from . import text

__all__ = ["dsum", "davg", "dsum_expr", "davg_expr", "pround", "pround_expr", "DEC", "text"]
