from .exact import dsum, davg, sql_dsum, sql_davg
from .vectors import dot, l2_norm, cosine_sim

__all__ = ["dsum", "davg", "sql_dsum", "sql_davg", "dot", "l2_norm", "cosine_sim"]
