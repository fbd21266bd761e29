"""Function helpers shared by operator builders."""

from sql2all_spark.functions.exact import davg, dsum

__all__ = ["dsum", "davg"]
