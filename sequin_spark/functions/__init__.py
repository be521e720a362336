from sequin_spark.functions.path import path_function
from sequin_spark.functions.routing import route
from sequin_spark.functions.minipy import compile_expr

__all__ = ["path_function", "route", "compile_expr"]
