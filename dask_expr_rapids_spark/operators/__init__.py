from .frame import INDEX, GroupBy, Series, SparkFrame
from .accessors import DatetimeMethods, StringMethods

__all__ = ["INDEX", "GroupBy", "Series", "SparkFrame", "DatetimeMethods", "StringMethods"]
