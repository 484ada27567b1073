from .tables import TABLES, load_table, load_tables, read_csv, read_json, read_parquet, to_json, to_parquet, from_pandas, timeseries

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "read_csv",
    "read_json",
    "read_parquet",
    "to_json",
    "to_parquet",
    "from_pandas",
    "timeseries",
]
