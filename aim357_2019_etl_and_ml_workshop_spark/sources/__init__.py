from .io import (
    read_csv,
    read_parquet,
    read_testdata,
    register_catalog_table,
    write_json_lines,
    write_parquet,
)

__all__ = [
    "read_csv",
    "read_parquet",
    "read_testdata",
    "register_catalog_table",
    "write_json_lines",
    "write_parquet",
]
