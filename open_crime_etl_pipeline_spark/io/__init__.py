from .readers import load_table, load_tables, read_crime_pages
from .writers import write_partitioned_crime, write_table

__all__ = [
    "load_table",
    "load_tables",
    "read_crime_pages",
    "write_partitioned_crime",
    "write_table",
]
