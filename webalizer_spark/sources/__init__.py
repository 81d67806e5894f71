from webalizer_spark.sources.tables import TableIO, read_table, write_table

__all__ = ["TableIO", "read_table", "write_table"]
