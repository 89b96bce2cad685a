from .testdata import load_table, load_tables  # noqa: F401
