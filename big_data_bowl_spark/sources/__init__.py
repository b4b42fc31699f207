from .io import STAR_TABLES, load_star, load_table, read_csv_inferred, field_grid

__all__ = ["STAR_TABLES", "load_star", "load_table", "read_csv_inferred", "field_grid"]
