from .readers import read_csv_typed, read_text_lines, detect_format, write_csv  # noqa: F401
