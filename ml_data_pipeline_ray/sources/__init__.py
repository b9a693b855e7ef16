from .readers import (read_csv_typed, read_json_typed, read_text_lines,  # noqa: F401
                      detect_format, from_paths, write_csv)
