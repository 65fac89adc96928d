from .readers import (parse_json_lines, read_changeset,
                      read_snapshot)
