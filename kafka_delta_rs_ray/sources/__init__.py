from .readers import (parse_arrow_ipc, parse_json_lines, read_changeset,
                      read_snapshot)
