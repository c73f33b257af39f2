"""CSV column ingest.

Replaces the reference's host-side createFromCSV parser (cpp/src/util.cu):
reads one column of a CSV file into a StringColumn.  Flags parity
(cpp/src/util.h:27-30): CSV_SORT_LENGTH/CSV_SORT_NAME sort options are
accepted via the API layer; NULL column entries become null rows.
"""

from __future__ import annotations

import csv as _csv

from ..column import StringColumn, from_host_strings

CSV_NULL_IS_EMPTY = 1  # util.h flags
CSV_SORT_LENGTH = 2
CSV_SORT_NAME = 4


def read_column(path: str, column: int, lines: int = 0, flags: int = 0) -> StringColumn:
    out = []
    with open(path, newline="", encoding="utf-8") as f:
        reader = _csv.reader(f)
        for i, row in enumerate(reader):
            if lines and i >= lines:
                break
            if column < len(row):
                v = row[column]
                out.append("" if v == "" and (flags & CSV_NULL_IS_EMPTY) else (v or None))
            else:
                out.append(None)
    col = from_host_strings(out)
    if flags & (CSV_SORT_LENGTH | CSV_SORT_NAME):
        from ..ops import array

        stype = ((flags & CSV_SORT_LENGTH) and 1) | ((flags & CSV_SORT_NAME) and 2)
        col = array.sort(col, stype)
    return col
