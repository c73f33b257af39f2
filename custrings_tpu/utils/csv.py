"""CSV column ingest.

Replaces the reference's host-side createFromCSV parser (cpp/src/util.cu):
reads one column of a CSV file into a StringColumn.  Parity quirk: the
reference parser only uses quotes to shield commas and strips the OUTER
quote pair — doubled quotes inside a field are kept verbatim (see
python/tests/test_memory.py expectations with ""Not Found"").
Flags (cpp/src/util.h:27-30): CSV_NULL_IS_EMPTY, CSV_SORT_LENGTH,
CSV_SORT_NAME.
"""

from __future__ import annotations

from ..column import StringColumn, from_host_strings

# util.h:27-29 flag values (round-3 fix: these previously used made-up
# values; the reference's are SORT_LENGTH=1, SORT_NAME=2, NULL_IS_EMPTY=8,
# and sorttype = flags & 3 passes straight through, util.cu:164)
CSV_SORT_LENGTH = 1
CSV_SORT_NAME = 2
CSV_NULL_IS_EMPTY = 8


def _split_line(line: str) -> list[str]:
    """Naive quote-aware comma split matching util.cu createFromCSV."""
    fields = []
    cur = []
    in_quotes = False
    i = 0
    n = len(line)
    while i < n:
        c = line[i]
        if c == '"':
            in_quotes = not in_quotes
            cur.append(c)
        elif c == "," and not in_quotes:
            fields.append("".join(cur))
            cur = []
        else:
            cur.append(c)
        i += 1
    fields.append("".join(cur))
    out = []
    for f in fields:
        if len(f) >= 2 and f[0] == '"' and f[-1] == '"':
            f = f[1:-1]
        out.append(f)
    return out


def read_column(path: str, column: int, lines: int = 0, flags: int = 0) -> StringColumn:
    out = []
    with open(path, newline="", encoding="utf-8") as f:
        for i, raw in enumerate(f):
            if i == 0:
                # util.cu:68-80 records offsets only AFTER each newline, so
                # the first line (header) is never part of the result
                continue
            if lines and i > lines:
                break
            row = _split_line(raw.rstrip("\r\n"))
            if column < len(row):
                v = row[column]
                if v == "":
                    out.append("" if (flags & CSV_NULL_IS_EMPTY) else None)
                else:
                    out.append(v)
            else:
                out.append(None)
    col = from_host_strings(out)
    if flags & (CSV_SORT_LENGTH | CSV_SORT_NAME):
        from ..ops import array

        col = array.sort(col, flags & (CSV_SORT_LENGTH | CSV_SORT_NAME))
    return col
