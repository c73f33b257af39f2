"""Timestamp parse/format ops.

Re-design of cpp/src/strings/datetime.cu (timestamp2long:351,
long2timestamp:639): a tiny strptime/strftime subset with specifiers
%Y %y %m %d %H %I %p %M %S %f %z %j and 9 time units
(docs/source/datetime.md).  Default format "%Y-%m-%dT%H:%M:%SZ"
(datetime.cu default).

Fixed-width formats (the common case, incl. the default) parse fully ON
DEVICE: positional digit gathers + vectorized civil-date math
(timestamp2int_device).  %z is fixed +HHMM per datetime.cu:84; only
unknown specifiers fall back to the host
format program.
"""

from __future__ import annotations

import datetime as _dt

import jax
import jax.numpy as jnp
import numpy as np

from ..column import StringColumn, from_host_strings, to_host_strings

DEFAULT_FORMAT = "%Y-%m-%dT%H:%M:%SZ"

_EPOCH = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)

_UNITS_PER_SEC = {
    "s": 1,
    "ms": 1000,
    "us": 1000000,
    "ns": 1000000000,
}


def _compile(fmt: str):
    """Format string -> list of (kind, literal) items
    (mirrors DTFormatCompiler, datetime.cu:43-160)."""
    items = []
    i = 0
    while i < len(fmt):
        c = fmt[i]
        if c == "%" and i + 1 < len(fmt):
            items.append(("spec", fmt[i + 1]))
            i += 2
        else:
            items.append(("lit", c))
            i += 1
    return items


_SPEC_LEN = {
    "Y": 4, "y": 2, "m": 2, "d": 2, "H": 2, "I": 2, "M": 2, "S": 2,
    "f": 6, "j": 3, "p": 2, "z": 5,
}


def _parse_one(s: str, items) -> int | None:
    """Parse one string to epoch seconds (+ fractional microseconds)."""
    pos = 0
    Y, mo, d, H, M, S = 1970, 1, 1, 0, 0, 0
    us = 0
    pm = None
    tz_off = 0
    doy = None
    for kind, v in items:
        if kind == "lit":
            pos += 1
            continue
        if v == "z":
            if pos < len(s) and s[pos] in "+-":
                sign = -1 if s[pos] == "-" else 1
                hh = int(s[pos + 1 : pos + 3] or 0)
                mm = int(s[pos + 3 : pos + 5] or 0)
                # reference ADDS the offset (datetime.cu:308-318)
                tz_off = -sign * (hh * 3600 + mm * 60)
                pos += 5
            continue
        ln = _SPEC_LEN.get(v, 2)
        field = s[pos : pos + ln]
        pos += ln
        if v == "Y":
            Y = int(field)
        elif v == "y":
            Y = 2000 + int(field) if int(field) < 69 else 1900 + int(field)
        elif v == "m":
            mo = int(field)
        elif v == "d":
            d = int(field)
        elif v == "H":
            H = int(field)
        elif v == "I":
            H = int(field)
        elif v == "M":
            M = int(field)
        elif v == "S":
            S = int(field)
        elif v == "f":
            us = int(field.ljust(6, "0")[:6])
        elif v == "p":
            pm = field.upper() == "PM"
        elif v == "j":
            doy = int(field)
    if pm is not None:
        if pm and H < 12:
            H += 12
        elif not pm and H == 12:
            H = 0
    if doy is not None:
        base = _dt.datetime(Y, 1, 1, H, M, S, us, _dt.timezone.utc)
        when = base + _dt.timedelta(days=doy - 1)
    else:
        when = _dt.datetime(Y, mo, d, H, M, S, us, _dt.timezone.utc)
    total_us = int((when - _EPOCH).total_seconds() * 1000000) - tz_off * 1000000
    # rounding cleanup: timedelta is exact for these ranges
    total_us = (
        int((when - _EPOCH) / _dt.timedelta(microseconds=1))
        - tz_off * 1000000
    )
    return total_us


def _to_units(total_us: int, units: str, when=None) -> int:
    if units in _UNITS_PER_SEC:
        return total_us * _UNITS_PER_SEC[units] // 1000000
    # calendar units
    when = _EPOCH + _dt.timedelta(microseconds=total_us)
    if units == "Y":
        return when.year - 1970
    if units == "M":
        return (when.year - 1970) * 12 + (when.month - 1)
    if units == "D":
        return total_us // (86400 * 1000000)
    if units == "h":
        return total_us // (3600 * 1000000)
    if units == "m":
        return total_us // (60 * 1000000)
    raise ValueError(f"unknown units {units!r}")


def _fixed_layout(items):
    """Static (spec, position) layout when every item is fixed-width;
    None when %z or unknown specs make positions dynamic."""
    pos = 0
    layout = []
    for kind, v in items:
        if kind == "lit":
            pos += 1
            continue
        ln = _SPEC_LEN.get(v)
        if ln is None:
            return None
        layout.append((v, pos, ln))
        pos += ln
    return layout


def _days_from_civil(y, m, d):
    """Vectorized civil date -> days since 1970-01-01 (Hinnant algorithm)."""
    y = y - (m <= 2)
    era = jnp.floor_divide(y, 400)
    yoe = y - era * 400
    mp = jnp.where(m > 2, m - 3, m + 9)
    doy = (153 * mp + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return era * 146097 + doe - 719468


def timestamp2int_device(col: StringColumn, layout, units: str) -> jax.Array:
    """Device parse for fixed-width formats: positional digit gathers +
    vectorized civil-date math (the compiled-format fast path replacing
    datetime.cu's per-thread parser)."""
    from .convert import _require_x64

    _require_x64()
    mat, lens = _char_mat_dt(col)

    def field(pos, ln):
        v = jnp.zeros(col.size, jnp.int64)
        for k in range(ln):
            c = mat[:, min(pos + k, mat.shape[1] - 1)]
            dig = jnp.clip(c - ord("0"), 0, 9).astype(jnp.int64)
            v = v * 10 + dig
        return v

    Y = jnp.full(col.size, 1970, jnp.int64)
    mo = jnp.ones(col.size, jnp.int64)
    d = jnp.ones(col.size, jnp.int64)
    H = jnp.zeros(col.size, jnp.int64)
    M = jnp.zeros(col.size, jnp.int64)
    S = jnp.zeros(col.size, jnp.int64)
    us = jnp.zeros(col.size, jnp.int64)
    tzmin = jnp.zeros(col.size, jnp.int64)
    pm = None
    doy = None
    for v, pos, ln in layout:
        if v == "z":
            # fixed +HHMM (datetime.cu:84 {'z',5}; parse at :261-270).
            # NB the reference ADDS the offset to the timestamp
            # (datetime.cu:308-318) — mirrored verbatim for parity.
            sc = mat[:, min(pos, mat.shape[1] - 1)]
            sign = jnp.where(sc == ord("-"), -1, 1).astype(jnp.int64)
            hh = field(pos + 1, 2)
            mm = field(pos + 3, 2)
            tzmin = sign * (hh * 60 + mm)
            continue
        f = field(pos, ln)
        if v == "Y":
            Y = f
        elif v == "y":
            Y = jnp.where(f < 69, 2000 + f, 1900 + f)
        elif v == "m":
            mo = f
        elif v == "d":
            d = f
        elif v in ("H", "I"):
            H = f
        elif v == "M":
            M = f
        elif v == "S":
            S = f
        elif v == "f":
            us = f
        elif v == "j":
            doy = f
        elif v == "p":
            c = mat[:, min(pos, mat.shape[1] - 1)]
            pm = (c == ord("P")) | (c == ord("p"))
    if pm is not None:
        H = jnp.where(pm & (H < 12), H + 12, jnp.where(~pm & (H == 12), 0, H))
    if doy is not None:
        days = _days_from_civil(Y, jnp.ones_like(Y), jnp.ones_like(Y)) + doy - 1
    else:
        days = _days_from_civil(Y, mo, d)
    total_us = (
        ((days * 24 + H) * 60 + M) * 60 * 1000000 + S * 1000000 + us
        + tzmin * 60 * 1000000
    )
    if units in _UNITS_PER_SEC:
        out = total_us * _UNITS_PER_SEC[units] // 1000000
    elif units == "Y":
        out = Y - 1970
    elif units == "M":
        out = (Y - 1970) * 12 + (mo - 1)
    elif units == "D":
        out = days
    elif units == "h":
        # C truncating division (datetime.cu:311 tzadjust/60)
        out = days * 24 + H + jnp.sign(tzmin) * (jnp.abs(tzmin) // 60)
    elif units == "m":
        out = (days * 24 + H) * 60 + M + tzmin
    else:
        raise ValueError(f"unknown units {units!r}")
    return jnp.where(col.validity & (col.lengths() > 0), out, 0)


def _char_mat_dt(col: StringColumn):
    from . import layout as L

    w = max(L.max_row_bytes(col), 1)
    return L.padded_view(col, w).astype(jnp.int32), col.lengths()


def timestamp2int(
    col: StringColumn, fmt: str | None = None, units: str = "s"
) -> jax.Array:
    items = _compile(fmt or DEFAULT_FORMAT)
    lay = _fixed_layout(items)
    if lay is not None:
        return timestamp2int_device(col, lay, units)
    out = []
    for s in to_host_strings(col):
        if s is None or s == "":
            out.append(0)
            continue
        try:
            out.append(_to_units(_parse_one(s, items), units))
        except (ValueError, IndexError):
            out.append(0)
    return jnp.asarray(np.asarray(out, np.int64))


def int2timestamp(
    values, units: str = "s", fmt: str | None = None, nulls=None
) -> StringColumn:
    from .convert import _valid_from_bitmask

    items = _compile(fmt or DEFAULT_FORMAT)
    valid = _valid_from_bitmask(nulls, len(values))
    from .format_k import int2timestamp_device

    # device path (datetime.cu long2timestamp:639); _format_one stays as
    # the host oracle for tests
    return int2timestamp_device(np.asarray(values), units, items, valid)


def _format_one(v: int, units: str, items) -> str:
    if units in _UNITS_PER_SEC:
        us = v * (1000000 // _UNITS_PER_SEC[units])
        when = _EPOCH + _dt.timedelta(microseconds=us)
    elif units == "Y":
        when = _dt.datetime(1970 + v, 1, 1, tzinfo=_dt.timezone.utc)
    elif units == "M":
        when = _dt.datetime(1970 + v // 12, 1 + v % 12, 1, tzinfo=_dt.timezone.utc)
    elif units == "D":
        when = _EPOCH + _dt.timedelta(days=v)
    elif units == "h":
        when = _EPOCH + _dt.timedelta(hours=v)
    elif units == "m":
        when = _EPOCH + _dt.timedelta(minutes=v)
    else:
        raise ValueError(f"unknown units {units!r}")
    out = []
    for kind, spec in items:
        if kind == "lit":
            out.append(spec)
            continue
        if spec == "Y":
            out.append(f"{when.year:04d}")
        elif spec == "y":
            out.append(f"{when.year % 100:02d}")
        elif spec == "m":
            out.append(f"{when.month:02d}")
        elif spec == "d":
            out.append(f"{when.day:02d}")
        elif spec == "H":
            out.append(f"{when.hour:02d}")
        elif spec == "I":
            h = when.hour % 12
            out.append(f"{12 if h == 0 else h:02d}")
        elif spec == "M":
            out.append(f"{when.minute:02d}")
        elif spec == "S":
            out.append(f"{when.second:02d}")
        elif spec == "f":
            out.append(f"{when.microsecond:06d}")
        elif spec == "p":
            out.append("PM" if when.hour >= 12 else "AM")
        elif spec == "j":
            out.append(f"{when.timetuple().tm_yday:03d}")
        elif spec == "z":
            out.append("+0000")
        else:
            out.append(spec)
    return "".join(out)
