"""Canonical literal lexical forms.

Reproduces the observable literal formatting of a JS-based processor:
canonical ``xsd:double`` (ECMAScript ``toExponential(15)`` collapsed to the
``1.23E4`` XSD canonical form; cf. /root/reference/lib/toRdf.js:300-306),
canonical ``xsd:integer`` (``toFixed(0)``; toRdf.js:307-309), and RFC 8785
(JCS) canonical JSON for ``@json`` literals (toRdf.js:9,294-296) including
ES6 shortest-round-trip number serialization."""

from __future__ import annotations

import json
import math


def canonical_double(value: float) -> str:
    """Double canonical form exactly as the reference computes it
    (toRdf.js:305: ``toExponential(15).replace(/(\\d)0*e\\+?/, '$1E')``,
    V8-checked): trailing mantissa zeros collapse but AT LEAST ONE
    fractional digit survives (``0.1`` → ``1.0E-1``, ``5`` → ``5.0E0``),
    and ``-0`` loses its sign like JS toExponential."""
    value = float(value)
    if math.isnan(value):
        return "NaN"
    if math.isinf(value):
        # JS (Infinity).toExponential(15) === 'Infinity' and the
        # reference's regex leaves it untouched — reachable through
        # parseFloat('Infinity') under an xsd:double-coerced term
        return "Infinity" if value > 0 else "-Infinity"
    mant, _, exp = f"{value:.15e}".partition("e")
    if value == 0:
        mant = mant.lstrip("-")  # JS (-0).toExponential drops the sign
    mant = mant.rstrip("0")
    if mant.endswith("."):
        # the regex's captured digit keeps one zero when the whole
        # fractional part was zeros
        mant += "0"
    return f"{mant}E{int(exp)}"


_PARSE_FLOAT_RE = None


def js_parse_float(s) -> float:
    """ES ``parseFloat``: skip leading whitespace, parse the LONGEST
    valid decimal-literal prefix ('Infinity' allowed, hex not), NaN
    when none — so ``parseFloat('leaf')`` is NaN, ``'3e'`` is 3,
    ``'  +.5x'`` is 0.5 (cf. reference toRdf.js:300-303, which funnels
    every non-double value with an xsd:double datatype through it)."""
    global _PARSE_FLOAT_RE
    if _PARSE_FLOAT_RE is None:
        import re
        _PARSE_FLOAT_RE = re.compile(
            r"[+-]?(?:Infinity|\d+\.?\d*(?:[eE][+-]?\d+)?"
            r"|\.\d+(?:[eE][+-]?\d+)?)")
    if not isinstance(s, str):
        try:
            return float(s)
        except (TypeError, ValueError):
            return float("nan")
    m = _PARSE_FLOAT_RE.match(s.lstrip())
    if not m:
        return float("nan")
    return float(m.group(0))


def canonical_integer(value) -> str:
    """ES ``Number.prototype.toFixed(0)`` (cf. reference toRdf.js:308):
    the sign is extracted first, then the magnitude rounds half-up — so
    ``-1e-7`` serializes as ``"-0"`` and ``-1.5`` as ``"-2"`` (checked
    against V8). ``math.modf`` decomposes the double exactly, avoiding
    the float ``x + 0.5`` misround near ties."""
    f = float(value)
    sign = "-" if f < 0 else ""
    frac, whole = math.modf(abs(f))
    return sign + str(int(whole) + (1 if frac >= 0.5 else 0))


def es6_number_str(value) -> str:
    """ECMAScript Number::toString(10) for JSON numbers (RFC 8785 §3.2.2.3)."""
    if isinstance(value, int) and not isinstance(value, bool):
        return str(value)
    f = float(value)
    if f == 0:
        return "0"
    if f != f or math.isinf(f):
        raise ValueError("NaN/Infinity not allowed in JSON")
    if f.is_integer() and abs(f) < 9007199254740992.0:  # < 2^53
        # exact and shortest coincide below 2^53; above it ES pads the
        # SHORTEST digits with zeros (1.2345678901234568e20 →
        # "123456789012345680000", not the exact ...683968)
        return str(int(f))
    # shortest round-trip digits from repr, then ES6 placement rules
    s = repr(f)
    neg = s.startswith("-")
    if neg:
        s = s[1:]
    if "e" in s or "E" in s:
        mant, _, exp = s.lower().partition("e")
        e10 = int(exp)
    else:
        mant, e10 = s, 0
    if "." in mant:
        int_part, frac = mant.split(".")
    else:
        int_part, frac = mant, ""
    digits = (int_part + frac).lstrip("0")
    # k = number of significant digits, n = position of decimal point
    n = len(int_part.lstrip("0")) if int_part.lstrip("0") else (
        -(len(frac) - len(frac.lstrip("0"))))
    n += e10
    digits = digits.rstrip("0") or "0"
    k = len(digits)
    if k <= n <= 21:
        out = digits + "0" * (n - k)
    elif 0 < n <= 21:
        out = digits[:n] + "." + digits[n:]
    elif -6 < n <= 0:
        out = "0." + "0" * (-n) + digits
    else:
        # exponential form
        e = n - 1
        mantissa = digits[0] + ("." + digits[1:] if k > 1 else "")
        sign = "+" if e >= 0 else "-"
        out = f"{mantissa}e{sign}{abs(e)}"
    return ("-" if neg else "") + out


def _jcs(value) -> str:
    if value is None:
        return "null"
    if value is True:
        return "true"
    if value is False:
        return "false"
    if isinstance(value, str):
        return json.dumps(value, ensure_ascii=False)
    if isinstance(value, (int, float)):
        return es6_number_str(value)
    if isinstance(value, list):
        return "[" + ",".join(_jcs(v) for v in value) + "]"
    if isinstance(value, dict):
        items = []
        # RFC 8785: keys sorted by UTF-16 code units
        for k in sorted(value.keys(), key=_utf16_key):
            items.append(json.dumps(k, ensure_ascii=False) + ":"
                         + _jcs(value[k]))
        return "{" + ",".join(items) + "}"
    raise ValueError(f"Cannot JCS-serialize {type(value)}")


def _utf16_key(s: str):
    units = []
    for ch in s:
        cp = ord(ch)
        if cp < 0x10000:
            units.append(cp)
        else:
            cp -= 0x10000
            units.append(0xD800 + (cp >> 10))
            units.append(0xDC00 + (cp & 0x3FF))
    return units


def jcs_canonicalize(value) -> str:
    """RFC 8785 JSON Canonicalization Scheme."""
    return _jcs(value)
