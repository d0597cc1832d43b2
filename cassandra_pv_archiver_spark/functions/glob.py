"""Channel-name glob matching (F2/C1).

The reference compiles ``*``/``?`` globs to case-insensitive regexes applied
over all channel names (`Api10Controller.compileGlobPattern:307-345`). Spark
mapping: prefer SQL ``LIKE`` (Catalyst rewrites prefix patterns like
``PV:1%`` to range predicates / StartsWith, which push down to parquet);
``rlike`` is the general fallback.
"""

from __future__ import annotations

import re


def glob_to_like(pattern: str) -> str:
    """Translate a ``*``/``?`` glob to a SQL LIKE pattern."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append("%")
        elif ch == "?":
            out.append("_")
        elif ch in ("%", "_", "\\"):
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out)


def glob_to_regex(pattern: str) -> str:
    """Translate a glob to a Java-compatible anchored regex for ``rlike``.

    ONLY ``*`` and ``?`` are special — exactly the reference's rule
    (`Api10Controller.compileGlobPattern:307-345`). ``fnmatch.translate``
    was wrong here: it also interprets ``[seq]`` character classes, so
    ``PV[1]`` matched ``PV1`` instead of the literal name ``PV[1]``."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "(?s)\\A" + "".join(out) + "\\Z"
