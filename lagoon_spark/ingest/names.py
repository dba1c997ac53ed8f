"""Column/view name sanitization and dedup.

Behavioral parity with the reference's `Lagoon.DB.SensibleNames`
(`src/backend/src/Lagoon/DB/SensibleNames.hs:50-92`) and
`avoidSpecialChars` (`src/backend/src/Lagoon/Util/PostgreSQL/Keywords.hs:42-73`):

* identifiers must start with a letter or underscore (else '_' is
  prepended); subsequent chars may be letters, digits, underscores —
  anything else becomes '_'; the empty name becomes "_";
* capitalization is preserved; duplicate detection is case-insensitive
  on the *sanitized* name; duplicates get suffixes _1, _2, … (the first
  occurrence is unchanged);
* names are truncated to max_id_len minus the suffix length (the suffix
  always survives truncation).
"""

from __future__ import annotations

# Postgres default max_identifier_length (NAMEDATALEN-1), which the
# reference queries at runtime (Keywords.hs:91-96)
MAX_ID_LEN = 63


def _is_letter(c: str) -> bool:
    return c.isalpha()


def _is_digit(c: str) -> bool:
    return "0" <= c <= "9"


def avoid_special_chars(name: str) -> str:
    if not name:
        return "_"
    out = []
    first = name[0]
    if _is_letter(first) or first == "_":
        out.append(first)
        rest = name[1:]
    else:
        out.append("_")
        rest = name
    for c in rest:
        out.append(c if (_is_letter(c) or c == "_" or _is_digit(c)) else "_")
    return "".join(out)


def sanitize(name: str, suffix: str = "", max_id_len: int = MAX_ID_LEN) -> str:
    return avoid_special_chars(name)[: max_id_len - len(suffix)] + suffix


def no_dup_names(names: list[str], max_id_len: int = MAX_ID_LEN) -> list[str]:
    """Dedup a list of preferred names (SensibleNames.noDupNames)."""
    used: set[str] = set()
    out: list[str] = []
    for name in names:
        v = 0
        while True:
            suffix = "" if v == 0 else f"_{v}"
            candidate = sanitize(name, suffix, max_id_len)
            ident = candidate.lower()
            if ident not in used:
                used.add(ident)
                out.append(candidate)
                break
            v += 1
    return out
