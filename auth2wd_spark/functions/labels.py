"""Label/description string transforms.

Pins: transform_label_last_first_name
(/root/reference/src/external_importer.rs:577-584, tests viaf.rs:333-339),
limit_string_length (:566-571), lowercase_first_letter (:655-661, tests
:839-847).
"""

from __future__ import annotations


def transform_label_last_first_name(s: str) -> str:
    """"Last, First" → "First Last", only on exactly one ", " split."""
    v = s.split(", ")
    if len(v) == 2:
        return f"{v[1]} {v[0]}"
    return s


def limit_string_length(s: str) -> str:
    """First 250 *bytes* of the trimmed string; otherwise the original.

    Quirk-exact port of the reference: Rust ``s.trim().get(..250)`` yields
    Some only when the trimmed string is ≥250 bytes AND byte 250 is a UTF-8
    char boundary; every other case (short string, mid-char boundary) falls
    back to the ORIGINAL, untrimmed string.
    """
    b = s.strip().encode("utf-8")
    if len(b) >= 250:
        try:
            return b[:250].decode("utf-8")
        except UnicodeDecodeError:
            return s
    return s


def lowercase_first_letter(s: str) -> str:
    if not s:
        return ""
    return s[0].lower() + s[1:]
