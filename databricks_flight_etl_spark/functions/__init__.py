"""Scalar derivations (SURVEY §2.7 F1–F15, §2.10 Q7).

The reference's only non-trivial scalar logic is the HHMM departure-time
decode, done twice as inline SQL strings (NB:261–291 and NB:365–377).
Here it is a reusable, parameterized transform with the quirk semantics
preserved exactly (see ``derive_departure_timestamp``).
"""

from .derive import (
    decode_hhmm_parts,
    derive_date,
    derive_departure_timestamp,
    hhmm_encode,
    union_all,
)

__all__ = [
    "decode_hhmm_parts",
    "derive_date",
    "derive_departure_timestamp",
    "hhmm_encode",
    "union_all",
]
