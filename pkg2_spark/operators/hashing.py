"""Cross-engine deterministic hash arithmetic.

First 8 hex chars of an md5 -> exact 32-bit integer via digit folding —
spelled with instr (Spark) / strpos (DuckDB), both 1-based, so the two
expressions compute bit-identical integers. This is the position/bucket
primitive behind the KMV, Count-Min, and Bloom sketches and the DSIR
feature hash.
"""

from __future__ import annotations

_POWERS = [268435456, 16777216, 1048576, 65536, 4096, 256, 16, 1]


def v32_spark(h: str) -> str:
    # Each digit term is widened to BIGINT BEFORE the power multiply: under
    # ANSI mode an INT digit 15 * 16^7 overflows 32 bits.
    terms = " + ".join(
        f"CAST(instr('0123456789abcdef', substring({h}, {i + 1}, 1)) - 1 AS BIGINT) * {p}"
        for i, p in enumerate(_POWERS)
    )
    return f"CAST({terms} AS BIGINT)"


def v32_sql(h: str) -> str:
    return " + ".join(
        f"CAST(strpos('0123456789abcdef', substr({h}, {i + 1}, 1)) - 1 AS BIGINT) * {p}"
        for i, p in enumerate(_POWERS)
    )
